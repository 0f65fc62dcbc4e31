#!/bin/bash
# Opportunistic follow-up to run_round4_tail9.sh: once tail-9 releases the
# chip, if enough budget remains before the hard end, measure the 512^2
# paper-geometry serving row for the GQA+lane_aliased variant that just
# fixed the 256^2 regression (22.98 -> 40.14 img/s, BASELINE round 4).
# The 1408-token cache is 5.5x the 256^2 one, so the 4x cache-stream cut
# should matter MORE here; this lands the measurement either way.
#
# Usage: bash benchmarks/after_tail9_bench512_gqa.sh <tail9-pid> <hard-end-epoch>
set -u
cd "$(dirname "$0")/.."
PID=${1:?tail9 pid}
HARD_END=${2:?epoch}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
NOW=$(date +%s)
BUDGET=$(( HARD_END - NOW ))
echo "tail9 done at $(date); ${BUDGET}s left"
# cold compile of the 512^2 GQA decode geometry can take ~5-8 min + 3
# timed iters at ~8-12 s each
if [ "$BUDGET" -lt 700 ]; then echo "skip bench512_gqa: ${BUDGET}s"; exit 0; fi
timeout "$BUDGET" python -u bench.py --resolution 512 --kv-heads 4 \
    --kv-layout lane_aliased --batch 64 > /root/qlogs/bench512_gqa.log 2>&1
rc=$?
LINE=$(grep -m1 '^{"metric"' /root/qlogs/bench512_gqa.log || true)
if [ -n "$LINE" ]; then
  python - "$LINE" <<'EOF'
import json, sys, time
rec = {"run_id": time.strftime("g5%Y%m%d_%H%M%S"), "tag": "bench512_gqa4_aliased",
       "exit": 0, "line": json.loads(sys.argv[1])}
with open("results/bench_lines.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print("recorded", rec["line"]["value"], rec["line"]["unit"])
EOF
  git add -f results/bench_lines.jsonl
  git commit -q -m "Quality pipeline: bench512_gqa4_aliased stage results (exit=$rc)

No-Verification-Needed: benchmark-result artifacts only, no product code"
  echo "committed bench512_gqa exit=$rc"
else
  echo "bench512_gqa produced no metric line (exit=$rc)"
fi
