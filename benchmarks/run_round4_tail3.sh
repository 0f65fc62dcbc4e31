#!/bin/bash
# Round-4 tail 3: waits for the img512 quality stage (PID $1) to exit, then
# runs the decode read-path experiments the read_floor profile motivated
# (BASELINE round 4):
#   read_floor2    re-run with the new variants (zero-pad Q rows as the
#                  sampler builds them; int8 MXU dots with quantized q)
#   bench_q4/q8    end-to-end A/B of --decode-q-rows (the only read-path
#                  candidate that does NOT restructure the scan: same
#                  carries, same DUS writes, only a wider q contraction)
#   trace_gqa4     decode_trace --kv-heads 4: why do 4x-smaller cache
#                  reads bench SLOWER end-to-end (22.98 vs 32.35 img/s)?
#                  suspect: sub-(8,128)-tile intermediates [B,4,4,64] /
#                  [B,4,1,640] pad 4-8x when materialized between fusions
# Per-stage commit discipline as run_round4_tail2.sh.
#
# Usage: bash benchmarks/run_round4_tail3.sh <wait-pid> [logdir]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the img512 runner}
LOG=${2:-/root/qlogs}
RUN_ID="w$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  waiting on pid $WAIT_PID  logs in $LOG"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "img512 done $(date)"

commit_results() {  # commit_results <tag> <stage-exit-code>
  local staged=0 f
  for f in results/recon_quality.json results/bench_lines.jsonl \
           results/read_floor.txt results/trace_gqa4.txt \
           results/*.png results/*.jpg; do
    [ -e "$f" ] && git add -f "$f" && staged=1
  done
  [ "$staged" = 1 ] || { echo "commit_results $1: nothing to stage"; return; }
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Quality pipeline ($RUN_ID): $1 stage results (exit=$2)

No-Verification-Needed: benchmark-result artifacts only, no product code" \
      && echo "committed $1 exit=$2 $(date)"
  fi
}

run() {  # run <tag> <cmd...>
  tag=$1; shift
  echo "start $tag $(date)"
  timeout "${STAGE_TIMEOUT:-4000}" "$@" > "$LOG/${tag}_run.log" 2>&1
  rc=$?
  echo "done $tag exit=$rc $(date)"
  j=$(grep -h '^{"metric"' "$LOG/${tag}_run.log" | tail -1)
  if [ -n "$j" ]; then
    mkdir -p results
    echo "{\"run_id\": \"$RUN_ID\", \"tag\": \"$tag\", \"exit\": $rc, \"line\": $j}" \
      >> results/bench_lines.jsonl
  fi
  commit_results "$tag" "$rc"
}

STAGE_TIMEOUT=2400
run read_floor2 bash -c 'set -o pipefail; python -u benchmarks/read_floor.py | tee results/read_floor.txt'
STAGE_TIMEOUT=3000
run bench_q4 python -u bench.py --quick --decode-q-rows 4
run bench_q8 python -u bench.py --quick --decode-q-rows 8
STAGE_TIMEOUT=2400
run trace_gqa4 bash -c 'set -o pipefail; python -u benchmarks/decode_trace.py --kv-heads 4 | tee results/trace_gqa4.txt'
echo "round-4 tail-3 complete $(date)"
