#!/bin/bash
# Round-4 tail: remaining quality stages after the main pipeline's seg+img
# (the ar re-run was dropped — the 128-prompt MHA ar row is already
# committed; ar_gqa below compares against it at the matched schedule).
# Same per-stage commit discipline as run_quality_committing.sh.
#
# Usage: bash benchmarks/run_round4_tail.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/qlogs}
RUN_ID="t$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  logs in $LOG"

commit_results() {  # commit_results <tag> <stage-exit-code>
  local staged=0 f
  for f in results/recon_quality.json results/bench_lines.jsonl \
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
  timeout "${STAGE_TIMEOUT:-9000}" "$@" > "$LOG/${tag}_run.log" 2>&1
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

# GQA matched-schedule quality row first (compares to the committed
# 128-prompt MHA ar row: same pool, steps, prompt count)
run ar_gqa   python -u benchmarks/recon_quality.py ar --pool 16384 --steps-ar 20000 --ar-eval-prompts 128 --ar-kv-heads 2

# 512² training rows (seg reuses /tmp/recon_q's 256² stage by design)
STAGE_TIMEOUT=12000
run img512   python -u benchmarks/recon_quality.py img --res 512 --pool 4096 --steps-img 4000
run ar512    python -u benchmarks/recon_quality.py ar  --res 512 --pool 4096 --steps-ar 6000 --ar-eval-prompts 32
STAGE_TIMEOUT=9000

# remaining serving bench A/Bs
STAGE_TIMEOUT=4000
run bench_s16    python -u bench.py --quick --kv-scale-dtype bfloat16
run bench_gqa4   python -u bench.py --quick --kv-heads 4
run bench512_gqa python -u bench.py --resolution 512 --kv-heads 4
echo "round-4 tail complete $(date)"
