#!/bin/bash
# Round-4 tail 4: waits for the tail-3 runner (PID $1), then extends the
# 512^2 VQ-IMG quality stage from its committed step-4000 checkpoint
# (PSNR 19.19 dB — below the 22 dB bar the 256^2 stage met at 12k steps)
# to 12k steps at the default batch 8 (the batch-8 "OOM" note in tail-2
# was stale: the tail-1 batch-8 run completed 4000 steps in 2695 s).
# Resumes via /tmp/recon_q512/img (orbax), so only ~8k steps (~1.5 h)
# run.  Then a final headline bench on the idle chip.
# Per-stage commit discipline as run_round4_tail2.sh.
#
# Usage: bash benchmarks/run_round4_tail4.sh <wait-pid> [logdir]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the tail-3 runner}
LOG=${2:-/root/qlogs}
RUN_ID="x$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  waiting on pid $WAIT_PID  logs in $LOG"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "tail-3 done $(date)"

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

STAGE_TIMEOUT=8000
run img512_12k python -u benchmarks/recon_quality.py img --res 512 --pool 4096 --steps-img 12000
STAGE_TIMEOUT=4000
run bench_tail4 python -u bench.py --quick
echo "round-4 tail-4 complete $(date)"
