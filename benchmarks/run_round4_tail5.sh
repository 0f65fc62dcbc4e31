#!/bin/bash
# Round-4 tail 5: waits for the tail-4 runner (PID $1), then runs the
# 512^2 AR stage — the last missing 512^2 quality row (tail-1's attempt
# failed on the then-missing 512^2 img checkpoint; it exists now, and
# tail-4 extends it to 12k steps first).  Trains the 8L/512h AR model on
# frozen VQ tokens at the full 1408-token paper geometry and measures
# held-out sample FID on 32 prompts.  Checkpoints under /tmp/recon_q512
# make the stage resumable if the round ends mid-run.
# Per-stage commit discipline as run_round4_tail2.sh.
#
# Usage: bash benchmarks/run_round4_tail5.sh <wait-pid> [logdir]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the tail-4 runner}
LOG=${2:-/root/qlogs}
RUN_ID="y$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  waiting on pid $WAIT_PID  logs in $LOG"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "tail-4 done $(date)"

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

STAGE_TIMEOUT=7200
run ar512 python -u benchmarks/recon_quality.py ar --res 512 --pool 4096 \
    --steps-ar 6000 --ar-eval-prompts 32
echo "round-4 tail-5 complete $(date)"
