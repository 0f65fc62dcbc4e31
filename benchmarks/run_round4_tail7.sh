#!/bin/bash
# Round-4 tail 7: one-shot retry of the ar512 stage — the tail-5 attempt
# died in the axon remote-compile helper (HTTP 500, subprocess exit 1;
# /root/qlogs/ar512_run.log), the contention-sensitive failure class; the
# retry runs on an otherwise idle host.  Originally tail 5: waits for the tail-4 runner (PID $1), then runs the
# 512^2 AR stage — the last missing 512^2 quality row (tail-1's attempt
# failed on the then-missing 512^2 img checkpoint; it exists now, and
# tail-4 extends it to 12k steps first).  Trains the 8L/512h AR model on
# frozen VQ tokens at the full 1408-token paper geometry and measures
# held-out sample FID on 32 prompts.
#
# DEADLINE GUARD: the driver re-benches on this chip at round end; a
# training job still running then would poison BENCH_r04.  The stage only
# starts if enough wall clock remains (START_CUTOFF) and is timed out to
# finish by HARD_END either way.  Checkpoints under /tmp/recon_q512 make
# a killed run resumable on the same machine.
# Per-stage commit discipline as run_round4_tail2.sh.
#
# Usage: bash benchmarks/run_round4_tail7.sh <wait-pid> [logdir] \
#            [start-cutoff-epoch] [hard-end-epoch]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the tail-4 runner}
LOG=${2:-/root/qlogs}
START_CUTOFF=${3:?epoch seconds after which ar512 must not start}
HARD_END=${4:?epoch seconds by which the chip must be idle}
RUN_ID="v2$(date +%Y%m%d_%H%M%S)"
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

NOW=$(date +%s)
if [ "$NOW" -ge "$START_CUTOFF" ]; then
  echo "past start cutoff ($(date)) — skipping ar512 to keep the chip idle"
  exit 0
fi
BUDGET=$(( HARD_END - NOW ))
echo "start ar512 $(date)  budget ${BUDGET}s"
timeout "$BUDGET" python -u benchmarks/recon_quality.py ar --res 512 \
    --pool 4096 --steps-ar 3000 --ar-eval-prompts 32 \
    > "$LOG/ar512_run.log" 2>&1
rc=$?
echo "done ar512 exit=$rc $(date)"
commit_results ar512 "$rc"
echo "round-4 tail-5 complete $(date)"
