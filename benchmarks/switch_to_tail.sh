#!/bin/bash
# Hand the TPU from the running quality pipeline to the round-4 tail.
#
# The pipeline invocation of 2026-08-18 09:23 (run q20260818_092345) banked
# bench512/bench512_s16/seg and is re-running img + ar — rows already
# committed by the earlier invocation (commits 0f6b3e4, b08caf8).  Re-runs
# duplicate ~2 h of scarce single-chip time while the genuinely missing
# rows (ar_gqa, img512, ar512, read-floor, MFU levers) wait.  This script:
#   1. waits for the in-flight img stage to finish AND its results to be
#      committed (sentinel: the runner echoes "start ar" only after
#      commit_results returned),
#   2. stops the pipeline process tree by explicit PIDs (never by pattern),
#   3. runs the cheap high-value diagnostics first (read_floor ~5 min,
#      train_profile --levers ~20 min, seg_usage ~10 min), committing each
#      log under results/,
#   4. execs benchmarks/run_round4_tail.sh for the remaining stages.
#
# Usage: nohup bash benchmarks/switch_to_tail.sh <pipeline-root-pid> [logdir] &
set -u
cd "$(dirname "$0")/.."
ROOT_PID=${1:?pipeline root pid}
LOG=${2:-/root/qlogs}

descendants() {  # print all descendant pids of $1, depth-first
  local p c
  for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do
    descendants "$c"
    echo "$c"
  done
}

echo "waiting for img stage to finish+commit (root pid $ROOT_PID)"
while kill -0 "$ROOT_PID" 2>/dev/null; do
  if grep -q '^start ar ' "$LOG/pipeline.log" 2>/dev/null; then
    echo "img committed; stopping pipeline tree $(date)"
    # children first (timeout/python of the freshly started ar stage and
    # the mem-log subshell), then the runner itself
    for p in $(descendants "$ROOT_PID") "$ROOT_PID"; do
      kill "$p" 2>/dev/null
    done
    sleep 5
    for p in $(descendants "$ROOT_PID") "$ROOT_PID"; do
      kill -9 "$p" 2>/dev/null
    done
    break
  fi
  sleep 20
done
echo "pipeline stopped or exited $(date)"
sleep 10   # let the axon client tear down

commit_log() {  # commit_log <tag> <file>
  [ -e "$2" ] || { echo "commit_log: $2 missing"; return; }
  git add -f "$2" && git commit -q -m "Diagnostics: $1 (round-4 TPU run)

No-Verification-Needed: benchmark-result artifacts only, no product code" \
    && echo "committed $1 $(date)"
}

mkdir -p results
echo "diag: read_floor $(date)"
timeout 2400 python -u benchmarks/read_floor.py > results/read_floor.txt 2>&1
commit_log read_floor results/read_floor.txt

echo "diag: train_profile --levers $(date)"
timeout 3600 python -u benchmarks/train_profile.py --levers \
  > results/train_levers.txt 2>&1
commit_log train_levers results/train_levers.txt

echo "diag: seg_usage $(date)"
timeout 1800 python -u benchmarks/seg_usage.py > results/seg_usage.txt 2>&1
commit_log seg_usage results/seg_usage.txt

echo "switching to round-4 tail $(date)"
exec bash benchmarks/run_round4_tail.sh "$LOG"
