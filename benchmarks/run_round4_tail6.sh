#!/bin/bash
# Round-4 tail 6: waits for the tail-5 runner (PID $1), then retries the
# 512^2 VQ-IMG extension at the reference-faithful batch 2
# (conf/img_config.yaml trains the 512 model at batch 2/GPU) — the batch-8
# extension OOM'd on the GAN step's HLO temps (256 MB gn_swish activations
# x the double-grad; /root/qlogs/img512_12k_run.log).  Resumes
# /tmp/recon_q_512/img from step 4000; +4000 steps keeps the stage inside
# the round's chip budget.  Deadline-guarded like tail-5.
#
# Usage: bash benchmarks/run_round4_tail6.sh <wait-pid> [logdir] \
#            [start-cutoff-epoch] [hard-end-epoch]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the tail-5 runner}
LOG=${2:-/root/qlogs}
START_CUTOFF=${3:?epoch seconds after which the stage must not start}
HARD_END=${4:?epoch seconds by which the chip must be idle}
RUN_ID="z$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  waiting on pid $WAIT_PID  logs in $LOG"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "tail-5 done $(date)"

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
  echo "past start cutoff ($(date)) — skipping img512_b2 to keep the chip idle"
  exit 0
fi
BUDGET=$(( HARD_END - NOW ))
echo "start img512_b2 $(date)  budget ${BUDGET}s"
timeout "$BUDGET" python -u benchmarks/recon_quality.py img --res 512 \
    --pool 4096 --steps-img 8000 --batch 2 \
    > "$LOG/img512_b2_run.log" 2>&1
rc=$?
echo "done img512_b2 exit=$rc $(date)"
commit_results img512_b2 "$rc"
echo "round-4 tail-6 complete $(date)"
