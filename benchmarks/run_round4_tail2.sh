#!/bin/bash
# Round-4 tail 2: waits for the first tail runner (PID $1) to exit, then
# runs the remaining solo-sensitive work in priority order:
#   read_floor     decode cache-read floor profile (needs an idle chip)
#   train_levers   MFU lever A/Bs incl. the new fused-LN kernel
#   img512         retry of the OOM'd 512^2 VQ-IMG stage at the
#                  reference-faithful batch 2 (conf/img_config.yaml trains
#                  512^2 at batch 2/GPU; batch 8 OOMs the 16 GB chip on
#                  the GAN step's double-grad temps)
#   bench_ln       headline bench with the fused LN (sampler unaffected —
#                  decode LNs fall back to jnp — but guards regressions)
# Same per-stage commit discipline as run_round4_tail.sh.
#
# Usage: bash benchmarks/run_round4_tail2.sh <wait-pid> [logdir]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:?pid of the tail-1 runner}
LOG=${2:-/root/qlogs}
RUN_ID="u$(date +%Y%m%d_%H%M%S)"
echo "run id $RUN_ID  waiting on pid $WAIT_PID  logs in $LOG"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "tail-1 done $(date)"

commit_results() {  # commit_results <tag> <stage-exit-code>
  local staged=0 f
  for f in results/recon_quality.json results/bench_lines.jsonl \
           results/read_floor.txt results/train_levers.txt \
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

STAGE_TIMEOUT=1800
run read_floor bash -c 'set -o pipefail; python -u benchmarks/read_floor.py | tee results/read_floor.txt'
STAGE_TIMEOUT=3600
run train_levers bash -c 'set -o pipefail; python -u benchmarks/train_profile.py --levers | tee results/train_levers.txt'
STAGE_TIMEOUT=9000
run img512 python -u benchmarks/recon_quality.py img --res 512 --pool 4096 --steps-img 4000 --batch 2
STAGE_TIMEOUT=4000
run bench_final python -u bench.py --quick
echo "round-4 tail-2 complete $(date)"
