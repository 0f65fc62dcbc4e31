#!/bin/bash
# Quality pipeline with per-stage git commits of results/.
#
# The build machine can be recycled between driver segments (/tmp and all
# untracked files are wiped), so every completed stage's metrics + grids
# must land in git immediately — a 40-minute stage that finishes but isn't
# committed is a 40-minute stage that never ran.  Stage order banks the
# cheap high-value rows first (512² serving benches ≈ minutes), then the
# competence-quality stages, then the remaining A/Bs.
#
# Round-4 fixes (ADVICE r3): `git add -f a b c` aborts the WHOLE add when
# any pathspec matches nothing (rc=128), which silently committed nothing
# for every round-3 stage.  Paths are now staged one-by-one behind an
# existence guard, git stderr is no longer suppressed, stage exit codes are
# recorded in the commit message and in bench_lines.jsonl, and each
# invocation carries a run id so retries are distinguishable.
#
# Usage:  bash benchmarks/run_quality_committing.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp}
RUN_ID="q$(date +%Y%m%d_%H%M%S)"
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
  timeout "${STAGE_TIMEOUT:-7000}" "$@" > "$LOG/${tag}_run.log" 2>&1
  rc=$?
  echo "done $tag exit=$rc $(date)"
  # bench stages print their result as a one-line JSON to stdout only —
  # persist it in a tracked file so a machine recycle can't lose it
  j=$(grep -h '^{"metric"' "$LOG/${tag}_run.log" | tail -1)
  if [ -n "$j" ]; then
    mkdir -p results
    echo "{\"run_id\": \"$RUN_ID\", \"tag\": \"$tag\", \"exit\": $rc, \"line\": $j}" \
      >> results/bench_lines.jsonl
  fi
  commit_results "$tag" "$rc"
}

( while true; do
    echo "$(date +%H:%M:%S) $(grep -E 'MemAvailable|MemFree' /proc/meminfo | tr -s ' ' | tr '\n' ' ')"
    sleep 60
  done > "$LOG/mem.log" 2>&1 ) &
MEMLOG_PID=$!
trap 'kill $MEMLOG_PID 2>/dev/null' EXIT

# Cheap, high-value serving rows first (VERDICT r3 #3): 512² with the
# round-3 decode stack, plus the scale-dtype A/B.  Minutes each, banked
# before the hour-scale training stages.
STAGE_TIMEOUT=4000
run bench512     python -u bench.py --resolution 512
run bench512_s16 python -u bench.py --resolution 512 --kv-scale-dtype bfloat16
STAGE_TIMEOUT=7000

# 256² competence schedule (the round-3 must-have).  Wipe stale
# checkpoints: stages restore "latest step" blindly.
rm -rf /tmp/recon_q /tmp/recon_q_512
run seg      python -u benchmarks/recon_quality.py seg --pool 16384 --steps-seg 12000 --seg-init-steps 400
run img      python -u benchmarks/recon_quality.py img --pool 16384 --steps-img 12000
STAGE_TIMEOUT=9000
run ar       python -u benchmarks/recon_quality.py ar  --pool 16384 --steps-ar 20000 --ar-eval-prompts 128
STAGE_TIMEOUT=7000

# 512² rows (seg reuses /tmp/recon_q's 256² stage by design)
STAGE_TIMEOUT=12000
run img512   python -u benchmarks/recon_quality.py img --res 512 --pool 4096 --steps-img 4000
run ar512    python -u benchmarks/recon_quality.py ar  --res 512 --pool 4096 --steps-ar 6000 --ar-eval-prompts 32
STAGE_TIMEOUT=7000

# GQA matched-schedule quality row (same eval-prompt count as the MHA ar
# row — FID is sample-size biased)
STAGE_TIMEOUT=9000
run ar_gqa   python -u benchmarks/recon_quality.py ar --pool 16384 --steps-ar 20000 --ar-eval-prompts 128 --ar-kv-heads 2
STAGE_TIMEOUT=7000

# remaining serving bench A/Bs (each also emits one JSON line to its log)
run bench_s16    python -u bench.py --quick --kv-scale-dtype bfloat16
run bench_gqa4   python -u bench.py --quick --kv-heads 4
run bench512_gqa python -u bench.py --resolution 512 --kv-heads 4
echo "quality pipeline complete $(date)"
