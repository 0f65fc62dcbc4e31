#!/bin/bash
# Round-4 tail 8: land the last missing 512^2 quality row (ar512).
#
# The previous attempts (tail-5: axon compile-helper HTTP 500; tail-7:
# same, retried) were finally stranded by a machine recycle that wiped
# /tmp/recon_q* — the ar512 stage needs BOTH the 256^2 seg checkpoint
# (prompt tokenizer) and the 512^2 img checkpoint (image tokenizer), so
# this runner rebuilds them first at reduced budgets:
#   seg    6k steps / 4096-scene pool (committed row used 12k/16384)
#   img512 4k steps batch 8           (committed row used 4k@b8 + 4k@b2)
# The rebuilds are TOKENIZERS for the ar512 row, not quality claims: the
# committed `seg` / `img_512` rows in results/recon_quality.json come
# from the longer runs and must NOT be overwritten, so after each rebuild
# stage the runner moves the fresh metrics to `*_rebuild` keys and
# restores the committed row (key surgery below).  The ar512 row itself
# records its own tokenizer provenance via those rebuild keys.
#
# DEADLINE GUARD: per-stage start cutoffs keep the chip idle for the
# driver's round-end bench.  Checkpoints under /tmp/recon_q* make a
# killed stage resumable on the same machine.
#
# Usage: bash benchmarks/run_round4_tail8.sh <hard-end-epoch> [logdir]
set -u
cd "$(dirname "$0")/.."
HARD_END=${1:?epoch seconds by which the chip must be idle}
LOG=${2:-/root/qlogs}
mkdir -p "$LOG"
RUN_ID="t8$(date +%Y%m%d_%H%M%S)"
RQ=results/recon_quality.json
echo "run id $RUN_ID  hard end $HARD_END  logs in $LOG"

cp "$RQ" /tmp/rq_committed_backup.json

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

# restore_key <stage-key>: move the rebuild metrics aside and put the
# committed row back so short tokenizer re-runs never degrade the table.
restore_key() {
  python - "$1" <<'EOF'
import json, sys
key = sys.argv[1]
cur = json.load(open("results/recon_quality.json"))
committed = json.load(open("/tmp/rq_committed_backup.json"))
if key in cur:
    cur[key + "_rebuild"] = cur[key]
if key in committed:
    cur[key] = committed[key]
json.dump(cur, open("results/recon_quality.json", "w"), indent=1)
print(f"restored committed {key} row; rebuild metrics kept as {key}_rebuild")
EOF
}

run_stage() {  # run_stage <tag> <est-seconds> <cmd...>
  local tag=$1 est=$2; shift 2
  local now; now=$(date +%s)
  local budget=$(( HARD_END - now ))
  if [ "$budget" -lt "$est" ]; then
    echo "SKIP $tag: ${budget}s left < ${est}s estimate"; return 1
  fi
  echo "start $tag $(date)  budget ${budget}s"
  timeout "$budget" "$@" > "$LOG/${tag}_run.log" 2>&1
  local rc=$?
  echo "done $tag exit=$rc $(date)"
  return $rc
}

# --- stage 1: seg tokenizer rebuild (256^2, prompt side) ---------------
if [ ! -d /tmp/recon_q/seg ]; then
  run_stage seg_rebuild 2400 \
    python -u benchmarks/recon_quality.py seg --pool 4096 --steps-seg 6000
  rc=$?
  restore_key seg
  commit_results seg_rebuild "$rc"
  [ "$rc" = 0 ] || { echo "seg rebuild failed; aborting"; exit 1; }
else
  echo "seg checkpoint present; skipping rebuild"
fi

# --- stage 2: 512^2 img tokenizer rebuild ------------------------------
if [ ! -d /tmp/recon_q_512/img ]; then
  run_stage img512_rebuild 3000 \
    python -u benchmarks/recon_quality.py img --res 512 --pool 4096 \
        --steps-img 4000 --disc-start 2000 --batch 8
  rc=$?
  restore_key img_512
  commit_results img512_rebuild "$rc"
  [ "$rc" = 0 ] || { echo "img512 rebuild failed; aborting"; exit 1; }
else
  echo "img512 checkpoint present; skipping rebuild"
fi

# --- stage 3: the ar512 row (the actual deliverable) -------------------
run_stage ar512 1500 \
  python -u benchmarks/recon_quality.py ar --res 512 --pool 4096 \
      --steps-ar 3000 --ar-eval-prompts 32
rc=$?
commit_results ar512 "$rc"
echo "round-4 tail-8 complete $(date)"
