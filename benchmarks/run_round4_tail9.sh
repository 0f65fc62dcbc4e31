#!/bin/bash
# Round-4 tail 9: land the last missing 512^2 quality row (ar512).
#
# tail-8 postmortem: its img512 rebuild ran `--batch 8 --disc-start 2000`
# and OOM'd at compile — make_img_train_step is ONE fused G+D jit (the
# disc grads + adaptive-d_weight double-grad are in-graph behind
# adopt_weight), so disc_start cannot keep the memory down; at 512^2 the
# step only fits at small batch (tail-6 measured the same and retried at
# batch 2).  This runner rebuilds the 512^2 image tokenizer at batch 4
# and falls back to batch 2 on failure, then runs the ar512 stage.
#
# The rebuilds are TOKENIZERS for the ar512 row, not quality claims: the
# committed `seg` / `img_512` rows in results/recon_quality.json come
# from the longer runs and must NOT be overwritten — after each rebuild
# stage the metrics move to `*_rebuild` keys and the committed row is
# restored (key surgery below).
#
# DEADLINE GUARD: per-stage start cutoffs keep the chip idle for the
# driver's round-end bench.  Checkpoints under /tmp/recon_q* make a
# killed stage resumable on the same machine.
#
# Usage: bash benchmarks/run_round4_tail9.sh <hard-end-epoch> [logdir]
set -u
cd "$(dirname "$0")/.."
HARD_END=${1:?epoch seconds by which the chip must be idle}
LOG=${2:-/root/qlogs}
mkdir -p "$LOG"
RUN_ID="t9$(date +%Y%m%d_%H%M%S)"
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

# --- stage 2: 512^2 img tokenizer rebuild (batch 4, fallback 2) --------
if [ ! -d /tmp/recon_q_512/img ]; then
  run_stage img512_rebuild_b4 3000 \
    python -u benchmarks/recon_quality.py img --res 512 --pool 4096 \
        --steps-img 4000 --disc-start 2000 --batch 4
  rc=$?
  if [ "$rc" != 0 ] && [ ! -d /tmp/recon_q_512/img ]; then
    echo "batch-4 rebuild failed (rc=$rc); retrying at batch 2"
    run_stage img512_rebuild_b2 3600 \
      python -u benchmarks/recon_quality.py img --res 512 --pool 4096 \
          --steps-img 4000 --disc-start 2000 --batch 2
    rc=$?
  fi
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
echo "round-4 tail-9 complete $(date)"
