#!/bin/bash
# THE quality/bench runner: one parameterized entry point for every
# measured stage (VERDICT r4 #7 — replaces run_quality_committing.sh and
# the eleven round-4 one-shot tail runners; their history is in git log).
#
# Every stage that produces measurements commits them immediately: the
# build machine can be recycled between driver segments (/tmp and all
# untracked files are wiped), so a finished-but-uncommitted stage never
# ran.  Bench stages additionally persist their one-line JSON into
# results/bench_lines.jsonl.
#
# Usage:
#   bash benchmarks/run_quality_stage.sh <stage> [hard-end-epoch] [extra...]
#   bash benchmarks/run_quality_stage.sh pipeline [hard-end-epoch]
#
# <stage> one of:
#   bench bench512            serving benches (bench.py; GQA variant rides
#                             in the headline JSON's 'variants' field)
#   seg img ar ar_gqa         256^2 competence-schedule quality rows
#   img512 ar512              512^2 rows (seg reuses the 256^2 stage)
#   seg_rebuild img512_rebuild  tokenizer-only re-runs after a /tmp wipe:
#                             metrics land as <key>_rebuild, the committed
#                             row is restored (they are TOKENIZERS for the
#                             ar rows, not quality claims)
#   seg_usage                 codebook-usage-vs-eval-size curve
#   floor1408 trace512        512^2 decode floor proof + serving trace
#   lnprod remat24            train-MFU levers: producer-LN microbench,
#                             mlp-remat batch>=24 retry
#   scan24                    cfg.scan_layers A/B (compile + step time) +
#                             the batch>=24 retry on the scanned HLO
#   pipeline                  the full ordered sequence (fresh machine)
#
# [hard-end-epoch]: optional deadline guard (epoch seconds by which the
# chip must be idle, e.g. for the driver's round-end bench); a stage that
# cannot fit its estimate is skipped, a running stage is cut by timeout.
# [extra...]: appended verbatim to the stage's command line.
set -u
cd "$(dirname "$0")/.."
STAGE=${1:?stage name (see header)}
HARD_END=${2:-0}
shift $(( $# > 1 ? 2 : 1 ))
LOG=${LOGDIR:-/root/qlogs}
mkdir -p "$LOG" results
RUN_ID="q$(date +%Y%m%d_%H%M%S)"
RQ=results/recon_quality.json
echo "run id $RUN_ID  stage $STAGE  hard end $HARD_END  logs in $LOG"

commit_results() {  # commit_results <tag> <stage-exit-code>
  local staged=0 f
  for f in results/recon_quality.json results/bench_lines.jsonl \
           results/*.png results/*.jpg results/*.txt; do
    [ -e "$f" ] && git add -f "$f" && staged=1
  done
  [ "$staged" = 1 ] || { echo "commit_results $1: nothing to stage"; return; }
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Quality pipeline ($RUN_ID): $1 stage results (exit=$2)

No-Verification-Needed: benchmark-result artifacts only, no product code" \
      && echo "committed $1 exit=$2 $(date)"
  fi
}

# restore_key <stage-key>: after a tokenizer rebuild, move its metrics to
# <key>_rebuild and put the previously committed row back, so short
# re-runs never degrade the quality table.
restore_key() {
  python - "$1" <<'EOF'
import json, subprocess, sys
key = sys.argv[1]
cur = json.load(open("results/recon_quality.json"))
blob = subprocess.run(["git", "show", "HEAD:results/recon_quality.json"],
                      capture_output=True, text=True)
committed = json.loads(blob.stdout) if blob.returncode == 0 else {}
if key in cur:
    cur[key + "_rebuild"] = cur[key]
if key in committed:
    cur[key] = committed[key]
json.dump(cur, open("results/recon_quality.json", "w"), indent=1)
print(f"restored committed {key} row; rebuild metrics kept as {key}_rebuild")
EOF
}

run_stage() {  # run_stage <tag> <est-seconds> <max-seconds> <cmd...>
  local tag=$1 est=$2 cap=$3; shift 3
  local budget=$cap
  if [ "$HARD_END" -gt 0 ]; then
    local now; now=$(date +%s)
    budget=$(( HARD_END - now ))
    [ "$budget" -gt "$cap" ] && budget=$cap
    if [ "$budget" -lt "$est" ]; then
      echo "SKIP $tag: ${budget}s left < ${est}s estimate"; return 75
    fi
  fi
  echo "start $tag $(date)  budget ${budget}s"
  timeout "$budget" "$@" "${EXTRA[@]}" > "$LOG/${tag}_run.log" 2>&1
  local rc=$?
  echo "done $tag exit=$rc $(date)"
  local j; j=$(grep -h '^{"metric"' "$LOG/${tag}_run.log" | tail -1)
  if [ -n "$j" ]; then
    echo "{\"run_id\": \"$RUN_ID\", \"tag\": \"$tag\", \"exit\": $rc, \"line\": $j}" \
      >> results/bench_lines.jsonl
  fi
  return $rc
}

EXTRA=("$@")

do_stage() {  # do_stage <name>  (EXTRA applies to single-stage invocations)
  local rc=0
  case $1 in
    bench)
      run_stage bench 600 4000 python -u bench.py --quick; rc=$? ;;
    bench512)
      run_stage bench512 700 4500 python -u bench.py --resolution 512; rc=$? ;;
    seg)
      run_stage seg 3000 7000 python -u benchmarks/recon_quality.py seg \
        --pool 16384 --steps-seg 12000 --seg-init-steps 400; rc=$? ;;
    img)
      run_stage img 3000 7000 python -u benchmarks/recon_quality.py img \
        --pool 16384 --steps-img 12000; rc=$? ;;
    ar)
      run_stage ar 4000 9000 python -u benchmarks/recon_quality.py ar \
        --pool 16384 --steps-ar 20000 --ar-eval-prompts 128; rc=$? ;;
    ar_gqa)
      run_stage ar_gqa 4000 9000 python -u benchmarks/recon_quality.py ar \
        --pool 16384 --steps-ar 20000 --ar-eval-prompts 128 \
        --ar-kv-heads 2; rc=$? ;;
    img512)
      run_stage img512 3000 12000 python -u benchmarks/recon_quality.py img \
        --res 512 --pool 4096 --steps-img 4000 --disc-start 2000 \
        --batch 4; rc=$? ;;
    ar512)
      # 1296-token geometry OOMs the train step at batch 32 (tail-9 log)
      run_stage ar512 1500 7000 python -u benchmarks/recon_quality.py ar \
        --res 512 --pool 4096 --steps-ar 3000 --ar-eval-prompts 32 \
        --ar-batch 8; rc=$? ;;
    seg_rebuild)
      run_stage seg_rebuild 1200 3000 python -u benchmarks/recon_quality.py \
        seg --pool 4096 --steps-seg 3000; rc=$?
      restore_key seg ;;
    img512_rebuild)
      run_stage img512_rebuild 3000 10500 python -u \
        benchmarks/recon_quality.py img --res 512 --pool 4096 \
        --steps-img 4000 --disc-start 2000 --batch 4; rc=$?
      restore_key img_512 ;;
    seg_usage)
      run_stage seg_usage 600 3000 python -u benchmarks/seg_usage.py; rc=$? ;;
    floor1408)
      # 512^2 decode floor proof (VERDICT r4 #3: trace, not analogy)
      run_stage floor1408 600 3000 python -u benchmarks/read_floor.py \
        --t 1408 --b 64; rc=$?
      cp "$LOG/floor1408_run.log" results/read_floor_1408.txt ;;
    trace512)
      run_stage trace512 600 3000 python -u benchmarks/decode_trace.py \
        --resolution 512; rc=$?
      cp "$LOG/trace512_run.log" results/decode_trace_512.txt ;;
    lnprod)
      # producer-epilogue LN stats fusion (VERDICT r4 #4, last MFU lever)
      run_stage lnprod 400 2000 python -u benchmarks/ln_producer.py; rc=$?
      cp "$LOG/lnprod_run.log" results/ln_producer.txt ;;
    remat24)
      run_stage remat24 900 4000 python -u benchmarks/train_profile.py \
        --remat-only; rc=$?
      cp "$LOG/remat24_run.log" results/remat24_retry.txt ;;
    scan24)
      # cfg.scan_layers A/B + the batch>=24 retry on the 24x-smaller HLO
      run_stage scan24 1200 5000 python -u benchmarks/train_profile.py \
        --scan-only; rc=$?
      cp "$LOG/scan24_run.log" results/scan_layers_ab.txt ;;
    *)
      echo "unknown stage: $1"; exit 2 ;;
  esac
  commit_results "$1" "$rc"
  return $rc
}

if [ "$STAGE" = pipeline ]; then
  EXTRA=()
  # cheap serving rows first, then the hour-scale training stages; the
  # 512^2 ar row needs the img512 tokenizer checkpoint from this machine
  rm -rf /tmp/recon_q /tmp/recon_q_512
  for s in bench bench512 seg img ar img512 ar512 ar_gqa seg_usage; do
    do_stage "$s" || echo "stage $s failed (continuing)"
  done
  echo "pipeline complete $(date)"
else
  do_stage "$STAGE"
fi
