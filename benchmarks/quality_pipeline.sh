#!/bin/bash
# Unattended measured-quality pipeline (the BASELINE.md competence schedule).
#
# Runs each recon_quality.py stage as its own process so the axon client's
# leaked host->device staging buffers (see benchmarks/recon_quality.py
# docstring) are reclaimed between stages, then the 512^2 serving bench.
# Every stage appends its metrics to results/recon_quality.json on
# completion, so a partial run still records finished stages.
#
# Usage:  bash benchmarks/quality_pipeline.sh [logdir]   (default /tmp)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp}

run() {  # run <tag> <cmd...>   (per-stage cap via STAGE_TIMEOUT)
  tag=$1; shift
  echo "start $tag $(date)"
  timeout "${STAGE_TIMEOUT:-7000}" "$@" > "$LOG/${tag}_run.log" 2>&1
  echo "done $tag exit=$? $(date)"
}

# 1-line/min host-RAM telemetry (the axon client leaks staging buffers;
# if a stage is OOM-killed this log is the post-mortem)
( while true; do
    echo "$(date +%H:%M:%S) $(grep -E 'MemAvailable|MemFree' /proc/meminfo | tr -s ' ' | tr '\n' ' ')"
    sleep 60
  done > "$LOG/mem.log" 2>&1 ) &
MEMLOG_PID=$!
trap 'kill $MEMLOG_PID 2>/dev/null' EXIT

# quick decode A/B first (cache-warm ~5 min each): bf16 KV scales vs the
# fp32-scale shipped default at the headline geometry
run bench_s16  python -u bench.py --quick --kv-scale-dtype bfloat16
run bench_s32  python -u bench.py --quick

# 256^2 competence schedule (~3 h total on one v5e chip).  Wipe stale
# checkpoints first: stages restore "latest step" blindly, so a crashed
# stage would otherwise hand the next one an old short-schedule model.
rm -rf /tmp/recon_q /tmp/recon_q_512
run seg      python -u benchmarks/recon_quality.py seg --pool 16384 --steps-seg 12000
run img      python -u benchmarks/recon_quality.py img --pool 16384 --steps-img 12000
run ar       python -u benchmarks/recon_quality.py ar  --pool 16384 --steps-ar 20000 --ar-eval-prompts 128
run bench512 python -u bench.py --resolution 512

# 512^2 rows (shorter demonstration schedule; seg is 256^2-only by design —
# the 512^2 stages reuse /tmp/recon_q/seg, see recon_quality.py:80-91).
# NB: `VAR=x run ...` would scope the assignment to that one call only
# (and not at all in default bash mode for functions) — set it plainly.
STAGE_TIMEOUT=12000
run img512   python -u benchmarks/recon_quality.py img --res 512 --pool 4096 --steps-img 4000
run ar512    python -u benchmarks/recon_quality.py ar  --res 512 --pool 4096 --steps-ar 6000 --ar-eval-prompts 32
STAGE_TIMEOUT=7000

# 512^2 scale-dtype A/B (the 1408-token geometry reads 2.2x the cache)
run bench512_s16 python -u bench.py --resolution 512 --kv-scale-dtype bfloat16

# grouped-query attention rows: serving throughput at group 4 (16->4 kv
# heads; the decode cache stream shrinks 4x) + a matched-schedule quality
# row (8-head AR stage at kv 2 = the same group factor), recorded as
# ar_kv2 beside the MHA ar row for FID comparison
run bench_gqa4   python -u bench.py --quick --kv-heads 4
run bench512_gqa python -u bench.py --resolution 512 --kv-heads 4
# eval-prompt count MUST match the MHA ar row (FID is sample-size biased;
# a smaller sample pool would fake a GQA quality regression)
run ar_gqa       python -u benchmarks/recon_quality.py ar --pool 16384 --steps-ar 20000 --ar-eval-prompts 128 --ar-kv-heads 2
echo "quality pipeline complete $(date)"
