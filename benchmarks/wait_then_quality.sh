#!/bin/bash
# Wait for the axon TPU tunnel to recover, then run the quality pipeline.
# The tunnel can be down for hours and probes HANG (see
# .claude/skills/verify/SKILL.md) — so probe with a hard timeout in a loop
# and self-start the long run on recovery.
#
# Usage: bash benchmarks/wait_then_quality.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp}

while true; do
  # sentinel instead of grepping the device repr (unknown for axon):
  # AXON_OK prints only if backend init succeeded and returned devices
  timeout -k 5 120 python -c \
    "import jax; ds = jax.devices(); assert ds; print('AXON_OK', ds)" \
    > "$LOG/axon_probe.log" 2>&1
  if grep -q "AXON_OK" "$LOG/axon_probe.log"; then
    echo "axon up $(date)"
    break
  fi
  echo "axon down $(date)"
  sleep 180
done

bash benchmarks/quality_pipeline.sh "$LOG"
