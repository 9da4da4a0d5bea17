#!/bin/bash
# Third CPU queue stage: bounded site-specific BLER eval of the round-1
# fine-tuned weights (nrx_site_specific_100k) on the ray-geometry eval
# trajectories — a measured site-specific curve without the TPU
# (VERDICT item 8). Waits for the post-anchors stage.
set -u
cd "$(dirname "$0")/.."
LOG=logs/cpu_site_eval.log
PY="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 python"

while ! grep -q "CPU POST-ANCHORS DONE" logs/cpu_post_anchors.log 2>/dev/null; do
  sleep 300
done

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" $PY "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
}

run 10800 scripts/eval_trained_quick.py --cpu \
    --config nrx_site_specific_100k --target-errors 100 --max-iter 80 \
    --snr 8 10 12
echo "CPU SITE EVAL DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
