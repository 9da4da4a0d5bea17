#!/bin/bash
# Follow-up CPU work after cpu_fallback_anchors.sh: waits for its DONE
# marker, then (1) recomputes the LMMSE covariance matrices on the
# zenith-upgraded UMi (the committed ones were measured on the 2D
# pre-zenith channel), (2) refreshes the results-comparison plots.
set -u
cd "$(dirname "$0")/.."
LOG=logs/cpu_post_anchors.log
PY="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 python"

while ! grep -q "CPU ANCHORS DONE" logs/cpu_anchors.log 2>/dev/null; do
  sleep 300
done

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" $PY "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
}

run 5400 -m neural_rx_tpu.cli.compute_cov --config nrx_rt --cpu \
    --batches 8 --batch-size 16
run 900 scripts/compare_results.py
echo "CPU POST-ANCHORS DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
