#!/bin/bash
# CPU fallback for the round-2 parity anchors, for the case where the
# axon relay never recovers (round 1 ended with zero driver-verified
# numbers because everything was TPU-gated). Runs imported-reference-
# weight BLER anchors at 200 block errors on the CPU backend —
# slower but tunnel-independent. The TPU queue (round2_watch.sh)
# supersedes these with deeper/faster measurements if the link returns.
# Results append to results/trained_progress.jsonl (with block counts
# for CIs).
set -u
cd "$(dirname "$0")/.."
LOG=logs/cpu_anchors.log
mkdir -p logs
PY="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 python"

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" $PY "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
}

# 1) nrx_rt parity knee (reference committed: 0.325 @ 2 dB, 0.0936 @ 3)
run 7200 scripts/eval_trained_quick.py --cpu --config nrx_rt \
    --ref-weights /root/reference/weights/nrx_rt_weights \
    --target-errors 200 --max-iter 200 --snr 2 3

# 2) nrx_large parity (reference: 0.150 @ 2 dB)
run 7200 scripts/eval_trained_quick.py --cpu --config nrx_large \
    --ref-weights /root/reference/weights/nrx_large_weights \
    --target-errors 200 --max-iter 120 --snr 2

# 3) e2e_rt pilotless parity (reference: 0.0731 @ 2 dB)
run 9000 scripts/eval_trained_quick.py --cpu --config e2e_rt \
    --ref-weights /root/reference/weights/e2e_rt_weights \
    --target-errors 200 --max-iter 400 --snr 2

# 4) qpsk 1-UE anchor (reference 1-UE slice: 7.32e-2 @ 0 dB)
run 7200 scripts/eval_trained_quick.py --cpu --config nrx_rt_qpsk \
    --num-tx 1 --channel TDL-B100 --target-errors 200 --max-iter 300 \
    --snr 0 1

echo "CPU ANCHORS DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
