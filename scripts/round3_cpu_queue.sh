#!/bin/bash
# Round-3 CPU eval queue: fills results-matrix curves that do not need
# the chip (4-PRB e2e configs are CPU-feasible). Runs serially in the
# background while the TPU trains. Curves land in results/ keyed like
# the reference's pickles; provenance (own vs imported weights) is
# recorded in results/README.md.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3_cpu_queue.log
mkdir -p logs
PY="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 python"

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" $PY "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
}

# 1) e2e_baseline: classical LS/lin+LMMSE curve (cheap, no weights)
run 10000 scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems baseline_lslin_lmmse --max-iter 300 \
    --target-block-errors 200 --target-bler 5e-5 --fast-ldpc --cpu

# 2) e2e_baseline: neural receiver (imported reference weights)
run 12000 scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems nrx --max-iter 300 --target-block-errors 200 \
    --target-bler 5e-5 --fast-ldpc --cpu \
    --ref-weights /root/reference/weights/e2e_baseline_weights

# 3) e2e_large: neural receiver (imported reference weights)
run 12000 scripts/evaluate_all.py --config e2e_large --num-tx 1 \
    --systems nrx --max-iter 300 --target-block-errors 200 \
    --target-bler 5e-5 --fast-ldpc --cpu \
    --ref-weights /root/reference/weights/e2e_large_weights

# 4) e2e_rt: OWN-trained full curve (VERDICT weak #5: >=200 errors,
#    >=4 SNR points; replaces the thin 2-point/300-block eval)
run 14000 scripts/evaluate_all.py --config e2e_rt --num-tx 1 \
    --systems nrx --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-5 --fast-ldpc --cpu

# 5) e2e_baseline: K-Best baselines (slowest; whatever fits the window)
run 14000 scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems baseline_lmmse_kbest baseline_perf_csi_kbest \
    --max-iter 300 --target-block-errors 200 --target-bler 5e-5 \
    --fast-ldpc --cpu

echo "ROUND3 CPU QUEUE DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
