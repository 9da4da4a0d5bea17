#!/bin/bash
# Post-training-queue measurement pass (single TPU client at a time):
# honest (tunnel-synced) latency numbers + remaining eval anchors.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round_end_bench.log

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75
}

# 1) headline bench (serialized device time, chained scan)
run 1800 python bench.py

# 2) latency-vs-depth table (reference architecture notebook)
run 2400 python scripts/bench_depth.py --depths 1 2 4 8

# 3) K-Best baseline eval-step cost with real syncs
run 1800 python scripts/profile_eval.py --systems kbest perf_csi_kbest \
    --steps 3

# 4) reference's 1-UE qpsk slice (TDL-B100, like the reference's
#    1-UE results; DoubleTDL asserts 2 UEs)
run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_rt_qpsk --num-tx 1 --channel TDL-B100 --snr 0 1

# 5) imported-reference-weight parity anchors on configs beyond nrx_rt
#    (reference committed curves: nrx_large 0.150@2dB / 0.0327@3dB,
#    e2e_rt 0.0731@2dB / 0.0078@3dB)
run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_large \
    --ref-weights /root/reference/weights/nrx_large_weights --snr 2 3
run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
    --config e2e_rt \
    --ref-weights /root/reference/weights/e2e_rt_weights --snr 2 3

echo "ROUND_END_BENCH DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
