#!/bin/bash
# Round-2 continuation queue: fill the results matrix (own-trained +
# imported-reference curves + baselines), then site-specific fine-tune
# and time-boxed nrx_rt training. Single TPU client at a time; kill by
# exact PID only; every job bounded by timeout.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?usage: round2c_queue.sh <deadline-epoch>}
LOG=logs/round2c_queue.log
mkdir -p logs

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  local t="$1"; shift
  local l; l=$(left)
  [ "$l" -le 120 ] && return 1
  [ "$t" -gt "$l" ] && t="$l"
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75
}

EA="python scripts/evaluate_all.py"

# 1. flagship pickle: classical LMMSE baselines, full curve
run 2700 $EA --config nrx_rt --num-tx 2 \
    --systems baseline_lslin_lmmse baseline_lsnn_lmmse \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
# 2. imported-reference-weight curve (parity vs committed results)
run 2400 $EA --config nrx_rt --num-tx 2 --systems nrx \
    --ref-weights /root/reference/weights/nrx_rt_weights \
    --results-name nrx_rt_ref_results \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
# 3. nrx_rt 1-UE slice (reference key ("Neural Receiver", 1, 0))
run 1500 $EA --config nrx_rt --num-tx 1 --channel TDL-B100 \
    --systems nrx --fast-ldpc --max-iter 1000 \
    --target-block-errors 200 --target-bler 1e-3
# 4-6. own-trained config family curves
run 2400 $EA --config nrx_rt_qpsk --num-tx 2 --systems nrx \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
run 1500 $EA --config nrx_rt_qpsk --num-tx 1 --channel TDL-B100 \
    --systems nrx --fast-ldpc --max-iter 1000 \
    --target-block-errors 200 --target-bler 1e-3
run 2400 $EA --config nrx_rt_64qam --num-tx 2 --systems nrx \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
run 3000 $EA --config nrx_rt_var_mcs --num-tx 2 --systems nrx \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
# 7. e2e pilotless (z=352 -> flooding decoder; bound blocks per point)
run 3600 $EA --config e2e_rt --num-tx 1 --systems nrx \
    --snr 0 1 2 3 4 5 --max-iter 30 --target-block-errors 200 \
    --target-bler 1e-3
# 8. K-Best baselines at the knee (reference uses small batches too)
run 3600 $EA --config nrx_rt --num-tx 2 \
    --systems baseline_lmmse_kbest baseline_perf_csi_kbest \
    --snr -2 -1 0 1 2 3 4 --fast-ldpc --max-iter 60 \
    --target-block-errors 100 --target-bler 3e-3
# 9. imported nrx_large (depth-8 flagship; own nrx_large untrained)
run 3000 $EA --config nrx_large --num-tx 2 --systems nrx \
    --ref-weights /root/reference/weights/nrx_large_weights \
    --results-name nrx_large_ref_results \
    --fast-ldpc --snr 0 1 2 3 4 5 --max-iter 300 \
    --target-block-errors 200 --target-bler 1e-3
# 10. site-specific fine-tune segment + eval
if [ "$(left)" -gt 4500 ]; then
  run 2400 python scripts/train_long.py --config nrx_site_specific_100k \
      --seconds 1500
  run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
      --config nrx_site_specific_100k --snr 8 10 12 14
fi
# 11. nrx_rt training with whatever is left (keep margin for the
#     driver's round-end bench)
while [ "$(left)" -gt 2400 ]; do
  T=$(( $(left) - 1800 ))
  [ "$T" -gt 5400 ] && T=5400
  run $(( T + 600 )) python scripts/train_long.py --config nrx_rt \
      --seconds "$T"
  run 1000 python scripts/eval_trained_quick.py --fast-ldpc --snr 3 4
done
echo "ROUND2C QUEUE DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
