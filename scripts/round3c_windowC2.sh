#!/bin/bash
# Round-3 (resumed) chip window C2: own-weights evidence. Fires after
# window C. (1) nrx_rt own-trained EMA (Polyak) curve — the averaged
# weights are the best own-training BLER evidence available mid-
# schedule; (2) var_mcs own-trained heads at >=200-error statistics
# (VERDICT weak #5).
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowC2.log
mkdir -p logs run
echo "=== windowC2 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"
while [ ! -f logs/round3c_windowC.done ]; do sleep 60; done
sleep 60

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

# 1) own nrx_rt EMA-weights 2-UE curve (saved under the main label,
#    overwriting raw-weight points where re-measured: EMA is the
#    better own-training estimate at the same step count)
run 1000 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --weights weights/nrx_rt_ema_weights.pkl \
    --budget-s 850

# 2) var_mcs own-trained heads (both MCS), 4+ SNR points
run 1200 python scripts/evaluate_all.py --config nrx_rt_var_mcs \
    --num-tx 2 --systems nrx --mcs-idx 0 1 --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 1000

touch logs/round3c_windowC2.done
echo "=== windowC2 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
