#!/bin/bash
# Round-4 FINAL window (the round runs to ~03:05 UTC, not 01:45 as the
# earlier deadline assumed): re-measure the two remaining +dB K-Best
# rows with the denser 12-point noise-weight grid, then a proper
# training segment with an end-of-segment save and chip-free margin
# before the driver bench.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_final.log
DEADLINE=$(date -u -d '2026-08-21 02:48' +%s)
echo "=== final window armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 300)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights
run 1000 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_lmmse_kbest --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 4 5 6 7 8 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 850
run 800 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 0 --fast-ldpc \
    --max-iter 300 --target-block-errors 200 --target-bler 3e-3 \
    --snr -1 0 1 2 3 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 650

now=$(date -u +%s)
left=$((DEADLINE - now - 60))
if [ "$left" -gt 400 ]; then
  echo "=== FINAL training segment for ${left}s" >> "$LOG"
  sleep 20
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4z.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== final window complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
