#!/bin/bash
# Round-4 fill window 12: re-measure the masking-config mcs1/mcs2
# K-Best + perf-CSI baseline rows after the Eb/No-conversion fix
# (+ exact detector + adaptive chest), then training to the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill12.log
DEADLINE=$(date -u -d '2026-08-21 01:15' +%s)
echo "=== fill12 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
  kill "$pid" 2>/dev/null
  for i in $(seq 1 12); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
  kill -9 "$pid" 2>/dev/null
  rm -f run/train.pid
fi
sleep 45
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
CFG=nrx_large_var_mcs_64qam_masking
W=$REFW/nrx_large_var_mcs_64qam_masking_weights
run 1100 python scripts/evaluate_all.py --config $CFG --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 1 2 --fast-ldpc \
    --max-iter 300 --target-block-errors 200 --target-bler 3e-3 \
    --snr 2 3 4 5 6 7 8 9 --ref-weights $W --budget-s 950
run 900 python scripts/evaluate_all.py --config $CFG --num-tx 2 \
    --systems baseline_perf_csi_kbest --mcs-idx 1 2 --fast-ldpc \
    --max-iter 300 --target-block-errors 200 --target-bler 3e-3 \
    --snr 1 2 3 4 5 6 7 --ref-weights $W --budget-s 750
run 700 python scripts/evaluate_all.py --config $CFG --num-tx 2 \
    --systems baseline_lslin_lmmse --mcs-idx 1 2 --fast-ldpc \
    --max-iter 300 --target-block-errors 200 --target-bler 3e-3 \
    --snr 3 4 5 6 7 8 9 --ref-weights $W --budget-s 550
now=$(date -u +%s)
left=$((DEADLINE - now - 60))
if [ "$left" -gt 400 ]; then
  echo "=== restart FINAL training fill for ${left}s" >> "$LOG"
  sleep 20
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 120)) > logs/nrx_rt_seg_r4j.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill12 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
