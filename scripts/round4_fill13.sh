#!/bin/bash
# Round-4 fill window 13 (final): retry the masking perf-CSI mcs1/2
# rows (transient remote-compile transport error in fill12), then
# training to the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill13.log
DEADLINE=$(date -u -d '2026-08-21 01:15' +%s)
echo "=== fill13 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"
while ! grep -q "fill12 complete" logs/round4_fill12.log 2>/dev/null; do
  sleep 60
done
sleep 20
if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
  kill "$pid" 2>/dev/null
  for i in $(seq 1 12); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
  kill -9 "$pid" 2>/dev/null
  rm -f run/train.pid
fi
sleep 45
now=$(date -u +%s)
if [ $((now + 1000)) -lt "$DEADLINE" ]; then
  echo "=== $(date -u '+%F %H:%M:%S') perfcsi retry" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout 800 python scripts/evaluate_all.py \
      --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
      --systems baseline_perf_csi_kbest --mcs-idx 1 2 --fast-ldpc \
      --max-iter 300 --target-block-errors 200 --target-bler 3e-3 \
      --snr 1 2 3 4 5 6 7 \
      --ref-weights /root/reference/weights/nrx_large_var_mcs_64qam_masking_weights \
      --budget-s 650 >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
fi
now=$(date -u +%s)
left=$((DEADLINE - now - 60))
if [ "$left" -gt 300 ]; then
  echo "=== FINAL training fill for ${left}s" >> "$LOG"
  sleep 20
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 120)) > logs/nrx_rt_seg_r4k.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill13 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
