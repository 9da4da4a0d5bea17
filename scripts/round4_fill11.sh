#!/bin/bash
# Round-4 fill window 11: re-measure the nrx_large_64qam LMMSE+K-Best
# row with the noise-adaptive chest + exact detector.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill11.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== fill11 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"
while ! grep -q "fill10 complete" logs/round4_fill10.log 2>/dev/null; do
  sleep 120
done
sleep 30
if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
  kill "$pid" 2>/dev/null
  for i in $(seq 1 12); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
  kill -9 "$pid" 2>/dev/null
  rm -f run/train.pid
fi
sleep 45
now=$(date -u +%s)
if [ $((now + 1500)) -lt "$DEADLINE" ]; then
  echo "=== $(date -u '+%F %H:%M:%S') 64qam kbest re-measure (adaptive chest)" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout 1200 python scripts/evaluate_all.py \
      --config nrx_large_64qam --num-tx 2 --systems baseline_lmmse_kbest \
      --fast-ldpc --max-iter 400 --target-block-errors 200 \
      --target-bler 5e-4 --snr 4 5 6 7 8 \
      --ref-weights /root/reference/weights/nrx_large_64qam_weights \
      --budget-s 1000 >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
else
  echo "=== deadline: skip re-measure" >> "$LOG"
fi
now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== restart FINAL training fill for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4i.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill11 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
