#!/bin/bash
# Round-4 fill window 7: after fill6, pause training and validate the
# NEW two-line bench.py end-to-end on the real chip (safe line + the
# whole-grid best-engine subprocess), then restart the final training
# fill. De-risks the driver's round-end bench run.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill7.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== fill7 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while ! grep -q "fill6 complete" logs/round4_fill6.log 2>/dev/null; do
  sleep 120
done
sleep 30

if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
  echo "=== pausing training fill (pid $pid)" >> "$LOG"
  kill "$pid" 2>/dev/null
  for i in $(seq 1 12); do
    kill -0 "$pid" 2>/dev/null || break
    sleep 10
  done
  kill -9 "$pid" 2>/dev/null
  rm -f run/train.pid
fi
sleep 45

now=$(date -u +%s)
if [ $((now + 2100)) -lt "$DEADLINE" ]; then
  echo "=== $(date -u '+%F %H:%M:%S') bench.py validation" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout 1700 python bench.py >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
else
  echo "=== deadline: skip bench validation" >> "$LOG"
fi

now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== restart training fill for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4e.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill7 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
