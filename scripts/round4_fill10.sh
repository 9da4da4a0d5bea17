#!/bin/bash
# Round-4 fill window 10: standalone debug run of the best-engine
# child (whole-grid deployed surface) with full log capture, then the
# training fill resumes (fill9 already launched the final fill; this
# window briefly borrows the chip).
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill10.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== fill10 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while ! grep -q "fill9 complete" logs/round4_fill9.log 2>/dev/null; do
  sleep 120
done
sleep 30

if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
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
if [ $((now + 1500)) -lt "$DEADLINE" ]; then
  echo "=== $(date -u '+%F %H:%M:%S') bench_deploy_best debug" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout 1200 env \
      NRX_DEPLOY_WBLK_B1=4096 NRX_DEPLOY_WBLK_B16=192 NRX_SAFE_MS=0.6625 \
      NRX_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=65536 \
      python scripts/bench_deploy_best.py >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
else
  echo "=== deadline: skip debug" >> "$LOG"
fi

now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== restart FINAL training fill for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4h.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill10 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
