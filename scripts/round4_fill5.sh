#!/bin/bash
# Round-4 fill window 5: after the perf window (v4) completes, pause
# the training fill and (a) RE-measure the nrx_large_64qam K-Best rows
# with the sorted-QR detector (the unordered detector measured
# +1.76 dB vs the reference; hard decisions now match exhaustive ML),
# (b) measure the perf-CSI K-Best 64-QAM row the earlier timeout
# skipped, (c) top up the mixed-MCS lslin mixed-half deep point (nan at
# 1e-2 in compare/summary.md), then restart the training fill.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_fill5.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== fill5 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while ! grep -q "perf window v4 complete" logs/round4_perf.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "=== perf v4 done $(date -u '+%F %H:%M:%S')" >> "$LOG"

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

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 600)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights

run 1400 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_lmmse_kbest --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 4 5 6 7 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 1200
run 1000 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_perf_csi_kbest --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 3 4 5 6 7 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 850
run 900 python scripts/eval_mixed_mcs.py \
    --ref-weights $REFW/nrx_rt_var_mcs_weights --target-errors 200 \
    --systems lslin --budget-s 750

now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== restart training fill for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4c.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== fill5 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
