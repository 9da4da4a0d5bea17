#!/bin/bash
# Round-3 chip window 3: site-specific results family (VERDICT missing
# #3). Own-trained 100k fine-tune + imported-reference-weight curves
# for the plain/baseline/large variants. Fires after segment r3e (from
# window 2) completes. Deadline-aware: skips runs that would start too
# close to the round-end bench, and fills any remaining time with a
# deadline-bounded training segment instead of a fixed-length one.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3_window3.log
mkdir -p logs run
# round started 23:51 UTC Aug 19; driver bench needs the chip by ~11:30
DEADLINE=$(date -u -d '2026-08-20 11:05' +%s)
echo "=== window3 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3e.log ]; do sleep 60; done
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== r3e done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t)) -gt "$DEADLINE" ]; then
    t=$((DEADLINE - now - 60))
    if [ "$t" -lt 300 ]; then
      echo "=== deadline: skip $*" >> "$LOG"; return
    fi
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights
SNR_FULL="-3 -1 1 3 5 7 9 11 14 17 20"
SNR_BASE="-3 -1 1 3 5 7 9 11 13 15"

# 1) OWN fine-tuned site-specific model (the story VERDICT asked for)
run 2100 python scripts/evaluate_all.py --config nrx_site_specific_100k \
    --num-tx 1 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --budget-s 1900

# 2) reference-weight site-specific (plain fine-tune) curves
run 1700 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 1 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 1500

# 3) non-fine-tuned baseline NRX (trained on stochastic UMi only) +
#    classical baseline on the site dataset
run 1300 python scripts/evaluate_all.py --config nrx_site_specific_baseline \
    --num-tx 1 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_BASE \
    --ref-weights $REFW/nrx_site_specific_baseline_weights --budget-s 1100
run 900 python scripts/evaluate_all.py --config nrx_site_specific_baseline \
    --num-tx 1 2 --systems baseline_lslin_lmmse --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 2e-4 \
    --snr $SNR_BASE --budget-s 700

# 4) large variants (one key each)
run 800 python scripts/evaluate_all.py --config nrx_site_specific_large \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_large_weights --budget-s 600
run 800 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline_large --num-tx 1 2 --systems nrx \
    --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 2e-4 --snr $SNR_BASE \
    --ref-weights $REFW/nrx_site_specific_baseline_large_weights \
    --budget-s 600

echo "=== window3 evals done $(date -u '+%F %H:%M:%S')" >> "$LOG"
# fill whatever remains before the deadline with training
now=$(date -u +%s)
left=$((DEADLINE - now - 180))
if [ "$left" -gt 600 ]; then
  sleep 30
  PYTHONUNBUFFERED=1 nohup timeout $((left + 120)) \
      python scripts/train_long.py --config nrx_rt --seconds "$left" \
      > logs/nrx_rt_seg_r3f.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
  echo "=== window3: tail training seg r3f ${left}s pid $(cat run/train.pid)" >> "$LOG"
else
  echo "=== window3: no time for tail training" >> "$LOG"
fi
