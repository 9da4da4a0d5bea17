#!/bin/bash
# Round-3 (resumed) chip window D: site-specific imported curves +
# e2e matrix entries, deadline-aware; then fills whatever chip time
# remains before the deadline with a final bounded nrx_rt training
# segment (r3h) and leaves the chip free for the driver's round-end
# bench.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowD2.log
mkdir -p logs run
DEADLINE=$(date -u -d '2026-08-20 13:30' +%s)
echo "=== windowD armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/round3c_windowC2.done ]; do sleep 60; done
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

# 1) site-specific plain fine-tune (imported reference weights)
run 1300 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 1100

# 2) site-specific UMi-only baseline NRX (no fine-tune)
run 1000 python scripts/evaluate_all.py --config nrx_site_specific_baseline \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_baseline_weights --budget-s 850

# 3) e2e_baseline matrix entry (NRX + classical baselines, 1 UE)
run 1500 python scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems nrx baseline_lslin_lmmse baseline_lmmse_kbest \
    baseline_perf_csi_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --ref-weights $REFW/e2e_baseline_weights --budget-s 1300

# 4) e2e_large (pilotless 8-iter, imported weights)
run 900 python scripts/evaluate_all.py --config e2e_large --num-tx 1 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/e2e_large_weights --budget-s 750

# Fill the remaining chip time with training, bounded to the deadline.
now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== windowD evals done; final training seg r3h for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout $((left)) \
      python scripts/train_long.py --config nrx_rt --seconds $((left - 150)) \
      > logs/nrx_rt_seg_r3h.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== windowD complete $(date -u '+%F %H:%M:%S'); chip frees by 13:30" >> "$LOG"
