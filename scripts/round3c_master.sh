#!/bin/bash
# Round-3 (resumed) master eval queue. Replaces windows C/C2/D2 after
# the device wedge ate the fixed-chain schedule: ONE priority-ordered,
# per-item deadline-gated queue that fires after training segment r3g
# (launched by window B2) exits, and fills the tail with a bounded
# training segment. Chip-free by the DEADLINE for the driver bench.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_master.log
mkdir -p logs run
DEADLINE=$(date -u -d '2026-08-20 13:30' +%s)
echo "=== master armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3g.log ]; do sleep 60; done
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== r3g done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 900)) -gt "$DEADLINE" ]; then
    # keep >=15 min for the final training fill + margin
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights
SNR_FULL="-3 -1 1 3 5 7 9 11 14 17 20"

# P1: nrx_large 2-UE curve (imported weights)
run 1000 python scripts/evaluate_all.py --config nrx_large --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/nrx_large_weights --budget-s 850

# P2: own nrx_rt EMA-weights curve (own-training evidence)
run 1000 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --weights weights/nrx_rt_ema_weights.pkl \
    --budget-s 850

# P3: own fine-tuned site-specific curve
run 1300 python scripts/evaluate_all.py --config nrx_site_specific_100k \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --budget-s 1100

# P4: nrx_large depth-sweep pickle
run 1500 python scripts/eval_sweep.py --config nrx_large --num-tx 2 \
    --ref-weights $REFW/nrx_large_weights --max-iter 300 \
    --target-errors 200 --target-bler 5e-4 --budget-s 1300

# P5: fused-path depth-sweep latency
run 1000 python scripts/bench_depth.py --variant fiter \
    --depths 1 2 3 4 5 6 7 8

# P6: lslin baseline with lin_extrap (root-cause quantification)
run 900 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 750

# P7: var_mcs own-trained heads
run 1200 python scripts/evaluate_all.py --config nrx_rt_var_mcs \
    --num-tx 2 --systems nrx --mcs-idx 0 1 --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 1000

# P8: site-specific imported fine-tune curve
run 1300 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 1100

# P9: site-specific UMi-only baseline NRX
run 1000 python scripts/evaluate_all.py --config nrx_site_specific_baseline \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 --snr $SNR_FULL \
    --ref-weights $REFW/nrx_site_specific_baseline_weights --budget-s 850

# P10: e2e_baseline matrix entry
run 1500 python scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems nrx baseline_lslin_lmmse baseline_lmmse_kbest \
    baseline_perf_csi_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --ref-weights $REFW/e2e_baseline_weights --budget-s 1300

# P11: e2e_large
run 900 python scripts/evaluate_all.py --config e2e_large --num-tx 1 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/e2e_large_weights --budget-s 750

# tail: training fill to the deadline
now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== final training fill r3h for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout $((left)) \
      python scripts/train_long.py --config nrx_rt --seconds $((left - 150)) \
      > logs/nrx_rt_seg_r3h.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== master complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
