#!/bin/bash
# Round-3 (resumed) chip window C: nrx_large family results (imported
# reference weights) + own site-specific fine-tune curve + fused depth
# sweep + the lin_extrap lslin baseline re-measurement. Fires after
# training segment r3g exits. Does NOT relaunch training itself —
# window D chains directly off the marker file and owns the final
# deadline-bounded training segment.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowC.log
mkdir -p logs run
echo "=== windowC armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3g.log ]; do sleep 60; done
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== r3g done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights

# 1) nrx_large 2-UE curve (imported reference weights)
run 1000 python scripts/evaluate_all.py --config nrx_large --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/nrx_large_weights --budget-s 850

# 2) nrx_large depth-sweep BLER pickle (reference nrx_large_sweep_results)
run 1500 python scripts/eval_sweep.py --config nrx_large --num-tx 2 \
    --ref-weights $REFW/nrx_large_weights --max-iter 300 \
    --target-errors 200 --target-bler 5e-4 --budget-s 1300

# 3) OWN fine-tuned site-specific curve (VERDICT missing #3)
run 1300 python scripts/evaluate_all.py --config nrx_site_specific_100k \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 \
    --snr -3 -1 1 3 5 7 9 11 14 17 20 --budget-s 1100

# 4) fused-path depth-sweep latency (reference A100 0.61..3.11 ms)
run 1000 python scripts/bench_depth.py --variant fiter \
    --depths 1 2 3 4 5 6 7 8

# 5) LS/lin+LMMSE baseline re-run with the reference-faithful
#    lin_extrap chest (quantifies the +0.64 dB shift root-cause fix)
run 900 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 750

touch logs/round3c_windowC.done
echo "=== windowC complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
