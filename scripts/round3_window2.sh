#!/bin/bash
# Round-3 chip window 2: nrx_large family results (imported reference
# weights — these configs have no own training yet) + the fused-path
# depth-sweep latency (VERDICT weak #2). Fires only after window 1's
# training segment r3d has STARTED (its log exists) and then finished,
# so arming it early cannot collide with window 1's evals. Relaunches
# training (segment r3e) at the end.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3_window2.log
mkdir -p logs run
echo "=== window2 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3d.log ]; do sleep 60; done
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== r3d done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights

# 1) depth-sweep latency on the FUSED serving path (reference A100
#    medians 0.61..3.11 ms for depth 1..8)
run 1500 python scripts/bench_depth.py --variant fiter --depths 1 2 3 4 5 6 7 8

# 2) nrx_large 2-UE + 1-UE curves (1 UE on TDL-B100 like the reference
#    1-UE slices)
run 1100 python scripts/evaluate_all.py --config nrx_large --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/nrx_large_weights --budget-s 900
run 1000 python scripts/evaluate_all.py --config nrx_large --num-tx 1 \
    --channel TDL-B100 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --ref-weights $REFW/nrx_large_weights --budget-s 800

# 3) nrx_large depth-sweep BLER pickle (8 keys, sweep format)
run 2400 python scripts/eval_sweep.py --config nrx_large --num-tx 2 \
    --ref-weights $REFW/nrx_large_weights --max-iter 300 \
    --target-errors 200 --target-bler 5e-4 --budget-s 2200

# 4) nrx_large_qpsk curves
run 900 python scripts/evaluate_all.py --config nrx_large_qpsk --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/nrx_large_qpsk_weights \
    --budget-s 700
run 900 python scripts/evaluate_all.py --config nrx_large_qpsk --num-tx 1 \
    --channel TDL-B100 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --ref-weights $REFW/nrx_large_qpsk_weights --budget-s 700

echo "=== window2 evals done; relaunching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 nohup timeout 4400 python scripts/train_long.py \
    --config nrx_rt --seconds 4200 > logs/nrx_rt_seg_r3e.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== window2 complete, training seg r3e pid $(cat run/train.pid)" >> "$LOG"
