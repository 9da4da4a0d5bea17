#!/bin/bash
# Round-3 (resumed) chip window C: nrx_large family results (imported
# reference weights) + own site-specific fine-tune curve. Fires after
# training segment r3g exits. Relaunches a deadline-bounded training
# segment (r3h) at the end.
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
run 1100 python scripts/evaluate_all.py --config nrx_large --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --ref-weights $REFW/nrx_large_weights --budget-s 950

# 2) nrx_large depth-sweep BLER pickle (reference nrx_large_sweep_results)
run 2000 python scripts/eval_sweep.py --config nrx_large --num-tx 2 \
    --ref-weights $REFW/nrx_large_weights --max-iter 300 \
    --target-errors 200 --target-bler 5e-4 --budget-s 1800

# 3) OWN fine-tuned site-specific curve (VERDICT missing #3)
run 1500 python scripts/evaluate_all.py --config nrx_site_specific_100k \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-4 \
    --snr -3 -1 1 3 5 7 9 11 14 17 20 --budget-s 1300

# 4) fused-path depth-sweep latency (reference A100 0.61..3.11 ms)
run 1200 python scripts/bench_depth.py --variant fiter \
    --depths 1 2 3 4 5 6 7 8

# 5) LS/lin+LMMSE baseline re-run with the reference-faithful
#    lin_extrap chest (quantifies the +0.64 dB shift root-cause fix)
run 1100 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 950

echo "=== windowC done; relaunching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout 2700 \
    python scripts/train_long.py --config nrx_rt --seconds 2600 \
    > logs/nrx_rt_seg_r3h.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== windowC complete, training seg r3h pid $(cat run/train.pid)" >> "$LOG"
