#!/bin/bash
# Round-3 (resumed) chip window B. Fires when training segment r3f
# exits. Measurement goals:
#   1. MXU fused-iteration retry: the w128 failure was a scoped-VMEM
#      OOM (17.9M vs 16M), so try (a) smaller w_blk, (b) raised
#      --xla_tpu_scoped_vmem_limit_kib (proto-backed flag, forwarded
#      through the axon remote compile)
#   2. infer-side profiler trace for the latency attack
#   3. mixed-MCS results matrix curve (reference mixed_mcs_results)
#   4. nrx_rt_64qam own-trained-weights curve
# then relaunches nrx_rt training (segment r3g).
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowB.log
mkdir -p logs run
echo "=== windowB armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3f.log ]; do sleep 60; done
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== r3f done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

# 1a) small-w_blk MXU variants (fit under the default 16M scoped vmem)
run 1200 python scripts/bench_fused_iter.py --wblk 64 96 --b16
# 1b) raised scoped-vmem budget: w128 MXU + w256 non-MXU (halo fraction
#     halves at 256; the 16M default OOM'd both)
run 1200 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=30720 \
    python scripts/bench_fused_iter.py --wblk 128 256 --b16
# 2) op-level traces: deployed inference step AND the training chunk
#    (training is at 66 it/s vs a ~400 it/s flops bound - find the hog)
run 900 python scripts/capture_trace.py --what train infer --config nrx_rt

# 3) mixed-MCS matrix (imported var_mcs weights + lslin baseline)
run 2700 python scripts/eval_mixed_mcs.py \
    --ref-weights /root/reference/weights/nrx_rt_var_mcs_weights \
    --budget-s 2400

# 4) nrx_rt_64qam own-trained curve (fast-ldpc covers Z=384 tiles)
run 1500 python scripts/evaluate_all.py --config nrx_rt_64qam --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 600 --target-block-errors 200 \
    --target-bler 5e-4 --budget-s 1300

echo "=== windowB done; relaunching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout 3400 \
    python scripts/train_long.py --config nrx_rt --seconds 3200 \
    > logs/nrx_rt_seg_r3g.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== windowB complete, training seg r3g pid $(cat run/train.pid)" >> "$LOG"
