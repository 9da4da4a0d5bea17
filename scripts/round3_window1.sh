#!/bin/bash
# Round-3 chip window 1: waits for the current training segment to
# exit, then runs (in order) compile smoke, fused-iteration A/B
# (w_blk x MXU), component breakdown, mixed-MCS eval, 64qam curve —
# each under timeout — and finally relaunches nrx_rt training with its
# PID watchdog so the chip never idles.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3_window1.log
mkdir -p logs run
echo "=== window1 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

# wait for the training segment to finish (clean exit at --seconds)
while [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; do
  sleep 30
done
echo "=== training segment done $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 60   # let the tunnel settle between clients

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

# 1) every pallas kernel compiles at deployed shape (incl. new MXU path
#    + the 64qam LDPC auto-tile that OOM'd in round 2)
run 900 python scripts/tpu_compile_smoke.py

# 2) fused-iteration A/B: w_blk sweep x {VPU stencil, MXU folded taps}
run 1800 python scripts/bench_fused_iter.py --wblk 128 256 384 --b16

# 3) component breakdown (prep vs cgnn) for the latency attack
run 600 python scripts/bench_components.py

# 4) mixed-MCS results matrix (nrx with imported var_mcs weights +
#    LS/lin+LMMSE baseline; budget-bounded, incremental pickle)
run 3000 python scripts/eval_mixed_mcs.py \
    --ref-weights /root/reference/weights/nrx_rt_var_mcs_weights \
    --budget-s 2700

# 5) nrx_rt_64qam own-trained curve (fast-ldpc now covers Z=384 tiles)
run 1800 python scripts/evaluate_all.py --config nrx_rt_64qam --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 600 --target-block-errors 200 \
    --target-bler 5e-4 --budget-s 1500

echo "=== window1 evals done; relaunching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 nohup timeout 6400 python scripts/train_long.py \
    --config nrx_rt --seconds 6200 > logs/nrx_rt_seg_r3d.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== window1 complete, training seg r3d pid $(cat run/train.pid)" >> "$LOG"
