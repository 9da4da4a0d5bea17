#!/bin/bash
# Round-3 (resumed) window B2: tunnel-recovery gate + the window-B
# sequence. The device runtime wedged at ~07:40 (first hang killed by
# the training watchdog; every later client hung at its first device
# op while the relay's HTTP compile endpoints stayed healthy). This
# script probes the device with a killable subprocess every 3 min and
# only runs the measurement sequence once a probe succeeds; each probe
# is its own process so a hung probe can't wedge the gate.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowB2.log
mkdir -p logs run
echo "=== windowB2 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

probe() {
  timeout 90 python -c "
import numpy, jax, jax.numpy as jnp
numpy.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1)))
print('ok')" 2>/dev/null | grep -q ok
}

until probe; do
  echo "--- device still wedged $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 180
done
echo "=== device BACK $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

# 1) fused-iteration A/B: bf16-dot fix + lp stencil + fused readout
run 1500 python scripts/bench_fused_iter.py --wblk 128 --b16
# 2) op-level traces (train hog + infer breakdown)
run 900 python scripts/capture_trace.py --what train infer --config nrx_rt
# 3) mixed-MCS matrix curve
run 2400 python scripts/eval_mixed_mcs.py \
    --ref-weights /root/reference/weights/nrx_rt_var_mcs_weights \
    --budget-s 2100
# 4) nrx_rt_64qam own-trained curve
run 1300 python scripts/evaluate_all.py --config nrx_rt_64qam --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 600 --target-block-errors 200 \
    --target-bler 5e-4 --budget-s 1100

echo "=== windowB2 done; relaunching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout 3400 \
    python scripts/train_long.py --config nrx_rt --seconds 3200 \
    > logs/nrx_rt_seg_r3g.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== windowB2 complete, training seg r3g pid $(cat run/train.pid)" >> "$LOG"
