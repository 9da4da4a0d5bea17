#!/bin/bash
# Replacement for the tail of the master queue: the own-EMA nrx_rt
# curve (P2) hung at client startup and was timeout-killed, so retry
# it FIRST; then the remaining priorities. 60s inter-client gaps (the
# 20s gap is the suspected cause of the P2 startup stall). Waits for
# the still-running site_100k eval (PID passed as $1) to finish.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_master2.log
mkdir -p logs run
DEADLINE=$(date -u -d '2026-08-20 13:30' +%s)
P3PID=${1:-0}
echo "=== master2 armed $(date -u '+%F %H:%M:%S'), waiting on pid $P3PID" >> "$LOG"
while [ "$P3PID" -gt 0 ] && kill -0 "$P3PID" 2>/dev/null; do sleep 20; done
sleep 60

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 2700)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 60
}

REFW=/root/reference/weights

# P2 retry: own nrx_rt EMA-weights curve
run 1000 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --weights weights/nrx_rt_ema_weights.pkl \
    --budget-s 850

# P4: nrx_large depth-sweep pickle
run 1500 python scripts/eval_sweep.py --config nrx_large --num-tx 2 \
    --ref-weights $REFW/nrx_large_weights --max-iter 300 \
    --target-errors 200 --target-bler 5e-4 --budget-s 1300

# P5: fused-path depth-sweep latency
run 1000 python scripts/bench_depth.py --variant fiter \
    --depths 1 2 3 4 5 6 7 8

# P6: lslin baseline with lin_extrap
run 900 python scripts/evaluate_all.py --config nrx_rt --num-tx 2 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 --budget-s 750

# tail: training fill to the deadline (the armed round3c_tail.sh then
# takes this slot for e2e_rt + the fiter A/B)
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
echo "=== master2 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
