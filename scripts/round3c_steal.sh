#!/bin/bash
# Mid-r3g validation slot: the clamped-fetch + T-stacked kernel changes
# (commits 9708990, ea96f89) MUST be Mosaic-validated before the driver
# round-end bench compiles them via entry(). Waits for r3g to be ~12
# min in (past its compile + a couple of ckpt saves), kills the exact
# training PID, runs the compile smoke + the fused-iter A/B, then
# relaunches training for the remainder of r3g's window so the master
# queue's trigger semantics stay intact.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_steal.log
mkdir -p logs run
echo "=== steal armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while [ ! -f logs/nrx_rt_seg_r3g.log ]; do sleep 30; done
sleep 720   # let r3g compile and bank >= a few ckpt saves

if [ -f run/train.pid ] && kill -0 "$(cat run/train.pid)" 2>/dev/null; then
  pid=$(cat run/train.pid)
  echo "=== killing r3g pid $pid for the validation slot" >> "$LOG"
  kill "$pid" 2>/dev/null; sleep 15; kill -9 "$pid" 2>/dev/null
  # hold the master queue off while the slot runs: train.pid points at
  # THIS script until r3g2 takes over
  echo $$ > run/train.pid
fi
# r3g's watchdog watches logs/nrx_rt.jsonl mtime and would kill the pid
# in train.pid (now us) after 420s of training silence: keep the log
# mtime fresh for the duration of the slot instead of pattern-killing
# the watchdog.
touch run/keepalive
( while [ -f run/keepalive ]; do touch logs/nrx_rt.jsonl; sleep 60; done ) &
KEEPALIVE=$!
sleep 45

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

run 800 python scripts/tpu_compile_smoke.py
run 700 python scripts/bench_fused_iter.py --wblk 128 --b16

# hand the chip back: training segment r3g2 keeps run/train.pid alive
# so the master queue still fires on its exit
echo "=== steal done; relaunching training r3g2 $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 env NRX_SEPCONV_FOLDED=1 nohup timeout 1600 \
    python scripts/train_long.py --config nrx_rt --seconds 1500 \
    > logs/nrx_rt_seg_r3g2.log 2>&1 &
echo $! > run/train.pid
rm -f run/keepalive
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== steal complete, r3g2 pid $(cat run/train.pid)" >> "$LOG"
