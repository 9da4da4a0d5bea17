#!/bin/bash
# Round-4 perf+fill window v3 (supersedes v1/v2, both killed while
# still waiting): after round4_master.sh completes, pause the training
# fill, run (a) the 1-UE supplementary evals the DoubleTDL skip left
# out (reference convention: 1-UE slices evaluate on TDL-B100,
# reference evaluate.py:174-180), (b) bench.py with the dense-LS prep
# path, (c) the lean fused-iteration w_blk {128,192,256} A/B at 24 MB
# scoped vmem, (d) the whole-grid (halo-free) kernel at 64 MB scoped
# vmem, then restart the training fill to the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_perf.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== perf window v4 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

while ! grep -q "master complete" logs/round4_master.log 2>/dev/null; do
  sleep 120
done
sleep 60
echo "=== master done $(date -u '+%F %H:%M:%S')" >> "$LOG"

if [ -f run/train.pid ]; then
  pid=$(cat run/train.pid)
  echo "=== pausing training fill (pid $pid)" >> "$LOG"
  kill "$pid" 2>/dev/null
  for i in $(seq 1 12); do
    kill -0 "$pid" 2>/dev/null || break
    sleep 10
  done
  kill -9 "$pid" 2>/dev/null
  rm -f run/train.pid
fi
sleep 45

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 600)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

REFW=/root/reference/weights

# 1-UE supplements (skipped by the DoubleTDL guard in the main queue)
run 900 python scripts/evaluate_all.py --config nrx_large_qpsk \
    --num-tx 1 --systems nrx --channel TDL-B100 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr -2 -1 0 1 2 --ref-weights $REFW/nrx_large_qpsk_weights \
    --budget-s 750
run 1100 python scripts/evaluate_all.py --config nrx_large_var_mcs \
    --num-tx 1 --systems nrx --mcs-idx 0 1 --channel TDL-B100 \
    --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --snr -2 -1 0 1 2 3 4 \
    --ref-weights $REFW/nrx_large_var_mcs_weights --budget-s 950

# perf benches
run 800 python bench.py
run 1800 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=24576 \
    python scripts/bench_fused_iter.py --lean --wblk 128 192 256 --b16
run 2600 env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 NRX_STACK_WHOLE_MB=24 \
    python scripts/bench_fused_iter.py --lean --wblk 4096 --b16

now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  echo "=== restart training fill for ${left}s" >> "$LOG"
  sleep 30
  PYTHONUNBUFFERED=1 nohup env NRX_SEPCONV_FOLDED=1 timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4b.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== perf window v4 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
