#!/bin/bash
# Round-3 (resumed session) chip window A. The earlier round-3 session
# built the MXU separable-conv lowerings and the mixed-MCS eval path
# but its chip windows never ran (container reset). This window:
#   1. compile-smokes every pallas kernel at deployed shape
#   2. A/Bs the TRAINING step (grouped vs MXU-folded convs) — decides
#      the lowering for the long nrx_rt segments
#   3. A/Bs the fused-iteration serving kernel (w_blk x conv_mxu)
#   4. component breakdown for the latency attack
# then relaunches nrx_rt training (segment r3f) with the winning
# lowering + the PID watchdog so the chip never idles.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round3c_windowA.log
mkdir -p logs run
echo "=== windowA start $(date -u '+%F %H:%M:%S')" >> "$LOG"

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

run 900 python scripts/tpu_compile_smoke.py
run 800 python scripts/bench_train_step.py --chunks 5
run 800 python scripts/bench_train_step.py --chunks 5 --folded
run 2000 python scripts/bench_fused_iter.py --wblk 128 256 384 --b16
run 600 python scripts/bench_components.py

# pick the training lowering from the A/B
G=$(grep -oP 'folded=False: \K[0-9.]+' "$LOG" | tail -1)
F=$(grep -oP 'folded=True: \K[0-9.]+' "$LOG" | tail -1)
ENVV=""
if [ -n "${F:-}" ] && [ -n "${G:-}" ] && \
   awk "BEGIN{exit !($F > $G)}"; then
  ENVV="NRX_SEPCONV_FOLDED=1"
fi
echo "=== train A/B grouped=${G:-?} folded=${F:-?} -> '$ENVV'" >> "$LOG"

echo "=== windowA benches done; launching training $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 30
PYTHONUNBUFFERED=1 env $ENVV nohup timeout 6200 python scripts/train_long.py \
    --config nrx_rt --seconds 6000 --start-step 1725600 \
    > logs/nrx_rt_seg_r3f.log 2>&1 &
echo $! > run/train.pid
nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
    > /dev/null 2>&1 &
echo "=== windowA complete, training seg r3f pid $(cat run/train.pid)" >> "$LOG"
