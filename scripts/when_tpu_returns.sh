#!/bin/bash
# Probes the axon tunnel every 10 min; when it answers, runs the
# remaining round-1 TPU work (bounded), then exits. A hard deadline
# (UTC epoch, arg 1) guarantees the chip is free for the driver's
# round-end bench regardless of when the tunnel recovers.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?usage: when_tpu_returns.sh <deadline-epoch>}
LOG=logs/tpu_recovery.log

probe() {
  timeout 90 python -c "
import numpy as np, jax, jax.numpy as jnp
np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1)))
print('ok')" 2>/dev/null | grep -q ok
}

run() {
  local t="$1"; shift
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -le 0 ] && return 1
  [ "$t" -gt "$left" ] && t="$left"   # never run past the deadline
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then
    echo "TUNNEL BACK $(date -u '+%F %H:%M:%S')" >> "$LOG"
    sleep 75
    # 1) honest latency numbers + parity anchors (most valuable, first)
    run 4200 bash scripts/round_end_bench.sh
    # 2) e2e pilotless training, capped to leave driver headroom
    left=$(( DEADLINE - $(date +%s) - 900 ))
    if [ "$left" -gt 1200 ]; then
      run $(( left + 600 )) python scripts/train_long.py --config e2e_rt \
          --seconds "$left"
      run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
          --config e2e_rt --snr 2 3
    fi
    echo "RECOVERY WORK DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
    exit 0
  fi
  sleep 600
done
echo "deadline reached without tunnel recovery" >> "$LOG"
