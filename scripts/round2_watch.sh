#!/bin/bash
# Round-2 TPU watcher. Probes the axon tunnel; on recovery:
#   1) python bench.py immediately (headline latency — code-independent,
#      highest-value single artifact; VERDICT item 1)
#   2) wait (<=90 min) for logs/ROUND2_READY — the flag the interactive
#      session touches once the 38.212 LDPC table swap + tests are green,
#      so parity anchors / training run against spec-exact code
#   3) fused-conv A/B, rest of the measurement pass, then the training
#      queue, every step bounded by the hard DEADLINE so the chip is
#      free for the driver's round-end bench.
# Single TPU client at a time: nothing else may touch the chip while
# this runs. Kill by exact PID only.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?usage: round2_watch.sh <deadline-epoch>}
LOG=logs/round2_watch.log
mkdir -p logs

probe() {
  timeout 90 python -c "
import numpy as np, jax, jax.numpy as jnp
np.asarray(jax.jit(lambda x: x + 1.0)(jnp.float32(1)))
print('ok')" 2>/dev/null | grep -q ok
}

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  local t="$1"; shift
  local l; l=$(left)
  [ "$l" -le 120 ] && return 1
  [ "$t" -gt "$l" ] && t="$l"
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75   # let the tunnel release before the next client
}

while [ "$(left)" -gt 300 ]; do
  if probe; then
    echo "TUNNEL BACK $(date -u '+%F %H:%M:%S')" >> "$LOG"
    sleep 75
    # --- 1) headline bench, before anything else ---
    run 2400 python bench.py
    # persist the honest number where the session can read it
    tail -40 "$LOG" | grep -o '{"metric".*}' | tail -1 > logs/bench_r2_first.json || true

    # --- 2) wait for the code-ready flag (max 90 min) ---
    W=0
    while [ ! -f logs/ROUND2_READY ] && [ "$W" -lt 5400 ] \
          && [ "$(left)" -gt 1800 ]; do
      sleep 120; W=$(( W + 120 ))
    done
    echo "READY-WAIT done (waited ${W}s; flag $( [ -f logs/ROUND2_READY ] && echo present || echo ABSENT ))" >> "$LOG"

    # --- 3) fused sepconv A/B (VERDICT item 6) + LDPC tile A/B ---
    run 2700 python scripts/bench_fused_convs.py
    run 1800 python scripts/bench_ldpc_tile.py

    # --- 4) rest of measurement pass: depth table, K-Best profile,
    #        1-UE qpsk anchor, imported nrx_large / e2e_rt parity ---
    run 2400 python scripts/bench_depth.py --depths 1 2 4 8
    run 1800 python scripts/profile_eval.py --systems kbest perf_csi_kbest --steps 3
    run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
        --config nrx_rt_qpsk --num-tx 1 --channel TDL-B100 --snr 0 1
    run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
        --config nrx_large --target-errors 200 \
        --ref-weights /root/reference/weights/nrx_large_weights --snr 2 3
    run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
        --config e2e_rt --target-errors 200 \
        --ref-weights /root/reference/weights/e2e_rt_weights --snr 2 3

    # --- 5) training queue (time-boxed) ---
    # e2e pilotless from scratch (never trained; flagship capability)
    if [ "$(left)" -gt 4500 ]; then
      T=$(( $(left) > 12000 ? 7200 : $(left) - 3600 ))
      run $(( T + 900 )) python scripts/train_long.py --config e2e_rt --seconds "$T"
      run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config e2e_rt --snr 2 3
    fi
    # var-MCS continuation
    if [ "$(left)" -gt 4500 ]; then
      T=$(( $(left) > 10000 ? 5400 : $(left) - 3600 ))
      run $(( T + 900 )) python scripts/train_long.py --config nrx_rt_var_mcs --seconds "$T"
      run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
          --config nrx_rt_var_mcs --mcs 0 --snr 1 2
      run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
          --config nrx_rt_var_mcs --mcs 1 --snr 3 4
    fi
    # site-specific fine-tune continuation + eval (VERDICT item 8)
    if [ "$(left)" -gt 5400 ]; then
      run 2700 python scripts/train_long.py --config nrx_site_specific_100k \
          --seconds 1800
      run 1800 python scripts/eval_trained_quick.py --fast-ldpc \
          --config nrx_site_specific_100k --snr 8 10 12 14
    fi
    # nrx_rt continuation with whatever is left (keep 25 min margin)
    while [ "$(left)" -gt 3000 ]; do
      T=$(( $(left) - 2400 ))
      [ "$T" -gt 5400 ] && T=5400
      run $(( T + 900 )) python scripts/train_long.py --config nrx_rt --seconds "$T"
      run 1200 python scripts/eval_trained_quick.py --fast-ldpc --snr 3 4
    done
    echo "ROUND2 QUEUE DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
    exit 0
  fi
  sleep 300
done
echo "deadline reached without tunnel recovery" >> "$LOG"
