#!/bin/bash
# Round-5b restructured continuation (replaces the killed master's
# phase-3 tail): the first 6600 s nrx_rt segment (PID watched below)
# finishes naturally, then
#   1. commit its weights
#   2. mega-b1 on-chip compile + A/B + chip-artifact serialization
#   3. one more nrx_rt segment to ~11:22 + commit
#   4. masking K-Best mcs0 @ 0 dB exact-interpolator re-measure
#   5. whole-grid artifact cold-load check
#   6. eval_trained_quick progress point + compare_results
# ONE chip client at a time; deadline guard before every item.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5b_master2.log
DEADLINE=$(date -u -d '2026-08-21 12:02' +%s)
TRAIN2_END=$(date -u -d '2026-08-21 11:22' +%s)
WATCH_PID="${1:-3263}"
echo "=== r5b master2 armed $(date -u '+%F %H:%M:%S') watching pid $WATCH_PID" >> "$LOG"

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 120)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return 1
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- exit $rc at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 15
  return $rc
}

commit_weights() {
  git add -f weights/nrx_rt_weights.pkl weights/nrx_rt_ema.pkl \
      weights/nrx_rt_ckpt.pkl 2>> "$LOG"
  git commit -q -m "$1" >> "$LOG" 2>&1
}

# ---- 1: wait for the in-flight training segment, commit ------------
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 30; done
echo "=== segment 1 finished $(date -u '+%F %H:%M:%S')" >> "$LOG"
sleep 10
commit_weights "nrx_rt training segment (round 5b, seg 1)"

# ---- 2: mega-b1 on-chip A/B (compiles + serializes chip artifact) --
run 1500 python scripts/bench_engines_ab.py --safe-ms 0.6606 \
    --engines mega

# ---- 3: second training segment to TRAIN2_END ----------------------
now=$(date -u +%s)
seg=$((TRAIN2_END - now - 200))
if [ "$seg" -gt 900 ]; then
  run $((seg + 400)) python scripts/train_long.py --config nrx_rt \
      --seconds "$seg"
  commit_weights "nrx_rt training segment (round 5b, seg 2)"
fi

# ---- 4: stale masking mcs0 low-SNR point (exact interpolator) ------
run 900 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 0 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-2 \
    --snr 0 \
    --ref-weights /root/reference/weights/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 780

# ---- 5: artifact cold-load check (fresh process) -------------------
run 300 python - <<'EOF'
import time, numpy as np
import jax, jax.numpy as jnp
from neural_rx_tpu.deploy.aot import load_compiled
import __graft_entry__ as g
_, (params, y1) = g.entry()
t0 = time.time()
exe = load_compiled("deploy_out/best_chain_b1_L100_"
                    "NRX_DEPLOY_WBLK_B1=4096-NRX_DEPLOY_MEGA=.npe")
t_load = time.time() - t0
t0 = time.time()
np.asarray(exe(y1))
t_first = time.time() - t0
print(f"wholegrid artifact: load {t_load:.1f}s, first run "
      f"{t_first:.1f}s (100-slot chain)")
EOF

# ---- 6: progress point + summary -----------------------------------
run 600 python scripts/eval_trained_quick.py --config nrx_rt \
    --weights weights/nrx_rt_ema.pkl --snr 4 --max-iter 80 || true
run 300 python scripts/compare_results.py
echo "=== r5b master2 done $(date -u '+%F %H:%M:%S')" >> "$LOG"
touch run/master2_done
