#!/bin/bash
# Round-5b manual perf/eval tail. Run AFTER run/master_done exists
# (one chip client at a time). Hard deadline guard: nothing may hold
# the chip when the round-end driver bench starts.
#   1. masking K-Best mcs0 @ 0 dB with the exact interpolator (the
#      1e-1 crossing currently blends a stale chunked-interpolator
#      point measured before the round-5 fix)
#   2. artifact cold-load check: the chip-compiled whole-grid .npe
#      must load + run in seconds (VERDICT r4 next #3 "done" bar)
#   3. mega-b1 on-chip compile + A/B (serializes the chip-compiled
#      artifact for the driver bench's load-only mega alt) — only if
#      enough time remains
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5b_tail.log
DEADLINE=$(date -u -d '2026-08-21 12:02' +%s)
echo "=== r5b tail start $(date -u '+%F %H:%M:%S')" >> "$LOG"

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
  sleep 10
  return $rc
}

# 1: single stale point re-measure (fast: curve already compiled today)
run 900 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 0 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-2 \
    --snr 0 \
    --ref-weights /root/reference/weights/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 780

# 2: artifact cold-load check (fresh process; chip-compiled .npe)
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

# 3: mega-b1 compile + A/B + serialize (skipped if deadline near)
run 1500 python scripts/bench_engines_ab.py --safe-ms 0.6606 \
    --engines mega

run 300 python scripts/compare_results.py
echo "=== r5b tail done $(date -u '+%F %H:%M:%S')" >> "$LOG"
touch run/tail_done
