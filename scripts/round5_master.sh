#!/bin/bash
# Round-5 master chip queue (VERDICT r4 items):
#   0. build offline AOT engine artifacts (local topology client, no
#      chip needed — must run BEFORE any chip client to avoid the
#      libtpu lockfile collision)
#   1. probe gate, then on-chip pre-checks: complex LMMSE solve,
#      h_hat bench validation (safe engine)
#   2. eval window: 64-QAM K-Best re-measures with the exact full-band
#      interpolator (VERDICT #4) + nan-cell top-ups (VERDICT #6)
#   3. nrx_rt training segments to the deadline (VERDICT #1)
#   4. perf tail: engine-artifact load test + mega/whole-grid A/B +
#      final bench rehearsal (VERDICT #2/#3/#5)
# ONE chip client at a time; per-item timeout + deadline gate.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5_master.log
mkdir -p logs run deploy_out
DEADLINE=$(date -u -d '2026-08-21 15:30' +%s)
TRAIN_END=$(date -u -d '2026-08-21 14:35' +%s)
echo "=== r5 master armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 300)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 20
}

probe() {
  while true; do
    rm -f /tmp/libtpu_lockfile
    timeout 240 python - <<'EOF' >/dev/null 2>&1 && return 0
import jax, jax.numpy as jnp
import numpy as np
np.asarray((jnp.ones((8, 8)) * 2).sum())
EOF
    echo "=== probe failed $(date -u '+%F %H:%M:%S'); retry in 120s" >> "$LOG"
    sleep 120
  done
}

REFW=/root/reference/weights

# ---- 0: offline AOT engine artifacts (local, chip-free) -------------
# a dead topology client leaves a stale libtpu lockfile; clear before
# each build (NOTES_ROUND5 gotcha)
rm -f /tmp/libtpu_lockfile
export NRX_AOT_SKIP_EXISTING=1
run 2400 python scripts/offline_aot_engine.py wholegrid
rm -f /tmp/libtpu_lockfile
export NRX_AOT_SKIP_EXISTING=1
run 2400 python scripts/offline_aot_engine.py mega
rm -f /tmp/libtpu_lockfile
export NRX_AOT_SKIP_EXISTING=1
run 1800 python scripts/offline_aot_engine.py w192

# ---- 1: chip gate + pre-checks --------------------------------------
probe
echo "=== chip up $(date -u '+%F %H:%M:%S')" >> "$LOG"

# complex [792,792] LMMSE solve on chip (the exact interpolator's only
# new primitive; fail -> eval window falls back to banked weights via
# config override)
run 600 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
a = rng.normal(size=(792, 792)) + 1j * rng.normal(size=(792, 792))
cov = (a @ a.conj().T / 792).astype(np.complex64)
rao = cov[:, ::2]
def f(nv):
    m = jnp.asarray(cov) + nv.astype(jnp.complex64) * jnp.eye(792, dtype=jnp.complex64)
    w = jnp.linalg.solve(m.T, jnp.asarray(rao[::1]).T).T
    return jnp.mean(jnp.abs(w))
print("complex solve on chip:", float(jax.jit(f)(jnp.float32(0.05))))
EOF

# h_hat engine validation: safe engine only (fast); full best-engine
# bench runs in the perf tail
run 1500 env NRX_BENCH_NO_BEST=1 python bench.py

# ---- 2: eval window -------------------------------------------------
# 64-QAM K-Best with exact full-band LMMSE (VERDICT #4; was +0.27/+0.84)
run 2600 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_lmmse_kbest --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 4 5 6 7 8 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 2400

# masking K-Best mcs0 re-measure with exact interpolator (+0.33/+0.46)
run 2000 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 0 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 1 2 3 4 5 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1800

# nan top-ups (VERDICT #6): masking K-Best 2/2 deep point, masking
# LS/lin 2/1 tail (also fixes the non-monotone 6 dB point)
run 2000 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 2 --fast-ldpc \
    --max-iter 500 --target-block-errors 200 --target-bler 1e-3 \
    --snr 8 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1800
run 1400 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lslin_lmmse --mcs-idx 1 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 6 7 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1200

# site-family nan top-ups (capability rows; finer SNR near 1e-2)
run 1200 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 1 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 9 10 \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 1000
run 1600 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline --num-tx 1 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 10 11 \
    --ref-weights $REFW/nrx_site_specific_baseline_weights \
    --budget-s 1400
run 2000 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline --num-tx 2 \
    --systems baseline_lmmse_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 9 12 15 \
    --ref-weights $REFW/nrx_site_specific_baseline_weights \
    --budget-s 1800

run 400 python scripts/compare_results.py
touch run/evals_done

# ---- 3: nrx_rt training segments to TRAIN_END -----------------------
while true; do
  now=$(date -u +%s)
  left=$((TRAIN_END - now))
  if [ "$left" -lt 1500 ]; then break; fi
  seg=$((left > 9600 ? 9000 : left - 500))
  run $((seg + 500)) python scripts/train_long.py --config nrx_rt \
      --seconds "$seg"
  git add -f weights/nrx_rt_weights.pkl weights/nrx_rt_ema.pkl \
      weights/nrx_rt_ckpt.pkl 2>> "$LOG"
  git commit -q -m "nrx_rt training segment (round 5)" >> "$LOG" 2>&1
done
touch run/training_done

# ---- 4: perf tail ---------------------------------------------------
# engine-artifact load + full bench (best engine; uses the cached
# artifacts from phase 0 if the runtime accepts them)
run 2400 python bench.py
run 500 python scripts/eval_trained_quick.py --config nrx_rt \
    --weights weights/nrx_rt_ema.pkl --snr 4 --max-iter 60 || true
echo "=== r5 master done $(date -u '+%F %H:%M:%S')" >> "$LOG"
touch run/master_done
