#!/bin/bash
# Round-5 SECOND-SESSION chip queue. The first round-5 session's
# container died before its queue ran; artifacts (offline AOT engines,
# reconciled 2.315M ckpt) survived via git. This queue re-targets the
# VERDICT r4 items at this session's deadlines:
#   0. wait for the in-flight offline mega-b16 build (chip-free; must
#      finish before any chip client — libtpu lockfile collision)
#   1. probe gate + on-chip prechecks: complex LMMSE solve, FULL
#      bench.py (first live run of the artifact load path + h_hat
#      engine — VERDICT #2/#3)
#   2. eval window: 64-QAM K-Best re-measures with the exact full-band
#      interpolator (VERDICT #4) + nan-cell top-ups (VERDICT #6)
#   3. nrx_rt training segments to TRAIN_END (VERDICT #1), ckpt
#      committed each segment
#   4. tail: eval_trained_quick + compare_results
# ONE chip client at a time; per-item timeout + deadline gate.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round5b_master.log
mkdir -p logs run deploy_out
DEADLINE=$(date -u -d '2026-08-21 12:00' +%s)
TRAIN_END=$(date -u -d '2026-08-21 11:20' +%s)
echo "=== r5b master armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

run() {
  local t="$1"; shift
  local now; now=$(date -u +%s)
  if [ $((now + t + 240)) -gt "$DEADLINE" ]; then
    echo "=== deadline: skip $*" >> "$LOG"; return
  fi
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  PYTHONUNBUFFERED=1 timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 15
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

# ---- 0: wait for the offline mega-b16 topology build ----------------
for i in $(seq 1 100); do
  pgrep -f offline_aot_engine >/dev/null 2>&1 || break
  sleep 30
done
echo "=== offline build done/absent $(date -u '+%F %H:%M:%S')" >> "$LOG"
tail -5 logs/offline_mega_b16.log >> "$LOG" 2>/dev/null

# ---- 1: chip gate + prechecks ---------------------------------------
probe
echo "=== chip up $(date -u '+%F %H:%M:%S')" >> "$LOG"

# complex [792,792] LMMSE solve on chip (the exact interpolator's only
# new primitive; fail -> eval window falls back to banked weights)
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

# FULL bench: first live run of (a) the (llr,h_hat) engine scope and
# (b) the serialized-executable load path. If artifact load works the
# best-engine child finishes in ~3 min; if the runtime rejects the
# topology-compiled artifact it recompiles (~9 min) inside its own
# 1100 s timeout and re-serializes a chip-compiled artifact.
run 2000 python bench.py
cp -f logs/round5b_master.log logs/bench_precheck_snapshot.log 2>/dev/null

# ---- 2: eval window -------------------------------------------------
# 64-QAM K-Best with exact full-band LMMSE (VERDICT #4; was +0.27/+0.84)
run 2400 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_lmmse_kbest --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 4 5 6 7 8 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 2200

# masking K-Best mcs0 re-measure with exact interpolator (+0.33/+0.46)
run 1900 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 0 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 1 2 3 4 5 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1700

# nan top-ups (VERDICT #6): masking K-Best 2/2 deep point, masking
# LS/lin 2/1 tail (also fixes the non-monotone 6 dB point)
run 1700 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lmmse_kbest --mcs-idx 2 --fast-ldpc \
    --max-iter 500 --target-block-errors 200 --target-bler 1e-3 \
    --snr 8 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1500
run 1200 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 \
    --systems baseline_lslin_lmmse --mcs-idx 1 --fast-ldpc \
    --max-iter 400 --target-block-errors 200 --target-bler 5e-4 \
    --snr 6 7 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1000

# site-family nan top-ups (capability rows; finer SNR near 1e-2)
run 1000 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 1 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 9 10 \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 850
run 1200 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline --num-tx 1 \
    --systems baseline_lslin_lmmse --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 10 11 \
    --ref-weights $REFW/nrx_site_specific_baseline_weights \
    --budget-s 1050
run 1500 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline --num-tx 2 \
    --systems baseline_lmmse_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 --snr 9 12 15 \
    --ref-weights $REFW/nrx_site_specific_baseline_weights \
    --budget-s 1350

run 400 python scripts/compare_results.py
touch run/evals_done

# ---- 3: nrx_rt training segments to TRAIN_END -----------------------
while true; do
  now=$(date -u +%s)
  left=$((TRAIN_END - now))
  if [ "$left" -lt 1200 ]; then break; fi
  seg=$((left > 7200 ? 6600 : left - 400))
  run $((seg + 500)) python scripts/train_long.py --config nrx_rt \
      --seconds "$seg"
  git add -f weights/nrx_rt_weights.pkl weights/nrx_rt_ema.pkl \
      weights/nrx_rt_ckpt.pkl 2>> "$LOG"
  git commit -q -m "nrx_rt training segment (round 5b)" >> "$LOG" 2>&1
done
touch run/training_done

# ---- 4: tail --------------------------------------------------------
run 600 python scripts/eval_trained_quick.py --config nrx_rt \
    --weights weights/nrx_rt_ema.pkl --snr 4 --max-iter 80 || true
run 400 python scripts/compare_results.py
echo "=== r5b master done $(date -u '+%F %H:%M:%S')" >> "$LOG"
touch run/master_done
