#!/bin/bash
# Round-4 master chip queue: fused-train A/B, var_mcs imported-weight
# re-measure, depth d7/d8, mixed-MCS mixed half, then the 11 missing
# results-matrix pickles (imported reference weights, SNR grids trimmed
# to the reference curves' waterfall regions), nrx_large own warm-start
# training, reduced site sweep, masking depth sweep, and an nrx_rt
# training fill to the deadline. ONE chip client at a time; per-item
# timeout + deadline gate (VERDICT r3 items 1-8).
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_master.log
mkdir -p logs run
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== r4 master armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

# chip probe gate (the axon runtime wedged once mid-round-3): retry
# until a trivial device op completes
probe() {
  while true; do
    timeout 120 python - <<'EOF' >/dev/null 2>&1 && return 0
import jax, jax.numpy as jnp
import numpy as np
np.asarray((jnp.ones((8, 8)) * 2).sum())
EOF
    echo "=== probe failed $(date -u '+%F %H:%M:%S'); retry in 180s" >> "$LOG"
    sleep 180
  done
}
probe
echo "=== chip up $(date -u '+%F %H:%M:%S')" >> "$LOG"

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

# ---- A: A/Bs + quick wins -------------------------------------------
# A1/A2: custom-VJP fused training sepconv step A/B (ship or delete)
run 700 python scripts/bench_train_step.py --folded --chunks 3
run 700 python scripts/bench_train_step.py --fused-train --chunks 3

# A3: var_mcs imported reference weights, both heads (kills the +1.28
# dB worst row; compares as nrx_rt_var_mcs_ref)
run 1400 python scripts/evaluate_all.py --config nrx_rt_var_mcs \
    --num-tx 2 --systems nrx --mcs-idx 0 1 --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr -1 0 1 2 3 4 5 --ref-weights $REFW/nrx_rt_var_mcs_weights \
    --results-name nrx_rt_var_mcs_ref --budget-s 1200

# A4: depth sweep d7/d8 on chip (replace the extrapolation)
run 1100 python scripts/bench_depth.py --variant fiter --depths 7 8

# A5: mixed-MCS mixed-assignment half (completes the two-dict pickle)
run 1800 python scripts/eval_mixed_mcs.py \
    --ref-weights $REFW/nrx_rt_var_mcs_weights --target-errors 200 \
    --budget-s 1600

# ---- B: e2e + nrx_large matrix fills --------------------------------
run 1000 python scripts/evaluate_all.py --config e2e_large --num-tx 1 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --snr -1 0 1 2 3 4 \
    --ref-weights $REFW/e2e_large_weights --budget-s 800

run 1800 python scripts/evaluate_all.py --config e2e_baseline --num-tx 1 \
    --systems nrx baseline_lslin_lmmse baseline_lmmse_kbest \
    baseline_perf_csi_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr -1 0 1 2 3 4 5 6 --ref-weights $REFW/e2e_baseline_weights \
    --budget-s 1600

run 1600 python scripts/evaluate_all.py --config nrx_large_qpsk \
    --num-tx 1 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr -2 -1 0 1 2 3 4 --ref-weights $REFW/nrx_large_qpsk_weights \
    --budget-s 1400

run 2000 python scripts/evaluate_all.py --config nrx_large_var_mcs \
    --num-tx 1 2 --systems nrx --mcs-idx 0 1 --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr -2 -1 0 1 2 3 4 5 \
    --ref-weights $REFW/nrx_large_var_mcs_weights --budget-s 1800

run 1300 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr 4 5 6 7 8 9 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 1100

run 2000 python scripts/evaluate_all.py --config nrx_large_64qam \
    --num-tx 2 --systems baseline_lslin_lmmse baseline_lmmse_kbest \
    baseline_perf_csi_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 5e-4 \
    --snr 3 4 5 6 7 8 9 --ref-weights $REFW/nrx_large_64qam_weights \
    --budget-s 1800

# masking model: 3 NRX heads (QPSK/16QAM at low SNR, 64QAM higher)
run 1800 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 --systems nrx \
    --mcs-idx 0 1 --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --snr -1 0 1 2 3 4 5 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1600
run 1300 python scripts/evaluate_all.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 --systems nrx \
    --mcs-idx 2 --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 5e-4 --snr 4 5 6 7 8 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --budget-s 1100

# ---- C: site-specific family (own CIR dataset; documented as not
# dataset-comparable to the reference's Munich ray trace) -------------
run 1600 python scripts/evaluate_all.py --config nrx_site_specific \
    --num-tx 1 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 \
    --snr -1 2 5 8 11 14 17 20 \
    --ref-weights $REFW/nrx_site_specific_weights --budget-s 1400

run 1100 python scripts/evaluate_all.py --config nrx_site_specific_large \
    --num-tx 2 --systems nrx --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 \
    --snr 3 6 9 12 15 18 \
    --ref-weights $REFW/nrx_site_specific_large_weights --budget-s 900

run 2200 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline --num-tx 1 2 \
    --systems nrx baseline_lslin_lmmse baseline_lmmse_kbest \
    baseline_perf_csi_kbest --fast-ldpc --max-iter 400 \
    --target-block-errors 200 --target-bler 2e-3 \
    --snr 0 3 6 9 12 15 \
    --ref-weights $REFW/nrx_site_specific_baseline_weights \
    --budget-s 2000

run 1100 python scripts/evaluate_all.py \
    --config nrx_site_specific_baseline_large --num-tx 1 2 \
    --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
    --target-bler 2e-3 --snr 0 3 6 9 12 15 \
    --ref-weights $REFW/nrx_site_specific_baseline_large_weights \
    --budget-s 900

# ---- D: nrx_large own training (warm-start from nrx_rt backbone) ----
if [ ! -f run/skip_nrx_large_train ]; then
  run 3200 env NRX_SEPCONV_FOLDED=1 python scripts/train_long.py \
      --config nrx_large --seconds 3000 \
      --warm-start-from weights/nrx_rt_ema_weights.pkl \
      --warm-start-partial
  run 1200 python scripts/evaluate_all.py --config nrx_large --num-tx 2 \
      --systems nrx --fast-ldpc --max-iter 400 --target-block-errors 200 \
      --target-bler 5e-4 --snr 2 3 4 5 6 \
      --weights weights/nrx_large_ema_weights.pkl \
      --results-name nrx_large_own --budget-s 1000
fi

# ---- E: reduced site fine-tune sweep (honest subset) ----------------
run 2600 python scripts/site_sweep.py --budget-s 2400

# ---- F: masking depth sweep (reduced depth set, shared grid) --------
run 3400 python scripts/eval_sweep.py \
    --config nrx_large_var_mcs_64qam_masking --num-tx 2 --mcs-idx 0 1 \
    --num-it 1 2 3 4 6 8 --snr -1 0 1 2 3 4 5 --max-iter 300 \
    --target-errors 200 --target-bler 1e-3 \
    --ref-weights $REFW/nrx_large_var_mcs_64qam_masking_weights \
    --out results/nrx_large_var_mcs_masking_sweep_results.pkl \
    --budget-s 3200

# ---- G: nrx_rt training fill to the deadline ------------------------
now=$(date -u +%s)
left=$((DEADLINE - now - 120))
if [ "$left" -gt 600 ]; then
  TRAIN_ENV="NRX_SEPCONV_FOLDED=1"
  [ -f run/train_env ] && TRAIN_ENV=$(cat run/train_env)
  echo "=== training fill r4 for ${left}s ($TRAIN_ENV)" >> "$LOG"
  sleep 30
  # --start-step keeps the schedule phase truthful: the 2.179M-iter
  # ckpt was lost to the (now-fixed) smoke-clobber; auto warm start
  # from the committed weights rebuilds it
  PYTHONUNBUFFERED=1 nohup env $TRAIN_ENV timeout $((left)) \
      python scripts/train_long.py --config nrx_rt \
      --start-step 2179300 \
      --seconds $((left - 150)) > logs/nrx_rt_seg_r4a.log 2>&1 &
  echo $! > run/train.pid
  nohup bash scripts/watchdog_pid.sh run/train.pid nrx_rt 420 \
      > /dev/null 2>&1 &
fi
echo "=== master complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
