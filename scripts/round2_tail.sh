#!/bin/bash
# Round-2 tail queue (after the kernel-fix + A/B session): imported-
# weight parity anchors on the remaining configs, then time-boxed
# training. Single TPU client at a time; kill by exact PID only.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?usage: round2_tail.sh <deadline-epoch>}
LOG=logs/round2_tail.log
mkdir -p logs

left() { echo $(( DEADLINE - $(date +%s) )); }

run() {
  local t="$1"; shift
  local l; l=$(left)
  [ "$l" -le 120 ] && return 1
  [ "$t" -gt "$l" ] && t="$l"
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75
}

# --- imported-reference-weight parity anchors (fast-ldpc, 200 errors)
run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_rt_qpsk --num-tx 1 --channel TDL-B100 --snr 0 1
run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_large --target-errors 200 \
    --ref-weights /root/reference/weights/nrx_large_weights --snr 2 3
run 2400 python scripts/eval_trained_quick.py --fast-ldpc \
    --config e2e_rt --target-errors 200 \
    --ref-weights /root/reference/weights/e2e_rt_weights --snr 2 3

# --- training queue (time-boxed) ---
# e2e pilotless from scratch (never trained; flagship capability)
if [ "$(left)" -gt 4200 ]; then
  T=$(( $(left) - 3600 ))
  [ "$T" -gt 5400 ] && T=5400
  run $(( T + 900 )) python scripts/train_long.py --config e2e_rt \
      --seconds "$T"
  run 1200 python scripts/eval_trained_quick.py --fast-ldpc \
      --config e2e_rt --snr 2 3
fi
# var-MCS continuation
if [ "$(left)" -gt 3600 ]; then
  T=$(( $(left) - 2700 ))
  [ "$T" -gt 3600 ] && T=3600
  run $(( T + 900 )) python scripts/train_long.py \
      --config nrx_rt_var_mcs --seconds "$T"
  run 1200 python scripts/eval_trained_quick.py --fast-ldpc \
      --config nrx_rt_var_mcs --mcs 0 --snr 1 2
fi
# site-specific fine-tune + eval
if [ "$(left)" -gt 3600 ]; then
  run 2400 python scripts/train_long.py --config nrx_site_specific_100k \
      --seconds 1500
  run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
      --config nrx_site_specific_100k --snr 8 10 12 14
fi
# nrx_rt continuation with whatever is left (keep 20 min margin)
while [ "$(left)" -gt 2400 ]; do
  T=$(( $(left) - 1800 ))
  [ "$T" -gt 5400 ] && T=5400
  run $(( T + 600 )) python scripts/train_long.py --config nrx_rt \
      --seconds "$T"
  run 1000 python scripts/eval_trained_quick.py --fast-ldpc --snr 3 4
done
echo "ROUND2 TAIL DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
