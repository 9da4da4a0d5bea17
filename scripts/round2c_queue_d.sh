#!/bin/bash
# Round-2 continuation queue, part D: 64qam with the auto-tiled LDPC
# decoder (the tile=16 footprint OOM'd scoped vmem in that program),
# imported nrx_large, K-Best knees, site fine-tune, training remainder.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?usage: round2c_queue_d.sh <deadline-epoch>}
LOG=logs/round2c_queue.log
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

EA="python scripts/evaluate_all.py"

run 2400 $EA --config nrx_rt_64qam --num-tx 2 --systems nrx \
    --fast-ldpc --max-iter 1000 --target-block-errors 200 \
    --target-bler 1e-3
run 2400 $EA --config nrx_large --num-tx 2 --systems nrx \
    --ref-weights /root/reference/weights/nrx_large_weights \
    --results-name nrx_large_ref_results \
    --fast-ldpc --snr 0 1 2 3 4 5 --max-iter 300 \
    --target-block-errors 200 --target-bler 1e-3
run 2700 $EA --config nrx_rt --num-tx 2 \
    --systems baseline_lmmse_kbest baseline_perf_csi_kbest \
    --snr -2 -1 0 1 2 3 --fast-ldpc --max-iter 60 \
    --target-block-errors 100 --target-bler 3e-3
if [ "$(left)" -gt 3000 ]; then
  run 1500 python scripts/train_long.py --config nrx_site_specific_100k \
      --seconds 1200
  run 1200 python scripts/eval_trained_quick.py --fast-ldpc \
      --config nrx_site_specific_100k --snr 8 10 12 14
fi
while [ "$(left)" -gt 2100 ]; do
  T=$(( $(left) - 1700 ))
  [ "$T" -gt 5400 ] && T=5400
  run $(( T + 400 )) python scripts/train_long.py --config nrx_rt \
      --seconds "$T"
done
echo "ROUND2C QUEUE-D DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
