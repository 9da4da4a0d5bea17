#!/bin/bash
# Sequential single-chip training queue (axon tunnel is single-client).
# Round-1 ran qpsk/64qam (done: BLER 0.008@2dB / 0.013@8dB) and 65k of
# var_mcs before the tunnel died; this is the ROUND-2 restart queue:
# measurement pass first (cheap, highest value), then e2e pilotless
# (never trained), then var_mcs and nrx_rt continuations.
# Run `bash scripts/train_watchdog.sh &` alongside (kills a trainer
# whose log goes silent - the observed tunnel-wedge signature).
# Quick bounded BLER evals append to results/trained_progress.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=logs/queue.log

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75   # let the axon tunnel release before the next client
}

# 0) honest latency numbers + parity anchors (bench.py, depth table,
#    K-Best profile, imported nrx_large/e2e_rt anchors, 1-UE qpsk)
run 4800 bash scripts/round_end_bench.sh

# 1) pilotless e2e (trainable constellation, 1 UE, TDL-C300): from
#    scratch; phase 0 (3e5 iters) trains the TX constellation jointly
run 8400 python scripts/train_long.py --config e2e_rt --seconds 7200
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config e2e_rt \
    --snr 2 3

# 2) var-MCS continuation (65k done; per-MCS IO heads)
run 8400 python scripts/train_long.py --config nrx_rt_var_mcs --seconds 7200
run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_rt_var_mcs --mcs 0 --snr 1 2
run 1500 python scripts/eval_trained_quick.py --fast-ldpc \
    --config nrx_rt_var_mcs --mcs 1 --snr 3 4

# 3) nrx_rt continuation (1.724M done of the 10M schedule)
run 6600 python scripts/train_long.py --config nrx_rt --seconds 5400
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --snr 3 4

echo "QUEUE DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
