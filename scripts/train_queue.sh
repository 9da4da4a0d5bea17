#!/bin/bash
# Sequential single-chip training queue (axon tunnel is single-client):
# cross-MCS configs warm-started from the 1.7M-iteration nrx_rt backbone,
# the pilotless e2e config from scratch, then nrx_rt continuation.
# Each segment checkpoints every 5k iters and exits cleanly on its own
# --seconds budget; the outer `timeout` only guards against hangs.
# Quick bounded BLER evals run between segments and append to
# results/trained_progress.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=logs/queue.log
NRX_RT=weights/nrx_rt_weights.pkl

run() {
  local t="$1"; shift
  echo "=== $(date -u '+%F %H:%M:%S') [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit $? at $(date -u '+%F %H:%M:%S')" >> "$LOG"
  sleep 75   # let the axon tunnel release before the next client
}

# 1) QPSK (MCS 9): backbone transfers, only the 2-bit LLR head re-inits
run 6600 python scripts/train_long.py --config nrx_rt_qpsk --seconds 5400 \
    --warm-start-from "$NRX_RT" --warm-start-partial
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt_qpsk --snr 2 3
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt_qpsk \
    --num-tx 1 --channel TDL-B100 --snr 0 1

# 2) 64QAM (MCS 19): 6-bit LLR head re-inits
run 6600 python scripts/train_long.py --config nrx_rt_64qam --seconds 5400 \
    --warm-start-from "$NRX_RT" --warm-start-partial
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt_64qam --snr 8 10

# 3) var-MCS [9,14], per-MCS IO mode: both heads re-init, backbone transfers
run 8400 python scripts/train_long.py --config nrx_rt_var_mcs --seconds 7200 \
    --warm-start-from "$NRX_RT" --warm-start-partial
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt_var_mcs \
    --mcs 0 --snr 1 2
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt_var_mcs \
    --mcs 1 --snr 3 4

# 4) pilotless e2e (trainable constellation, 1 UE, TDL-C300): from scratch;
#    phase 0 (3e5 iters) trains the TX constellation jointly
run 8400 python scripts/train_long.py --config e2e_rt --seconds 7200
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config e2e_rt --snr 2 3

# 5) nrx_rt continuation with the remaining window
run 6600 python scripts/train_long.py --config nrx_rt --seconds 5400
run 1500 python scripts/eval_trained_quick.py --fast-ldpc --config nrx_rt --snr 3 4

echo "QUEUE DONE $(date -u '+%F %H:%M:%S')" >> "$LOG"
