#!/bin/bash
# Round-4 perf window v5: replaces v4 (killed mid-run after its
# XLA_FLAGS legs aborted — the scoped-vmem flag is backend-only and
# must go through per-executable compiler_options, which
# bench_fused_iter/profiling now read from NRX_COMPILER_OPTS). Waits
# for v4's orphaned eval child to finish, runs the remaining A/B legs,
# then emits the "perf window v4 complete" marker fill5 waits for.
set -u
cd "$(dirname "$0")/.."
LOG=logs/round4_perf.log
DEADLINE=$(date -u -d '2026-08-21 00:55' +%s)
echo "=== perf window v5 armed $(date -u '+%F %H:%M:%S')" >> "$LOG"

# wait for any lingering evaluate_all/bench chip client to exit
while pgrep -f "scripts/evaluate_all.py" > /dev/null 2>&1; do
  sleep 60
done
sleep 45
echo "=== v5 chip clear $(date -u '+%F %H:%M:%S')" >> "$LOG"

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

run 1800 env NRX_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=24576 \
    python scripts/bench_fused_iter.py --lean --wblk 128 192 256 --b16
run 2600 env NRX_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=65536 \
    NRX_STACK_WHOLE_MB=24 \
    python scripts/bench_fused_iter.py --lean --wblk 4096 --b16

# fill5's trigger marker
echo "=== perf window v4 complete $(date -u '+%F %H:%M:%S')" >> "$LOG"
