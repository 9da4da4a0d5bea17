#!/bin/bash
# Wedge watchdog for the round-5b segment-2 training run: the axon
# client can wedge forever inside a device RPC (observed 08:12 — log
# silent, 0.9% CPU, tunnel itself healthy for fresh clients). If
# logs/nrx_rt.jsonl goes silent >420 s while a train_long process is
# alive, kill that EXACT pid (verified via /proc cmdline — never a
# pattern kill). Checkpoints save per chunk, so a kill loses <1 min.
set -u
cd "$(dirname "$0")/.."
LOG=logs/nrx_rt.jsonl
WLOG=logs/watchdog.log
while [ ! -f run/master2_done ]; do
  sleep 60
  pid=""
  for p in $(ps -eo pid= -o comm= | awk '$2=="python"{print $1}'); do
    if grep -qa "train_long" "/proc/$p/cmdline" 2>/dev/null; then
      pid="$p"; break
    fi
  done
  [ -z "$pid" ] && continue
  [ -f "$LOG" ] || continue
  started=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
  now=$(date +%s)
  silent=$((now - $(stat -c %Y "$LOG")))
  age=$((now - started))
  if [ "$age" -gt 900 ] && [ "$silent" -gt 420 ]; then
    echo "$(date -u '+%F %H:%M:%S') r5b watchdog: killing wedged train_long pid $pid (log silent ${silent}s)" >> "$WLOG"
    kill "$pid" 2>/dev/null; sleep 15; kill -9 "$pid" 2>/dev/null
  fi
done
