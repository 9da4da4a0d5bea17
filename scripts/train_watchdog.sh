#!/bin/bash
# Kills a train_long.py process whose training log has gone silent
# (observed axon-tunnel wedge: process sleeps forever on a device RPC,
# steady-state chunks otherwise log every few seconds). The queue's
# outer `timeout`+sleep then moves on; at most 5k iters (last
# checkpoint) are lost. Checks every 60 s; threshold 360 s.
set -u
cd "$(dirname "$0")/.."
THRESH=${1:-360}
while true; do
  sleep 60
  pid=$(pgrep -f "python scripts/train_long.py" | head -1) || true
  [ -z "${pid:-}" ] && continue
  cfg=$(tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null |
        sed -n 's/.*--config \([a-zA-Z0-9_]*\).*/\1/p')
  [ -z "$cfg" ] && continue
  now=$(date +%s)
  started=$(stat -c %Y "/proc/$pid" 2>/dev/null || echo "$now")
  age=$((now - started))
  log="logs/${cfg}.jsonl"
  if [ ! -f "$log" ] || [ "$(stat -c %Y "$log")" -lt "$started" ]; then
    # no chunk ever logged by THIS process: init/compile hang if old
    if [ "$age" -gt 1500 ]; then
      echo "$(date -u '+%F %H:%M:%S') watchdog: killing train_long" \
           "pid $pid (cfg $cfg, no log after ${age}s)" >> logs/watchdog.log
      kill "$pid" 2>/dev/null; sleep 20; kill -9 "$pid" 2>/dev/null || true
    fi
    continue
  fi
  mt=$(stat -c %Y "$log")
  silent=$((now - mt))
  # only consider processes old enough to be past compile
  if [ "$age" -gt 600 ] && [ "$silent" -gt "$THRESH" ]; then
    echo "$(date -u '+%F %H:%M:%S') watchdog: killing train_long pid $pid" \
         "(cfg $cfg, log silent ${silent}s)" >> logs/watchdog.log
    kill "$pid" 2>/dev/null
    sleep 20
    kill -9 "$pid" 2>/dev/null || true
  fi
done
