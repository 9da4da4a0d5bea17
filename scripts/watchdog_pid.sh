#!/bin/bash
# PID-file-based watchdog for a single train_long.py segment.
# Usage: watchdog_pid.sh <pidfile> <config> [silence_threshold_s]
# Kills the EXACT pid in the pidfile if its training log goes silent
# (axon-tunnel wedge signature: steady-state chunks log every few
# seconds, a wedged client sleeps forever on a device RPC). Exits when
# the pid is gone.
set -u
cd "$(dirname "$0")/.."
PIDFILE="$1"; CFG="$2"; THRESH=${3:-420}
LOG="logs/${CFG}.jsonl"
while true; do
  sleep 60
  [ -f "$PIDFILE" ] || exit 0
  pid=$(cat "$PIDFILE")
  kill -0 "$pid" 2>/dev/null || { rm -f "$PIDFILE"; exit 0; }
  now=$(date +%s)
  started=$(stat -c %Y "/proc/$pid" 2>/dev/null || echo "$now")
  age=$((now - started))
  if [ ! -f "$LOG" ] || [ "$(stat -c %Y "$LOG")" -lt "$started" ]; then
    # no chunk logged by THIS process yet: allow compile time
    if [ "$age" -gt 1800 ]; then
      echo "$(date -u '+%F %H:%M:%S') watchdog_pid: kill $pid ($CFG, no log after ${age}s)" >> logs/watchdog.log
      kill "$pid" 2>/dev/null; sleep 20; kill -9 "$pid" 2>/dev/null
      rm -f "$PIDFILE"; exit 0
    fi
    continue
  fi
  silent=$((now - $(stat -c %Y "$LOG")))
  if [ "$age" -gt 600 ] && [ "$silent" -gt "$THRESH" ]; then
    echo "$(date -u '+%F %H:%M:%S') watchdog_pid: kill $pid ($CFG, log silent ${silent}s)" >> logs/watchdog.log
    kill "$pid" 2>/dev/null; sleep 20; kill -9 "$pid" 2>/dev/null
    rm -f "$PIDFILE"; exit 0
  fi
done
