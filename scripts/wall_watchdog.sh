#!/bin/bash
# Round-end watchdog: at DEADLINE (UTC HH:MM), stop the round-4 chip
# queue tree so the driver's end-of-round bench.py run gets a quiet TPU
# (a training/eval process still holding the tunnel would corrupt
# BENCH_r04). Kills by explicit pid tree walk (never by pattern),
# queue bash first so no further steps launch, then its descendants.
# Partial in-flight step logs are copied into evidence/ and committed.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-13:58}
ROOT_PID=${2:-29232}

while [ "$(date -u +%H:%M)" \< "$DEADLINE" ]; do
  kill -0 "$ROOT_PID" 2>/dev/null || exit 0  # queue finished on its own
  sleep 20
done

descendants() {  # print all descendant pids of $1 (depth-first)
  local p
  for p in $(ps -o pid= --ppid "$1"); do
    descendants "$p"
    echo "$p"
  done
}

if kill -0 "$ROOT_PID" 2>/dev/null; then
  KIDS=$(descendants "$ROOT_PID")
  kill "$ROOT_PID" 2>/dev/null
  for p in $KIDS; do kill "$p" 2>/dev/null; done
  sleep 3
  for p in $KIDS; do kill -9 "$p" 2>/dev/null; done
  echo "wall_watchdog: killed queue tree at $(date -u +%H:%M:%S)" \
    > /tmp/wall_watchdog.log
  for f in /tmp/q4_*.log; do
    name=$(basename "$f")
    cp "$f" "evidence/$name" 2>/dev/null
  done
  git add evidence/q4_*.log 2>/dev/null
  git commit -q -m "Record partial round-4 queue logs at wall deadline" \
    -- evidence/ || true
fi
