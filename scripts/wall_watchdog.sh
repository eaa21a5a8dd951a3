#!/bin/bash
# Round-end watchdog: at DEADLINE (UTC HH:MM), stop the chip queue tree
# so the driver's end-of-round bench.py run gets a quiet TPU (a
# training/eval process still holding the tunnel would corrupt BENCH_rNN).
# Kills by explicit pid tree walk (never by pattern), queue bash first so
# no further steps launch, then its descendants.
#
# DEADLINE is converted to epoch seconds with day rollover: an HH:MM
# earlier than now means "tomorrow". (The original HH:MM STRING compare
# fired instantly for any deadline across midnight — it killed the r4e
# queue 18 minutes into stage-1 bank rendering.)
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-13:58}
ROOT_PID=${2:?root pid required}

NOW=$(date -u +%s)
TARGET=$(date -u -d "today ${DEADLINE}" +%s)
if [ "$TARGET" -le "$NOW" ]; then
  TARGET=$((TARGET + 86400))
fi
echo "wall_watchdog: armed for $(date -u -d "@$TARGET" +%F\ %H:%M:%S) UTC" \
  "(in $(( (TARGET - NOW) / 60 )) min), watching pid $ROOT_PID"

while [ "$(date -u +%s)" -lt "$TARGET" ]; do
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
  for f in /tmp/q4_*.log /tmp/q4e_*.log; do
    [ -e "$f" ] || continue
    cp "$f" "evidence/$(basename "$f")" 2>/dev/null
  done
  git add evidence/q4*.log 2>/dev/null
  git commit -q -m "Record partial queue logs at wall deadline" \
    -- evidence/ || true
fi
