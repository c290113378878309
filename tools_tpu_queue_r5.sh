#!/bin/bash
# Round-5 TPU queue. Single-client tunnel: run ONE phase at a time, nothing
# else on the TPU, and do NOT run pytest concurrently on this 1-core host
# (starves client heartbeats; recorded serialization rule, verify skill).
#
# Usage:
#   bash tools_tpu_queue_r5.sh measure [logdir]   # r5c clip-mode + r5d layout
#   bash tools_tpu_queue_r5.sh bench   [logdir]   # full driver-protocol bench
set -u
PHASE=${1:?phase: measure|bench}
LOG=${2:-/tmp/tpu_queue_r5}
mkdir -p "$LOG"
cd /root/repo

probe_wait() {
  for i in $(seq 1 40); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 && return 0
    echo "  tunnel down (probe $i/40); retry in 90s" | tee -a "$LOG/queue.log"
    sleep 90
  done
  echo "  tunnel did not return; giving up" | tee -a "$LOG/queue.log"
  return 1
}

run() {
  name=$1; tmo=$2; shift 2
  probe_wait || return 1
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -6 "$LOG/$name.log" | sed "s/^/  /" | tee -a "$LOG/queue.log"
  echo "--- $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  return $rc
}

persist() {
  DST=/root/repo/bench_logs
  mkdir -p "$DST"
  for f in r5c r5d bench profile3; do
    [ -f "$LOG/$f.log" ] && tail -c 120000 "$LOG/$f.log" > "$DST/r5queue_$f.log"
  done
  cp "$LOG/queue.log" "$DST/r5queue_queue.log" 2>/dev/null
}
trap persist EXIT

if [ "$PHASE" = measure ]; then
  run r5c 3600 python probes/r5/tools_probe_r5c.py
  run r5d 3600 python probes/r5/tools_probe_r5d.py
elif [ "$PHASE" = bench ]; then
  run bench 5400 python bench.py
fi
