#!/bin/bash
# Prioritized TPU measurement queue for the round-3 open items. Run ONCE
# when the axon tunnel returns (single-client: stop any watcher/probe
# first). Ordering: cheap/diagnostic first, crash-risky last — a worker
# crash in r3m variant d or the pathology retest cannot block the earlier
# measurements.
#
# Usage: bash tools_tpu_queue.sh [logdir]   (default /tmp/tpu_queue)
set -u
LOG=${1:-/tmp/tpu_queue}
mkdir -p "$LOG"
cd /root/repo

# stop a polling watcher (single-client), unless it is our own parent
# (the watcher launches this queue itself on TPU_UP and then just waits)
if [ -f /tmp/tpu_watch.pid ] && [ "$(cat /tmp/tpu_watch.pid)" != "$PPID" ]; then
  kill "$(cat /tmp/tpu_watch.pid)" 2>/dev/null
  sleep 2
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -4 "$LOG/$name.log" | sed "s/^/  /" | tee -a "$LOG/queue.log"
  echo "--- $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  return $rc
}

run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down; aborting" | tee -a "$LOG/queue.log"; exit 1; }

run profile   2400 python tools_profile_gop.py
run r3r       1800 python tools_probe_r3r.py
run bench     3600 python bench.py
run feeder    5400 python tools_bench_feeder_tpu.py 30
# Crash-risky stages (r3m variant d + the pathology retest can wedge the
# worker/tunnel): OPT-IN via RISKY=1 so an unattended auto-queue can never
# leave the tunnel wedged right before the driver's round-end bench.
if [ "${RISKY:-0}" = "1" ]; then
  run r3m       5400 python tools_probe_r3m.py
  run pathology 5400 python tools_retest_pathologies.py
else
  echo "SKIPPED crash-risky stages (r3m, pathology) — rerun with RISKY=1 after a bench capture" | tee -a "$LOG/queue.log"
fi
echo "QUEUE DONE ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"

# Persist results into the repo: if the queue fires unattended, /tmp logs
# die with the sandbox, but the driver commits repo files at round end.
DST=/root/repo/bench_logs
mkdir -p "$DST"
for f in probe profile r3r r3n bench feeder r3m pathology; do
  [ -f "$LOG/$f.log" ] && tail -c 100000 "$LOG/$f.log" > "$DST/r3queue_$f.log"
done
cp "$LOG/queue.log" "$DST/r3queue_queue.log" 2>/dev/null
echo "logs persisted to $DST"
