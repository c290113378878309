#!/bin/bash
# Round-4 TPU measurement + experiment queue. Single-client tunnel: run ONCE,
# nothing else touching the TPU. Ordering: cheap diagnostics -> the round's
# headline measurements -> the long synthetic-FST training block -> crash-
# risky probes LAST (a wedged worker cannot block anything above it).
#
# Usage: bash tools_tpu_queue_r4.sh [logdir] [synth_root]
set -u
LOG=${1:-/tmp/tpu_queue_r4}
SYNTH=${2:-/tmp/arseg_synth}
mkdir -p "$LOG"
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -4 "$LOG/$name.log" | sed "s/^/  /" | tee -a "$LOG/queue.log"
  echo "--- $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  return $rc
}

persist() {
  DST=/root/repo/bench_logs
  mkdir -p "$DST"
  for f in probe profile r3s_rerun protocol_walltime benchv2 bench \
           gen train_bise18 eval_bise18 train_psp18 eval_psp18 \
           train_psp18v2 eval_psp18v2 evalbf16_bise18 r4a pathology; do
    [ -f "$LOG/$f.log" ] && tail -c 120000 "$LOG/$f.log" > "$DST/r4queue_$f.log"
  done
  cp "$LOG/queue.log" "$DST/r4queue_queue.log" 2>/dev/null
}
trap persist EXIT

run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue.log"; exit 1; }

# -- diagnostics + round headline measurements -----------------------------
run profile           2400 python tools_profile_gop.py
run r3s_rerun         2400 python probes/r3/tools_probe_r3s.py   # ADVICE r3 #4
run protocol_walltime 3600 python tools_protocol_walltime_tpu.py 4 bise18
run benchv2           2400 python tools_synth_e2e.py benchv2
run bench             4500 python bench.py

# -- synthetic end-to-end FST experiment (VERDICT #2/#3/#4) ----------------
if [ ! -d "$SYNTH/camvid-sequence/3M-GOP12/decoded_GOP12_dist_0" ]; then
  run gen 7200 python tools_synth_e2e.py gen --root "$SYNTH"
fi
for cfg in bise18 psp18 psp18v2; do
  run "train_$cfg" 14400 python tools_synth_e2e.py train --root "$SYNTH" --config "$cfg"
  run "eval_$cfg"   7200 python tools_synth_e2e.py eval  --root "$SYNTH" --config "$cfg"
done
# serving-dtype composition on the trained headline model (VERDICT weak #3)
run evalbf16_bise18 7200 python tools_synth_e2e.py eval --root "$SYNTH" --config bise18 --dtype bfloat16

# -- crash-risky last (subprocess-guarded, but a wedged tunnel stays wedged)
if [ "${RISKY:-1}" = "1" ]; then
  run r4a       5400 python probes/r4/tools_probe_r4a.py
  run pathology 5400 python tools_retest_pathologies.py
fi
echo "QUEUE DONE ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
# copy experiment artifacts into the repo for commit
if [ -d "$SYNTH/results" ]; then
  mkdir -p /root/repo/bench_logs/synth_results
  cp "$SYNTH"/results/*.txt "$SYNTH"/results/*.json /root/repo/bench_logs/synth_results/ 2>/dev/null
  cp "$SYNTH"/train_history_*.json /root/repo/bench_logs/synth_results/ 2>/dev/null
fi
persist
echo "logs persisted"
