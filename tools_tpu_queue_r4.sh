#!/bin/bash
# Round-4 TPU queue, split into two phases so the builder can interleave
# perf probes between the cheap measurements and the long experiment block.
# Single-client tunnel: run ONE phase at a time, nothing else on the TPU.
#
# Usage:
#   bash tools_tpu_queue_r4.sh measure [logdir]            # ~1h diagnostics
#   bash tools_tpu_queue_r4.sh experiment [logdir] [synth] # FST block + probes
#   bash tools_tpu_queue_r4.sh perf2 [logdir]              # post-experiment A/Bs
set -u
PHASE=${1:?phase: measure|experiment}
LOG=${2:-/tmp/tpu_queue_r4}
SYNTH=${3:-/tmp/arseg_synth}
mkdir -p "$LOG"
cd /root/repo

probe_wait() {
  # The axon tunnel can wedge mid-queue (symptom this morning: the training
  # step's RPC never returned, client stuck in a TIME_WAIT reconnect churn;
  # killing the client freed it). Gate every step on a cheap device probe
  # and wait out tunnel downtime instead of cascading multi-hour timeouts.
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
  tail -4 "$LOG/$name.log" | sed "s/^/  /" | tee -a "$LOG/queue.log"
  echo "--- $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  return $rc
}

persist() {
  DST=/root/repo/bench_logs
  mkdir -p "$DST"
  for f in probe profile r3s_rerun protocol_walltime benchv2 bench r4perf \
           gen train_bise18 eval_bise18 train_psp18 eval_psp18 \
           train_psp18v2 eval_psp18v2 evalbf16_bise18 r4a pathology \
           r3q_s2d walltime2 bench2 profile2; do
    [ -f "$LOG/$f.log" ] && tail -c 120000 "$LOG/$f.log" > "$DST/r4queue_$f.log"
  done
  cp "$LOG/queue.log" "$DST/r4queue_queue.log" 2>/dev/null
}
trap persist EXIT

run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down; aborting" | tee -a "$LOG/queue.log"; exit 1; }

if [ "$PHASE" = measure ]; then
  # profile already captured this session (bench_logs/r4queue_profile.log)
  [ -f "$LOG/profile.log" ] || run profile 2400 python tools_profile_gop.py
  run r3s_rerun         2400 python probes/r3/tools_probe_r3s.py   # ADVICE r3 #4
  run protocol_walltime 3600 python tools_protocol_walltime_tpu.py 4 bise18
  run benchv2           2400 python tools_synth_e2e.py benchv2
  run bench             4500 python bench.py
  echo "MEASURE PHASE DONE ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  persist
  exit 0
fi

if [ "$PHASE" = perf2 ]; then
  # post-experiment follow-ups: capture the MERGED_ROW_GATHER default flip
  # on the driver bench, re-measure protocol wall-clock with the memoized
  # build_model (the AR warm-pass anomaly fix), and run the r3q s2d
  # slice-unshuffle A/B that round 3 never got TPU time for.
  run r3q_s2d   2400 python probes/r3/tools_probe_r3q.py
  run walltime2 3600 python tools_protocol_walltime_tpu.py 4 bise18
  run bench2    4500 python bench.py
  echo "PERF2 PHASE DONE ($(date +%H:%M:%S))" | tee -a "$LOG/queue.log"
  persist
  exit 0
fi

# -- experiment phase -------------------------------------------------------
if [ ! -f "$SYNTH/.gen_done" ]; then
  run gen 7200 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools_synth_e2e.py gen --root "$SYNTH"
  [ -d "$SYNTH/camvid-sequence/3M-GOP12/decoded_GOP12_dist_0" ] && touch "$SYNTH/.gen_done"
fi
for cfg in bise18 psp18 psp18v2; do
  if [ "$cfg" = psp18v2 ] && [ -d "$SYNTH/checkpoints/psp18/HR" ] \
     && [ ! -d "$SYNTH/checkpoints/psp18v2/HR" ]; then
    # phase-1 HR is fuse-version-independent: share psp18's teacher
    mkdir -p "$SYNTH/checkpoints/psp18v2"
    cp -r "$SYNTH/checkpoints/psp18/HR" "$SYNTH/checkpoints/psp18v2/HR"
  fi
  run "train_$cfg" 7200 python tools_synth_e2e.py train --root "$SYNTH" --config "$cfg"
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
