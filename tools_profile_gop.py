"""Capture a device trace of the production camvid-bise18 GOP program and
print a per-op cost table.

The round-3 GOP budget (PERF.md) was measured by omission deltas — reliable
for stage totals but blind to what happens INSIDE a stage (e.g. the ~1.4 ms
CReFF "wrap" = lr_up resize + host-side pads + any layout copies around the
Pallas kernel). A profiler trace names every fusion/op with its device time.

Parses the Chrome-trace JSON (plugins/profile/*/\*.trace.json.gz) with the
stdlib — no xprof/tensorboard needed. If the axon remote PJRT plugin cannot
export device events through the tunnel, says so and exits 0 (fallback stays
the omission-delta method, tools_probe_r3g.py).

Usage: python tools_profile_gop.py [trace_dir]
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.utils import profiling
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.utils.tree import cast_f32

enable_compile_cache()

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arseg_trace"
H, W, G = 720, 960, 12
DT = jnp.bfloat16
CALLS = 3


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def main():
    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    hr_params = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
    lr_params = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)
    pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

    for _ in range(2):
        _sync(pipe(hr_params, lr_params, kf, fr, (fx, fy)))
    t0 = time.perf_counter()
    with profiling.trace(TRACE_DIR):
        for _ in range(CALLS):
            out = pipe(hr_params, lr_params, kf, fr, (fx, fy))
        _sync(out)
    wall = (time.perf_counter() - t0) / CALLS
    print(f"traced {CALLS} GOP calls, {wall*1e3:.2f} ms/call wall", flush=True)

    files = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("NO trace.json.gz produced — remote PJRT trace export "
              "unsupported; use omission deltas (tools_probe_r3g.py)")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: process names containing 'TPU' (XLA op events carry
    # dur in us); host python/runtime tracks are excluded
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n.upper() or "/device" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e["name"]
            agg[name] += e["dur"]
            cnt[name] += 1
            total += e["dur"]
    if not agg:
        print(f"trace has no device events (tracks: {sorted(pid_name.values())})")
        return
    print(f"\ndevice total {total/1e3/CALLS:.2f} ms/call over {len(agg)} op names")
    print(f"{'op':<72s} {'ms/call':>8s} {'n':>5s}")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    for name, us in top:
        print(f"{name[:72]:<72s} {us/1e3/CALLS:8.3f} {cnt[name]:5d}")

    # exact attribution: the trace and this compile share the process (and
    # the jit fn object), so HLO op names match — map each top op to its
    # definition (output shape/layout + source file:line)
    import re
    compiled = pipe._step.lower(hr_params, lr_params, kf, fr, (fx, fy)).compile()
    txt = compiled.as_text()
    defs = {}
    for ln in txt.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s+(\w+)\(", ln)
        if m:
            defs[m.group(1)] = (m.group(2), m.group(3), ln)
    print("\n## attribution (same-process compile)")
    for name, us in top:
        base = name.split("(")[0]
        d = defs.get(base)
        if d is None:
            print(f"{base:<40s} (no HLO def — dispatch/annotation event)")
            continue
        shape, opcode, ln = d
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', ln)
        where = f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else "?"
        opn = re.search(r'op_name="([^"]+)"', ln)
        print(f"{base:<28s} {us/1e3/CALLS:7.3f}  {opcode:<12s} {shape:<44s} "
              f"{where:<22s} {opn.group(1)[:60] if opn else ''}")


if __name__ == "__main__":
    main()
