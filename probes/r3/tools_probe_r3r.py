"""r3r: name the residual layout fat in the production GOP program.

The session-4 trace (bench_logs/r3queue_profile.log) shows ~2.1 ms/GOP of
pure `copy.*` ops plus a 0.74 ms `reshape.18` in the 15.5 ms program —
~18% of the GOP in layout shuffling. The trace names ops but not shapes.
This probe compiles the exact production program and prints every copy /
reshape / transpose in the optimized HLO with its shape, layout, operand,
and the surrounding computation, so the copies can be attributed to a
specific pipeline stage (frame stack layout? planes-major head? kernel
operand pads?) and attacked with a layout change rather than guesses.

Compile-only: safe to run while nothing else holds the tunnel; uses the
persistent compile cache so a bench-warmed cache makes this fast.

Usage: python tools_probe_r3r.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.utils.tree import cast_f32

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16


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

    lowered = pipe._step.lower(hr_params, lr_params, kf, fr, (fx, fy))
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt.splitlines())} lines", flush=True)

    # f32[11,720,960]{2,1,0:T(8,128)} style shapes; count elements * dtype
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s16": 2, "u8": 1,
                "pred": 1, "s8": 1, "f16": 2, "u16": 2, "s64": 8}

    def shape_bytes(s):
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m:
            return 0
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        return n * dt_bytes.get(m.group(1), 4)

    cur_comp = "?"
    rows = []
    for ln in txt.splitlines():
        mc = re.match(r"\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*{", ln)
        if ("{" in ln and ("ENTRY" in ln or re.match(r"\s*%?[\w.\-]+\s*\(", ln))
                and "=" not in ln.split("{")[0]):
            if mc:
                cur_comp = mc.group(1)
        m = re.match(
            r"\s*%?((?:copy|reshape|transpose|bitcast-convert)[.\w]*)\s*=\s*"
            r"(\S+)\s+(copy|reshape|transpose)\(\s*%?([\w.\-]+)", ln)
        if m:
            name, shape, kind, operand = m.groups()
            rows.append((shape_bytes(shape), name, kind, shape, operand,
                         cur_comp))

    rows.sort(reverse=True)
    print(f"\n{'bytes':>12}  {'op':<22} {'kind':<10} shape / layout  "
          f"(operand, computation)")
    for b, name, kind, shape, operand, comp in rows[:40]:
        print(f"{b:12d}  {name:<22} {kind:<10} {shape}  <- {operand}"
              f"   [{comp}]")

    # context for the biggest few: print the full line plus who consumes it
    big = [r[1] for r in rows[:8]]
    print("\n--- context for the top copies/reshapes ---")
    for ln in txt.splitlines():
        for nm in big:
            if re.search(rf"%?{re.escape(nm)}\b", ln):
                print(ln.rstrip()[:240])
                break


if __name__ == "__main__":
    main()
