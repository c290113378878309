"""r3o: name the structural fat. The session-4 profiler trace of the
production camvid-bise18 GOP program (bench_logs/r3queue_profile.log)
attributes ~2.1 ms/GOP to pure `copy.*` ops, 0.74 ms to one `reshape`, and
0.57 ms x2 to two large fusions — all once-per-call batch-phase ops. This
tool compiles the same program and prints the HLO definition of every
expensive op name so the copies can be traced to a layout decision we
control (NHWC vs kernel-padded geometry, concatenate, repeat, ...).

Run AFTER a profile capture; pass op names (default: the session-4 list).
Usage: python tools_probe_r3o.py [op ...]
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

OPS = sys.argv[1:] or [
    "reshape.18", "fusion.1034", "fusion.1036", "copy.280", "copy.344",
    "copy.343", "fusion.208", "fusion.80", "fusion.176", "copy.342",
    "fusion.1332", "fusion.1333", "copy.338", "copy.286", "fusion.129",
    "fusion.161", "copy.337", "reshape.20", "fusion.1462", "while.212",
]


def main():
    hr_model = build_model("camvid-bise18", fuse=False)
    lr_model = build_model("camvid-bise18", fuse=True)
    hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
    lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)
    pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

    fn = jax.jit(pipe._gop_step)
    compiled = fn.lower(hrp, lrp, kf, fr, (fx, fy)).compile()
    txt = compiled.as_text()
    print(f"HLO: {len(txt.splitlines())} lines", flush=True)

    # definition lines: "  %name = type opcode(...)" or "  name = ..."
    for op in OPS:
        pat = re.compile(
            r"^\s*%?" + re.escape(op.replace(".", "__DOT__")).replace("__DOT__", r"\.")
            + r"\s*=", re.M)
        hits = [ln.strip() for ln in txt.splitlines() if pat.match(ln)]
        if not hits:
            print(f"\n## {op}: NOT FOUND (numbering drifted — recapture trace)")
            continue
        for h in hits:
            # fusions: also print the computation body head
            print(f"\n## {op}\n  {h[:400]}")
            m = re.search(r"calls=(%?[\w.\-]+)", h)
            if m:
                body = m.group(1).lstrip("%")
                bpat = re.compile(r"^%?" + re.escape(body) + r"\s.*?{$", re.M)
                bm = bpat.search(txt)
                if bm:
                    start = bm.end()
                    chunk = txt[start:start + 4000]
                    lines = chunk.splitlines()[:18]
                    print("  body:")
                    for ln in lines:
                        print(f"    {ln.strip()[:200]}")


if __name__ == "__main__":
    main()
