"""Round-2 probes, part L — XLA gather-engine descriptor rate by slice shape.

The exact warp is descriptor-bound (~22 ns per [2,2,C] slice = 15 ms/frame).
Codec flow is piecewise constant, so 16-px runs share one contiguous source
slice: ONE [2, 17, C] descriptor per run cuts descriptors 16x — IF wide
slices keep the fast descriptor rate (PERF.md recorded [6,6,C] at 2.1 us:
100x penalty; is the penalty on rows, bytes, or dims?).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
rng = np.random.RandomState(0)
H, W, C = 722, 962, 64
src = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
srcb = src.astype(jnp.bfloat16)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=3, ndesc=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        _sync(f(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = sorted(ts)[len(ts) // 2] * 1000
    per = f"  {ms * 1e6 / ndesc:.0f} ns/desc" if ndesc else ""
    print(f"{name}: {ms:.3f} ms{per}  (compile {compile_s:.1f}s)", flush=True)
    return ms


def gather_rate(rows, cols, n_desc, x, cpad=None):
    c = x.shape[-1]
    yy = rng.randint(0, H - rows, (n_desc,)).astype(np.int32)
    xx = rng.randint(0, W - cols, (n_desc,)).astype(np.int32)
    idx = jnp.asarray(np.stack([yy, xx], -1))

    def run(x, idx):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return lax.gather(x, idx, dn, slice_sizes=(rows, cols, c),
                          mode=lax.GatherScatterMode.CLIP)

    bench(f"gather ({rows},{cols},{c})x{n_desc} {x.dtype}", run, x, idx,
          ndesc=n_desc)


print("=== L1: slice-shape ladder (f32) ===", flush=True)
gather_rate(2, 2, 691200, src)     # the exact warp baseline
gather_rate(2, 17, 43200, src)     # 16-px chunk + corner
gather_rate(2, 16, 43200, src)
gather_rate(2, 33, 21600, src)     # 32-px chunk
gather_rate(2, 65, 10800, src)
gather_rate(1, 17, 86400, src)     # separate rows (2 gathers of 1 row)
gather_rate(6, 6, 43200, src)      # the recorded 2.1us case
gather_rate(2, 9, 86400, src)      # 8-px chunk
print("=== L2: bf16 ===", flush=True)
gather_rate(2, 17, 43200, srcb)
gather_rate(2, 2, 691200, srcb)
print("DONE", flush=True)
