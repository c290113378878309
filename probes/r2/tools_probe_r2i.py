"""Round-2 probes, part I — bisect the 2-D lane-gather (take_along_axis)
lowering envelope: dtype x rows x wrapping ops."""
import sys, time

sys.path.insert(0, "/root/repo")
INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
rng = np.random.RandomState(0)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, check=None):
    f = jax.jit(fn)
    try:
        out0 = f(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return False
    msg = ""
    if check is not None:
        msg = f" check={check(np.asarray(out0)):.2e}"
    print(f"{name}: OK{msg}", flush=True)
    return True


def taa_probe(name, rows, dtype, wrap="plain"):
    x_np = rng.randn(rows, 128).astype(np.float32)
    i_np = rng.randint(0, 128, (rows, 128)).astype(np.int32)
    x = jnp.asarray(x_np).astype(dtype)
    i = jnp.asarray(i_np)

    def kernel(x_ref, i_ref, o_ref):
        xv = x_ref[...]
        iv = i_ref[...]
        if wrap == "clipwhere":
            loc = iv - 7
            g = jnp.take_along_axis(xv, jnp.clip(loc, 0, 127), axis=-1)
            o_ref[...] = jnp.where((loc >= 0) & (loc < 128), g, jnp.zeros_like(g))
        elif wrap == "f32out":
            g = jnp.take_along_axis(xv, iv, axis=-1).astype(jnp.float32)
            o_ref[...] = (g * 2.0).astype(o_ref.dtype)
        else:
            o_ref[...] = jnp.take_along_axis(xv, iv, axis=-1)

    def run(x, i):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
            interpret=INTERPRET,
        )(x, i)

    if wrap == "clipwhere":
        loc = i_np - 7
        ref = np.where(
            (loc >= 0) & (loc < 128),
            np.take_along_axis(x_np, np.clip(loc, 0, 127), axis=-1), 0.0
        )
    elif wrap == "f32out":
        ref = np.take_along_axis(x_np, i_np, axis=-1) * 2.0
    else:
        ref = np.take_along_axis(x_np, i_np, axis=-1)
    if dtype == jnp.bfloat16:
        ref = ref.astype(jnp.bfloat16).astype(np.float32)
    bench(name, run, x, i,
          check=lambda o: float(np.abs(o.astype(np.float32) - ref).max()))


print("=== I1: dtype x rows ===", flush=True)
taa_probe("f32 [128,128]", 128, jnp.float32)
taa_probe("f32 [8,128]", 8, jnp.float32)
taa_probe("f32 [512,128]", 512, jnp.float32)
taa_probe("f32 [4096,128]", 4096, jnp.float32)
taa_probe("bf16 [128,128]", 128, jnp.bfloat16)
taa_probe("bf16 [512,128]", 512, jnp.bfloat16)
print("=== I2: wrapping ops ===", flush=True)
taa_probe("f32 [512,128] clipwhere", 512, jnp.float32, "clipwhere")
taa_probe("bf16 [512,128] clipwhere", 512, jnp.bfloat16, "clipwhere")
taa_probe("bf16 [512,128] f32out", 512, jnp.bfloat16, "f32out")

# I3: timing at scale — 6-tile select pass-1 equivalent in f32, one big kernel
print("=== I3: timing f32 full pass ===", flush=True)
C, W, HP = 64, 960, 768
CB, WB = 8, 64


def lane_gather_full(x2, idx2, nlanes):
    nt = nlanes // 128
    acc = None
    for k in range(nt):
        tile = jax.lax.slice_in_dim(x2, k * 128, (k + 1) * 128, axis=-1)
        loc = idx2 - k * 128
        inb = (loc >= 0) & (loc < 128)
        g = jnp.take_along_axis(tile, jnp.clip(loc, 0, 127), axis=-1)
        acc = jnp.where(inb, g, acc if acc is not None else jnp.zeros_like(g))
    return acc


def p1_kernel(j_ref, wy_ref, x_ref, out_ref):
    x = x_ref[...].reshape(CB * WB, HP)
    j = j_ref[...]
    wy = wy_ref[...]
    jb = jnp.broadcast_to(j[None], (CB,) + j.shape).reshape(CB * WB, HP)
    wyb = jnp.broadcast_to(wy[None], (CB,) + wy.shape).reshape(CB * WB, HP)
    g0 = lane_gather_full(x, jb, HP)
    g1 = lane_gather_full(x, jnp.minimum(jb + 1, HP - 1), HP)
    out_ref[...] = ((1.0 - wyb) * g0 + wyb * g1).reshape(CB, WB, HP)


def p1(featT, J, WY):
    return pl.pallas_call(
        p1_kernel,
        out_shape=jax.ShapeDtypeStruct((C, W, HP), jnp.float32),
        grid=(C // CB, W // WB),
        in_specs=[
            pl.BlockSpec((WB, HP), lambda ci, wi: (wi, 0)),
            pl.BlockSpec((WB, HP), lambda ci, wi: (wi, 0)),
            pl.BlockSpec((CB, WB, HP), lambda ci, wi: (ci, wi, 0)),
        ],
        out_specs=pl.BlockSpec((CB, WB, HP), lambda ci, wi: (ci, wi, 0)),
        interpret=INTERPRET,
    )(J, WY, featT)


featT = jnp.asarray(rng.randn(C, W, HP).astype(np.float32))
J = jnp.asarray(rng.randint(0, HP - 1, (W, HP)).astype(np.int32))
WY = jnp.asarray(rng.rand(W, HP).astype(np.float32))

f = jax.jit(p1)
try:
    out0 = f(featT, J, WY)
    _sync(out0)
    xs = np.asarray(featT)
    jn = np.asarray(J)
    wy = np.asarray(WY)
    g0 = np.take_along_axis(xs, np.broadcast_to(jn[None], xs.shape), -1)
    g1 = np.take_along_axis(xs, np.broadcast_to(np.minimum(jn + 1, HP - 1)[None], xs.shape), -1)
    ref = (1 - wy)[None] * g0 + wy[None] * g1
    print(f"I3 check={np.abs(np.asarray(out0) - ref).max():.2e}", flush=True)
    if not INTERPRET:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(featT, J, WY)
            _sync(out)
            ts.append((time.perf_counter() - t0) / 8)
        print(f"I3 pass1 f32 [64,960,768]: {sorted(ts)[1] * 1000:.3f} ms", flush=True)
except Exception as e:
    print(f"I3: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

print("DONE", flush=True)
