"""Round-2 probes, part J — Mosaic in-kernel transpose cost + int32 gather.

The separable warp needs a [xw, oy] -> [oy, xw] relayout between its two
lane-gather passes, and the warp output needs [C, H, W] -> [H, W, C] for the
CReFF consumer. XLA HBM transposes at frame size cost 4.7-7.2 ms (probe H3)
— dead. If Mosaic's in-VMEM transpose is fast, both relayouts fold into
kernels. Also: bf16 lane-gather crashes Mosaic (probe I), so bf16 payloads
must ride int32-packed pairs — verify int32 gather works.
"""
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


def bench(name, fn, *args, iters=8, rounds=3, check=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        out0 = f(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    msg = ""
    if check is not None:
        msg = f" check={check(np.asarray(out0)):.2e}"
    if INTERPRET:
        print(f"{name}: interpret OK{msg}", flush=True)
        return 0.0
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = sorted(ts)[len(ts) // 2] * 1000
    print(f"{name}: {ms:.3f} ms  (compile {compile_s:.1f}s){msg}", flush=True)
    return ms


# ------------------------------------------------ J1: 2-D slab transpose x64
print("=== J1: in-kernel 2-D transpose (frame-scale) ===", flush=True)


def j1(dtype, name):
    A, B = 968, 768
    x = jnp.asarray(rng.randn(64, A, B).astype(np.float32)).astype(dtype)

    def kernel(x_ref, o_ref):
        o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, B, A), dtype),
            grid=(64,),
            in_specs=[pl.BlockSpec((1, A, B), lambda c: (c, 0, 0))],
            out_specs=pl.BlockSpec((1, B, A), lambda c: (c, 0, 0)),
            interpret=INTERPRET,
        )(x)

    ref = np.swapaxes(np.asarray(x, np.float32), 1, 2)
    ms = bench(f"J1 {name} [968,768]x64", run, x,
               check=lambda o: float(np.abs(o.astype(np.float32) - ref).max()))
    return ms


j1(jnp.float32, "f32")
j1(jnp.bfloat16, "bf16")

# --------------------------------------- J2: tile-size 3-D minor-dim rotate
print("=== J2: in-kernel tile transpose [64,24,128]->[24,128,64] ===", flush=True)


def j2(dtype, name, nt=720):
    x = jnp.asarray(rng.randn(nt, 64, 24, 128).astype(np.float32)).astype(dtype)

    def kernel(x_ref, o_ref):
        o_ref[0] = jnp.transpose(x_ref[0], (1, 2, 0))

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nt, 24, 128, 64), dtype),
            grid=(nt,),
            in_specs=[pl.BlockSpec((1, 64, 24, 128), lambda t: (t, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 24, 128, 64), lambda t: (t, 0, 0, 0)),
            interpret=INTERPRET,
        )(x)

    ref = np.transpose(np.asarray(x, np.float32), (0, 2, 3, 1))
    bench(f"J2 {name} x{nt}", run, x,
          check=lambda o: float(np.abs(o.astype(np.float32) - ref).max()))


j2(jnp.bfloat16, "bf16", 180)

# ---------------------------------------------------------- J3: int32 gather
print("=== J3: int32 lane-gather (bf16-pair carrier) ===", flush=True)


def j3():
    x_np = rng.randn(512, 128).astype(np.float32)
    xb = jnp.asarray(x_np).astype(jnp.bfloat16)
    # pack two bf16 "channels" (rows c, c+256) into one int32 per lane
    i_np = rng.randint(0, 128, (512, 128)).astype(np.int32)
    idx = jnp.asarray(i_np)

    def kernel(x_ref, i_ref, o_ref):
        xi32 = x_ref[...]
        g = jnp.take_along_axis(xi32, i_ref[...], axis=-1)
        o_ref[...] = g

    def run(x, i):
        x32 = jax.lax.bitcast_convert_type(
            x.reshape(512, 64, 2), jnp.int32
        ).reshape(512, 64)
        gg = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((512, 64), jnp.int32),
            interpret=INTERPRET,
        )(x32, i[:, :64])
        return jax.lax.bitcast_convert_type(
            gg.reshape(512, 64, 1), jnp.bfloat16
        ).reshape(512, 128)

    ref = np.asarray(xb, np.float32).reshape(512, 64, 2)
    ref = np.take_along_axis(
        ref, np.broadcast_to(i_np[:, :64, None], (512, 64, 2)), axis=1
    ).reshape(512, 128)
    bench("J3 int32-packed gather [512,64]", run, xb, idx,
          check=lambda o: float(np.abs(o.astype(np.float32) - ref).max()))


j3()

print("DONE", flush=True)
