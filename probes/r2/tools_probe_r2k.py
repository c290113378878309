"""Round-2 probes, part K — intrinsic rates that decide warp v2:
  K1  bare in-kernel take_along_axis rate (cycles/vreg), f32 + int32
  K2  3-tile banded select overhead vs bare
  K3  MXU transpose-dot precision ladder (bf16 default / f32 HIGH / HIGHEST)
  K4  concat _tile_cat cost
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
rng = np.random.RandomState(0)
R, L = 512, 768  # rows x lanes per block
G = 64           # grid steps -> total 512*64 = 32K rows of 768 lanes


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=16, rounds=3):
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    try:
        out0 = fn(*args)
        _sync(out0)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    ms = sorted(ts)[len(ts) // 2] * 1000
    nvreg = G * R * L / (8 * 128)
    cyc = ms * 1e-3 * 0.94e9 / nvreg
    print(f"{name}: {ms:.3f} ms  ({cyc:.1f} cyc/out-vreg, compile {compile_s:.1f}s)",
          flush=True)
    return ms


def gather_probe(name, dtype, mode):
    x_np = rng.randn(G, R, L).astype(np.float32)
    x = jnp.asarray(x_np)
    if dtype == "int32":
        x = jax.lax.bitcast_convert_type(x, jnp.int32)
    if mode == "bare":
        i_np = rng.randint(0, L, (G, R, L)).astype(np.int32)
    else:
        base = np.broadcast_to(np.arange(L, dtype=np.int64)[None, None], (G, R, L))
        i_np = (base + rng.randint(-100, 100, (G, R, L))).clip(0, L - 1).astype(np.int32)
    idx = jnp.asarray(i_np)

    def kernel(x_ref, i_ref, o_ref):
        xv = x_ref[0]
        iv = i_ref[0]
        if mode == "bare":
            # in-range single-tile gathers per 128-chunk (idx can exceed the
            # tile, so this is NOT semantically a gather — pure rate probe)
            outs = []
            for t in range(L // 128):
                tile = jax.lax.slice_in_dim(xv, t * 128, (t + 1) * 128, axis=-1)
                ic = jax.lax.slice_in_dim(iv, t * 128, (t + 1) * 128, axis=-1)
                outs.append(jnp.take_along_axis(tile, ic % 128, axis=-1))
            o_ref[0] = jnp.concatenate(outs, axis=-1)
        else:
            # the real banded select r=1
            from arseg_tpu.ops.pallas_warp2 import _lane_select_banded

            o_ref[0] = _lane_select_banded(xv, iv, 1, L // 128)

    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, R, L), x.dtype),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, R, L), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, R, L), lambda g: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, L), lambda g: (g, 0, 0)),
            interpret=False,
        )(x, idx)

    bench(f"K {name}", run, x, idx)


print("=== K1/K2: gather rates ===", flush=True)
gather_probe("bare f32", "f32", "bare")
gather_probe("banded r=1 f32", "f32", "banded")
gather_probe("bare int32", "int32", "bare")
gather_probe("banded r=1 int32", "int32", "banded")

print("=== K3: transpose-dot precision ===", flush=True)


def tdot_probe(name, dtype, prec):
    x = jnp.asarray(rng.randn(G, 128, L).astype(np.float32)).astype(dtype)
    ident = jnp.eye(128, dtype=dtype)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], i_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)

    def run(x, ident):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, L, 128), dtype),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, 128, L), lambda g: (g, 0, 0)),
                pl.BlockSpec((128, 128), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0)),
        )(x, ident)

    ms = bench(f"K3 {name}", run, x, ident)
    if ms is not None:
        # exactness check
        out = np.asarray(jax.jit(run)(x, ident)).astype(np.float32)
        ref = np.swapaxes(np.asarray(x, np.float32), 1, 2)
        print(f"   exact: {np.array_equal(out, ref)}", flush=True)


tdot_probe("bf16 default", jnp.bfloat16, None)
tdot_probe("f32 HIGH", jnp.float32, jax.lax.Precision.HIGH)
tdot_probe("f32 HIGHEST", jnp.float32, jax.lax.Precision.HIGHEST)

print("DONE", flush=True)
