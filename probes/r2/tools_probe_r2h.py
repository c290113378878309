"""Round-2 TPU probes, part H — lane-gather warp passes at full-frame scale.

Part G established: take_along_axis along LANES compiles and is exact
([128,128]); sublane gather and C=64-minor-dim ops crash. This probe times
the two separable warp passes at production scale (720x960x64 bf16):

  H1  pass-1 shape: gather along H-lanes. Layout [C, W, Hp]; per (c, w) row
      gather with idx in [0, Hp). Multi-tile: Hp/128 gathers + selects.
  H2  pass-2 shape: gather along W-lanes. Layout [C, H, Wp]; 2 gathers
      (xi, xi+1) + fractional lerp.
  H3  XLA transpose [C, W, H] -> [C, H, W] at this size (the mid-pass
      relayout) and [H, W, C] -> [C, W, H] (input prep).
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
BF = jnp.bfloat16

C, H, W = 64, 720, 960
HP = 768   # H padded to lane multiple
WP = 1024  # W padded to lane multiple


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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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


def lane_gather_full(x, idx, nlanes):
    """x [..., nlanes], idx [..., nlanes] int32 in [0, nlanes):
    out[..., l] = x[..., idx[..., l]] via per-128-tile take_along_axis +
    select. All shapes static; minor dims 128-multiples. Mosaic only lowers
    2-D gathers, so leading dims are collapsed (free: minor dim unchanged)."""
    shp = x.shape
    x2 = x.reshape(-1, nlanes)
    idx2 = idx.reshape(-1, nlanes)
    nt = nlanes // 128
    if nt == 1:
        return jnp.take_along_axis(x2, idx2, axis=-1).reshape(shp)
    acc = None
    for k in range(nt):
        tile = jax.lax.slice_in_dim(x2, k * 128, (k + 1) * 128, axis=-1)
        loc = idx2 - k * 128
        inb = (loc >= 0) & (loc < 128)
        g = jnp.take_along_axis(tile, jnp.clip(loc, 0, 127), axis=-1)
        acc = jnp.where(inb, g, acc if acc is not None else jnp.zeros_like(g))
    return acc.reshape(shp)


# ---------------------------------------------------------------- H1: pass 1
print("=== H1: pass-1 vertical lane-gather ===", flush=True)
featT = jnp.asarray(rng.randn(C, W, HP).astype(np.float32)).astype(BF)
# idx/weight planes in [W, HP] layout (idx per (w, oy)); int32, bf16 frac
J = jnp.asarray(rng.randint(0, H - 1, (W, HP)).astype(np.int32))
WY = jnp.asarray(rng.rand(W, HP).astype(np.float32)).astype(BF)

CB, WB = 8, 64  # block: [CB, WB, HP]


def p1_kernel(j_ref, wy_ref, x_ref, out_ref):
    x = x_ref[...]              # [CB, WB, HP]
    j = j_ref[...]              # [WB, HP]
    wy = wy_ref[...].astype(jnp.float32)
    jb = jnp.broadcast_to(j[None], (CB, WB, HP))
    g0 = lane_gather_full(x, jb, HP).astype(jnp.float32)
    g1 = lane_gather_full(x, jnp.minimum(jb + 1, HP - 1), HP).astype(jnp.float32)
    out_ref[...] = ((1.0 - wy)[None] * g0 + wy[None] * g1).astype(out_ref.dtype)


def p1(featT, J, WY):
    return pl.pallas_call(
        p1_kernel,
        out_shape=jax.ShapeDtypeStruct((C, W, HP), BF),
        grid=(C // CB, W // WB),
        in_specs=[
            pl.BlockSpec((WB, HP), lambda ci, wi: (wi, 0)),
            pl.BlockSpec((WB, HP), lambda ci, wi: (wi, 0)),
            pl.BlockSpec((CB, WB, HP), lambda ci, wi: (ci, wi, 0)),
        ],
        out_specs=pl.BlockSpec((CB, WB, HP), lambda ci, wi: (ci, wi, 0)),
        interpret=INTERPRET,
    )(J, WY, featT)


def p1_check(o):
    xs = np.asarray(featT, np.float32)
    j = np.asarray(J)
    wy = np.asarray(WY, np.float32)
    g0 = np.take_along_axis(xs, np.broadcast_to(j[None], xs.shape), axis=-1)
    g1 = np.take_along_axis(xs, np.broadcast_to(np.minimum(j + 1, HP - 1)[None], xs.shape), axis=-1)
    ref = (1 - wy)[None] * g0 + wy[None] * g1
    return float(np.abs(o.astype(np.float32) - ref).max())


bench("H1 pass1 [64,960,768] 6-tile", p1, featT, J, WY, check=p1_check)

# ---------------------------------------------------------------- H2: pass 2
print("=== H2: pass-2 horizontal lane-gather ===", flush=True)
p1out = jnp.asarray(rng.randn(C, H, WP).astype(np.float32)).astype(BF)
XI = jnp.asarray(rng.randint(0, W - 1, (H, WP)).astype(np.int32))
WX = jnp.asarray(rng.rand(H, WP).astype(np.float32)).astype(BF)

HB = 16


def p2_kernel(xi_ref, wx_ref, x_ref, out_ref):
    x = x_ref[...]              # [CB, HB, WP]
    xi = xi_ref[...]            # [HB, WP]
    wx = wx_ref[...].astype(jnp.float32)
    xib = jnp.broadcast_to(xi[None], (CB, HB, WP))
    g0 = lane_gather_full(x, xib, WP).astype(jnp.float32)
    g1 = lane_gather_full(x, jnp.minimum(xib + 1, WP - 1), WP).astype(jnp.float32)
    out_ref[...] = ((1.0 - wx)[None] * g0 + wx[None] * g1).astype(out_ref.dtype)


def p2(p1out, XI, WX):
    return pl.pallas_call(
        p2_kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, WP), BF),
        grid=(C // CB, H // HB),
        in_specs=[
            pl.BlockSpec((HB, WP), lambda ci, hi: (hi, 0)),
            pl.BlockSpec((HB, WP), lambda ci, hi: (hi, 0)),
            pl.BlockSpec((CB, HB, WP), lambda ci, hi: (ci, hi, 0)),
        ],
        out_specs=pl.BlockSpec((CB, HB, WP), lambda ci, hi: (ci, hi, 0)),
        interpret=INTERPRET,
    )(XI, WX, p1out)


def p2_check(o):
    xs = np.asarray(p1out, np.float32)
    xi = np.asarray(XI)
    wx = np.asarray(WX, np.float32)
    g0 = np.take_along_axis(xs, np.broadcast_to(xi[None], xs.shape), axis=-1)
    g1 = np.take_along_axis(xs, np.broadcast_to(np.minimum(xi + 1, WP - 1)[None], xs.shape), axis=-1)
    ref = (1 - wx)[None] * g0 + wx[None] * g1
    return float(np.abs(o.astype(np.float32) - ref).max())


bench("H2 pass2 [64,720,1024] 8-tile", p2, p1out, XI, WX, check=p2_check)

# ------------------------------------------------------------- H3: transposes
print("=== H3: XLA transposes ===", flush=True)
a_hwc = jnp.asarray(rng.randn(H, W, C).astype(np.float32)).astype(BF)
a_cwh = jnp.asarray(rng.randn(C, W, HP).astype(np.float32)).astype(BF)

bench("H3a [H,W,C]->[C,W,H]", lambda x: jnp.transpose(x, (2, 1, 0)), a_hwc)
bench("H3b [C,W,H]->[C,H,W]", lambda x: jnp.transpose(x, (0, 2, 1)), a_cwh)
bench("H3c [C,H,W]->[H,W,C]", lambda x: jnp.transpose(x, (1, 2, 0)),
      jnp.asarray(rng.randn(C, H, W).astype(np.float32)).astype(BF))

print("DONE", flush=True)
