"""r4l: warp-gather design space at the bise18 fusion shape.

The r4i profile's largest AR-specific op is the warp gather
(fusion.1451, bf16[10800,2,2,256], 1.119 ms/GOP = 0.102 ms/frame x 11).
The keyframe feature is GOP-invariant, so the four bilinear corners of
every table entry can be packed ONCE per GOP into a channel-concatenated
table t4[y,x] = (fp[y,x], fp[y,x+1], fp[y+1,x], fp[y+1,x+1]) [H+1,W+1,4C];
the per-frame gather then reads one CONTIGUOUS (1,1,4C) row per output
pixel instead of a (2,2,C) two-row strided block. Same descriptor count,
same bytes — this probe asks whether the contiguous form lowers faster,
and whether batching the gather across the 11 frames (the table is
frame-invariant) amortizes per-op overhead.

Arms (all end-to-end warp incl. lerp, bf16 feature, f32 weights):
  exact-map    production form: per-frame (2,2,C) gather under lax.map
  exact-bat    same gather, all 11 frames in one call
  t4-map       t4 row gather per-frame under lax.map (table prebuilt)
  t4-bat       t4 row gather, 11 frames batched
  t4-pib       t4-bat with PROMISE_IN_BOUNDS (indices are pre-clipped)
  t4-flat      flattened [P,4C] table + one-column take (row index y*(W+1)+x)
  t4-build     table build alone (the once-per-GOP cost)

Shapes: padded source [1,92,122,256]; flows [11,90,120] planes, |f|<=16.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arseg_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

H, W, C, G1 = 90, 120, 256, 11
DT = jnp.bfloat16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=20, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:10s} {t*1e3:8.3f} ms/GOP-equiv", flush=True)
    return t


rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(DT)
fx = jnp.asarray(rng.uniform(-16, 16, (G1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G1, H, W)).astype(np.float32))


def coords(fx, fy):
    """Replicates warp_feature's index/weight math (align_corners=False)."""
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    vx = xx + fx
    vy = yy + fy
    gx = 2.0 * vx / (W - 1) - 1.0
    gy = 2.0 * vy / (H - 1) - 1.0
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)

    def axis_w(w0, frac, lim, d):
        valid = (w0 + d >= 0) & (w0 + d <= lim)
        return (frac if d else 1 - frac) * valid

    wx0, wx1 = axis_w(x0, wx, W - 1, 0), axis_w(x0, wx, W - 1, 1)
    wy0, wy1 = axis_w(y0, wy, H - 1, 0), axis_w(y0, wy, H - 1, 1)
    return yi, xi, wy0, wy1, wx0, wx1


fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [1,92,122,C]


def t4_build(fp):
    return jnp.concatenate(
        [fp[:, :-1, :-1], fp[:, :-1, 1:], fp[:, 1:, :-1], fp[:, 1:, 1:]],
        axis=-1,
    )  # [1,91,121,4C]


def gather22(fp0, yi, xi):
    """(2,2,C) corner-block gather for one frame (production form)."""
    idx = jnp.stack([yi, xi], axis=-1).reshape(-1, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    return lax.gather(
        fp0, idx, dn, slice_sizes=(2, 2, C), mode=lax.GatherScatterMode.CLIP
    ).reshape(H, W, 2, 2, C)


def lerp22(blk, wy0, wy1, wx0, wx1):
    return (
        blk[:, :, :, 0, 0] * (wy0 * wx0)[..., None]
        + blk[:, :, :, 0, 1] * (wy0 * wx1)[..., None]
        + blk[:, :, :, 1, 0] * (wy1 * wx0)[..., None]
        + blk[:, :, :, 1, 1] * (wy1 * wx1)[..., None]
    ).astype(DT)


def gather_t4(t40, yi, xi, mode):
    idx = jnp.stack([yi, xi], axis=-1).reshape(-1, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1)
    )
    return lax.gather(t40, idx, dn, slice_sizes=(1, 1, 4 * C), mode=mode)


def lerp_t4(rows, wy0, wy1, wx0, wx1):
    blk = rows.reshape(rows.shape[:-1] + (4, C))
    return (
        blk[..., 0, :] * (wy0 * wx0)[..., None]
        + blk[..., 1, :] * (wy0 * wx1)[..., None]
        + blk[..., 2, :] * (wy1 * wx0)[..., None]
        + blk[..., 3, :] * (wy1 * wx1)[..., None]
    ).astype(DT)


@jax.jit
def exact_map(fp, fx, fy):
    def one(args):
        fx1, fy1 = args
        yi, xi, wy0, wy1, wx0, wx1 = coords(fx1[None], fy1[None])
        blk = gather22(fp[0], yi[0], xi[0])
        return lerp22(blk[None], wy0, wy1, wx0, wx1)[0]

    return lax.map(one, (fx, fy))


@jax.jit
def exact_bat(fp, fx, fy):
    yi, xi, wy0, wy1, wx0, wx1 = coords(fx, fy)
    blk = jax.vmap(gather22, in_axes=(None, 0, 0))(fp[0], yi, xi)
    return lerp22(blk, wy0, wy1, wx0, wx1)


@jax.jit
def t4_map(t4, fx, fy):
    def one(args):
        fx1, fy1 = args
        yi, xi, wy0, wy1, wx0, wx1 = coords(fx1[None], fy1[None])
        rows = gather_t4(t4[0], yi[0], xi[0], lax.GatherScatterMode.CLIP)
        rows = rows.reshape(1, H, W, 4 * C)
        return lerp_t4(rows, wy0, wy1, wx0, wx1)[0]

    return lax.map(one, (fx, fy))


def _t4_bat(t4, fx, fy, mode):
    yi, xi, wy0, wy1, wx0, wx1 = coords(fx, fy)
    rows = jax.vmap(gather_t4, in_axes=(None, 0, 0, None))(t4[0], yi, xi, mode)
    rows = rows.reshape(G1, H, W, 4 * C)
    return lerp_t4(rows, wy0, wy1, wx0, wx1)


t4_bat = jax.jit(lambda t4, fx, fy: _t4_bat(t4, fx, fy, lax.GatherScatterMode.CLIP))
t4_pib = jax.jit(
    lambda t4, fx, fy: _t4_bat(t4, fx, fy, lax.GatherScatterMode.PROMISE_IN_BOUNDS)
)


@jax.jit
def t4_flat(t4f, fx, fy):
    yi, xi, wy0, wy1, wx0, wx1 = coords(fx, fy)
    flat = yi * (W + 1) + xi  # [G1,H,W]
    rows = jnp.take(t4f, flat.reshape(-1), axis=0).reshape(G1, H, W, 4 * C)
    return lerp_t4(rows, wy0, wy1, wx0, wx1)


def main():
    t4 = jax.jit(t4_build)(fp)
    t4f = t4.reshape(-1, 4 * C)
    _sync(t4)
    _sync(t4f)

    # parity first (vs the production exact-map form)
    ref = np.asarray(exact_map(fp, fx, fy), np.float32)
    for name, fn, a in [
        ("exact-bat", exact_bat, fp),
        ("t4-map", t4_map, t4),
        ("t4-bat", t4_bat, t4),
        ("t4-pib", t4_pib, t4),
        ("t4-flat", t4_flat, t4f),
    ]:
        got = np.asarray(fn(a, fx, fy), np.float32)
        d = np.abs(got - ref).max()
        print(f"parity {name:10s} max|d|={d:.6f}", flush=True)

    bench("exact-map", exact_map, fp, fx, fy)
    bench("exact-bat", exact_bat, fp, fx, fy)
    bench("t4-map", t4_map, t4, fx, fy)
    bench("t4-bat", t4_bat, t4, fx, fy)
    bench("t4-pib", t4_pib, t4, fx, fy)
    bench("t4-flat", t4_flat, t4f, fx, fy)
    bench("t4-build", jax.jit(t4_build), fp, iters=50)


if __name__ == "__main__":
    main()
