"""Component-level TPU microbenchmarks for the AR hot path.

Run on the real chip to locate bottlenecks (single-client TPU: never run
two of these at once). Variants here graduate into ops/ once they win.
"""
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow
from arseg_tpu.ops.local_attention import _creff_reference
from arseg_tpu.ops.pallas_creff import creff_fused_pallas

hr = build_model('camvid-psp18', fuse=False)
lr = build_model('camvid-psp18', fuse=True)
hp = hr.init(jax.random.PRNGKey(0)); lp = lr.init(jax.random.PRNGKey(1))
rng = np.random.RandomState(0)


def bench(name, fn, *args, iters=10):
    f = jax.jit(lambda *a: jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)))
    t0 = time.perf_counter(); float(f(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(*args)
    float(out)
    print(f'{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms  (compile {compile_s:.1f}s)', flush=True)


def warp_gather2x2(feature, flow):
    """Bilinear zero-pad warp via one lax.gather of [2,2,C] corner blocks."""
    n, h, w, c = feature.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    # same sampling math as ops.warp.warp_feature (align_corners=False grid)
    gx = 2.0 * (xx + flow[..., 0]) / max(w - 1, 1) - 1.0
    gy = 2.0 * (yy + flow[..., 1]) / max(h - 1, 1) - 1.0
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(ix); y0 = jnp.floor(iy)
    wx = (ix - x0)[..., None]; wy = (iy - y0)[..., None]
    fp = jnp.pad(feature, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    idx = jnp.stack([yi, xi], axis=-1).reshape(n, -1, 2)

    def g1(fp1, idx1):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return lax.gather(fp1, idx1, dn, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.CLIP)

    blk = jax.vmap(g1)(fp, idx).reshape(n, h, w, 2, 2, c)

    def wgt(dy, dx):
        # corner validity mask (zero-padding semantics for any out-of-bounds
        # corner, incl. windows whose clamp landed them on real texels)
        xc = x0 + dx
        yc = y0 + dy
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        wxx = wx if dx else 1 - wx
        wyy = wy if dy else 1 - wy
        return wxx * wyy * valid[..., None]

    out = (blk[:, :, :, 0, 0] * wgt(0, 0) + blk[:, :, :, 0, 1] * wgt(0, 1)
           + blk[:, :, :, 1, 0] * wgt(1, 0) + blk[:, :, :, 1, 1] * wgt(1, 1))
    return out.astype(feature.dtype)


q = jnp.asarray(rng.randn(1, 720, 960, 64).astype(np.float32))
ref = jnp.asarray(rng.randn(1, 720, 960, 64).astype(np.float32))
flow = jnp.asarray(rng.uniform(-16, 16, (1, 720, 960, 2)).astype(np.float32))
feat = jnp.asarray(rng.randn(1, 360, 480, 64).astype(np.float32))

# --- correctness spot-check of the gather warp vs the production warp
w_ref = np.asarray(jax.jit(warp_feature)(ref, flow))
w_new = np.asarray(jax.jit(warp_gather2x2)(ref, flow))
print('warp_gather2x2 max err:', np.abs(w_ref - w_new).max(), flush=True)

for th, tw in [(32, 120), (16, 120), (8, 120)]:
    bench(f'creff_pallas th={th} tw={tw}',
          lambda a, b, c_, th=th, tw=tw: creff_fused_pallas(a, b, c_, 7, 7, th, tw),
          q, ref, ref)

bench('warp only (take_along_axis)', warp_feature, ref, flow)
bench('warp only (gather2x2)', warp_gather2x2, ref, flow)
bench('flow scale+resize only', lambda f: scale_and_resize_flow(f, (720, 960), 'bilinear'), flow)

bench('phase2 (CReFF+head) new kernel', lambda p, f, r: lr.forward_phase2(p, f, r)[0], lp, feat, ref)

# bf16 end-to-end probes
kf = jnp.asarray(rng.randn(1, 720, 960, 3).astype(np.float32))
hp16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, hp)
try:
    bench('hr_forward bf16-params+input', lambda p, x: hr.apply(p, x.astype(jnp.bfloat16))[0], hp16, kf)
except Exception as e:
    print('bf16 hr failed:', e, flush=True)
bench('creff_pallas bf16 th=32 tw=120',
      lambda a, b, c_: creff_fused_pallas(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), c_.astype(jnp.bfloat16), 7, 7, 32, 120),
      q, ref, ref)

bench('warp bf16', lambda r, f: warp_feature(r.astype(jnp.bfloat16), f), ref, flow)
fx = flow[..., 0]; fy = flow[..., 1]
bench('flow resize split planes', lambda a, b: scale_and_resize_flow(jnp.stack([a, b], -1), (720, 960), 'bilinear', split=True), fx, fy)
