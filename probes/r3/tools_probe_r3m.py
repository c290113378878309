"""r3m: raise the AR multi-GOP plateau (B=8 = 1131.3 fps, best-vs-best
1.14x over HR-192). Variants of the 88-frame fuse stage:
  a) per-frame lax.map of warp+CReFF+head (current production)
  b) warp per-frame (mapped), CReFF+head BATCHED over all 88 frames
     (batched fuse was safe and -0.61 ms at B=1 n=11, r3g; the only
     crasher is the batched warp, r3b)
  c) as (b) but CReFF+head batched in 4 chunks of 22 (bound VMEM/HBM)
  d) warp batched in chunks of 4 (r3b says n=11 batched warp crashes the
     worker; probe whether small batches are safe), fuse as (b). Runs LAST
     so a worker crash cannot block the b/c measurements.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear
from arseg_tpu.ops.warp import warp_feature

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16
B = 8


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, fpc, iters=4, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
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
    print(f"{name:12s} {t*1e3:8.2f} ms/call  ({fpc/t:7.1f} fps)", flush=True)
    return fpc / t


hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hrp = cast(hr_model.init(jax.random.PRNGKey(0)))
lrp = cast(lr_model.init(jax.random.PRNGKey(1)))
pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(B, G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (B, G - 1, H, W)).astype(np.float32))

bench("a:map-all", pipe, hrp, lrp, kf, fr, (fx, fy), fpc=B * G)

from arseg_tpu.gop.pipeline import _as_tuple, _resize_flow_planes


def prep(hr_params, lr_params, keyframes, frames, fxp, fyp):
    b, g1, h, w, _ = frames.shape
    hr_out = _as_tuple(hr_model.apply(hr_params, keyframes))
    key_logits, ref_feat = hr_out[0], hr_out[-1]
    fx2 = fxp.reshape(b * g1, *fxp.shape[2:])
    fy2 = fyp.reshape(b * g1, *fyp.shape[2:])
    fx2, fy2 = _resize_flow_planes((fx2, fy2), ref_feat.shape[1:3])
    x_lr = resize_bilinear(
        frames.reshape(b * g1, h, w, 3), (int(h * 0.5), int(w * 0.5)),
        align_corners=True)
    feat = _as_tuple(lr_model.forward_phase1(lr_params, x_lr))[-1]
    ref_rep = jnp.repeat(ref_feat, g1, axis=0)
    key_logits = resize_bilinear(key_logits, (h, w), align_corners=True)
    key_preds = jnp.argmax(key_logits, axis=-1)[:, None]
    return feat, fx2, fy2, ref_rep, key_preds


def variant_b(hr_params, lr_params, keyframes, frames, fxp, fyp):
    b, g1, h, w, _ = frames.shape
    keyframes = keyframes.astype(DT)
    frames = frames.astype(DT)
    feat, fx2, fy2, ref_rep, key_preds = prep(
        hr_params, lr_params, keyframes, frames, fxp, fyp)
    warped = jax.lax.map(
        lambda a: warp_feature(a[0][None], (a[1][None], a[2][None]))[0],
        (ref_rep, fx2, fy2))
    preds = lr_model.forward_phase2_argmax(lr_params, feat, warped)
    preds = preds.reshape(b, g1, h, w)
    return jnp.concatenate([key_preds, preds], axis=1).astype(jnp.int32)


def variant_c(hr_params, lr_params, keyframes, frames, fxp, fyp):
    b, g1, h, w, _ = frames.shape
    keyframes = keyframes.astype(DT)
    frames = frames.astype(DT)
    feat, fx2, fy2, ref_rep, key_preds = prep(
        hr_params, lr_params, keyframes, frames, fxp, fyp)
    warped = jax.lax.map(
        lambda a: warp_feature(a[0][None], (a[1][None], a[2][None]))[0],
        (ref_rep, fx2, fy2))
    n = feat.shape[0]
    chunk = 22
    preds = jax.lax.map(
        lambda a: lr_model.forward_phase2_argmax(lr_params, a[0], a[1]),
        (feat.reshape(n // chunk, chunk, *feat.shape[1:]),
         warped.reshape(n // chunk, chunk, *warped.shape[1:])))
    preds = preds.reshape(b, g1, h, w)
    return jnp.concatenate([key_preds, preds], axis=1).astype(jnp.int32)


vb = jax.jit(variant_b)
vc = jax.jit(variant_c)
rb = bench("b:batch-fuse", vb, hrp, lrp, kf, fr, fx, fy, fpc=B * G)
rc = bench("c:chunk22", vc, hrp, lrp, kf, fr, fx, fy, fpc=B * G)

# agreement check vs production
if rb:
    ref_out = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    b_out = np.asarray(vb(hrp, lrp, kf, fr, fx, fy))
    print("b agrees:", bool((ref_out == b_out).all()), flush=True)


def variant_d(hr_params, lr_params, keyframes, frames, fxp, fyp):
    b, g1, h, w, _ = frames.shape
    keyframes = keyframes.astype(DT)
    frames = frames.astype(DT)
    feat, fx2, fy2, ref_rep, key_preds = prep(
        hr_params, lr_params, keyframes, frames, fxp, fyp)
    n = feat.shape[0]
    chunk = 4
    warped = jax.lax.map(
        lambda a: warp_feature(a[0], (a[1], a[2])),
        (ref_rep.reshape(n // chunk, chunk, *ref_rep.shape[1:]),
         fx2.reshape(n // chunk, chunk, *fx2.shape[1:]),
         fy2.reshape(n // chunk, chunk, *fy2.shape[1:])))
    warped = warped.reshape(n, *warped.shape[2:])
    preds = lr_model.forward_phase2_argmax(lr_params, feat, warped)
    preds = preds.reshape(b, g1, h, w)
    return jnp.concatenate([key_preds, preds], axis=1).astype(jnp.int32)


# LAST: batched-warp probe — r3b crashed the worker at n=11; chunk=4 may
# be inside the safe envelope. A crash here loses nothing above.
vd = jax.jit(variant_d)
rd = bench("d:warp-chunk4", vd, hrp, lrp, kf, fr, fx, fy, fpc=B * G)
if rd:
    d_out = np.asarray(vd(hrp, lrp, kf, fr, fx, fy))
    ref_out = np.asarray(pipe(hrp, lrp, kf, fr, (fx, fy)))
    print("d agrees:", bool((ref_out == d_out).all()), flush=True)
print("DONE", flush=True)
