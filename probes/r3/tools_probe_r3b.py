"""Round-3 probe B: GOP-level omission A/B for camvid-bise18.

One jitted call per GOP variant (the axon tunnel charges ~2-3 ms per
dispatch, so sub-stages are measured as GOP deltas, not standalone):
  full        : the production ARPipeline program
  no-warp     : warp replaced by identity (ref broadcast)
  no-creff    : fusion replaced by identity on the warped feature
  no-head     : phase-2 head replaced by argmax over fused[..., :12]
  planes-head : final-conv dot in plane-major + matmul x8 upsample + argmax
  batched-p1  : phase1 over all 11 frames in ONE batch, creff+head mapped
Each delta = full - variant estimates that stage's per-GOP cost.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear, warp_feature
from arseg_tpu.ops.resize import _linear_matrix
from arseg_tpu.ops.warp import _resize_plane_bilinear
from arseg_tpu.nn import functional as Fn

enable_compile_cache()

H, W = 720, 960
FH, FW = 90, 120
DT = jnp.bfloat16
G = 12


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    for _ in range(2):
        _sync(fn(*args))
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


rng = np.random.RandomState(0)
hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
hr_params0 = hr_model.init(jax.random.PRNGKey(0))
lr_params0 = lr_model.init(jax.random.PRNGKey(1))
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hr_params = cast(hr_params0)
lr_params = cast(lr_params0)

keyframe = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)).astype(DT)
frames = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32)).astype(DT)
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))

MH = jnp.asarray(_linear_matrix(FH, H, False))
MW = jnp.asarray(_linear_matrix(FW, W, False))


def head_planes(p, fused):
    wfc = p["conv_out"]["conv_out"]["weight"][0, 0]
    bfc = p["conv_out"]["conv_out"]["bias"]
    lg = jnp.einsum("nhwc,cm->nmhw", fused, wfc) + bfc[None, :, None, None]
    lg = jnp.einsum("Hh,nmhw->nmHw", MH.astype(lg.dtype), lg)
    lg = jnp.einsum("Ww,nmhw->nmhW", MW.astype(lg.dtype), lg)
    return jnp.argmax(lg, axis=1).astype(jnp.int32)


def make_gop(variant):
    def lr_branch(p, x, fxp, fyp, ref_feat):
        n = x.shape[0]
        ref_rep = jnp.broadcast_to(ref_feat, (n,) + ref_feat.shape[1:])
        warped = ref_rep if variant == "no-warp" else warp_feature(ref_rep, (fxp, fyp))
        feat = lr_model.forward_phase1(p, x)[-1]
        fused = feat if variant == "no-creff" else lr_model.fuse_apply(
            p["fuse_attention"], warped, feat)
        if variant == "no-head":
            pred = jnp.argmax(fused[..., :12], axis=-1).astype(jnp.int32)
            return jnp.repeat(jnp.repeat(pred, 8, axis=1), 8, axis=2)
        if variant in ("planes-head", "batched-p1"):
            return head_planes(p, fused)
        out = Fn.conv2d(p["conv_out"]["conv_out"], fused)
        out = resize_bilinear(out, (H, W), align_corners=False)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    @jax.jit
    def gop(hp, lp, key, frs, fxa, fya):
        hr_out = hr_model.apply(hp, key)
        key_logits, ref_feat = hr_out[0], hr_out[-1]
        if variant == "no-flow-resize":
            # pretend the [G-1, 720, 960] flow planes are already at feature
            # resolution: slice instead of resample (delta = resample cost)
            fxr = fxa[:, :FH, :FW] * jnp.float32(FH / H)
            fyr = fya[:, :FH, :FW] * jnp.float32(FH / H)
        else:
            s = jnp.float32(FH / fxa.shape[-2])
            fxr = _resize_plane_bilinear(fxa * s, (FH, FW), True)
            fyr = _resize_plane_bilinear(fya * s, (FH, FW), True)
        if variant == "no-frame-resize":
            # slice the LR crop instead of bilinear-downsizing (delta = the
            # [G-1,720,960,3] -> [360,480] resize cost)
            x_lr = frs[:, : H // 2, : W // 2, :]
        else:
            x_lr = resize_bilinear(frs, (H // 2, W // 2), align_corners=True)

        if variant == "batched-p1":
            feat = lr_model.forward_phase1(lp, x_lr)[-1]  # [11, FH, FW, 256]
            ref_rep = jnp.broadcast_to(ref_feat, (G - 1,) + ref_feat.shape[1:])
            warped = warp_feature(ref_rep, (fxr, fyr))

            def fuse_one(args):
                f, wp = args
                fused = lr_model.fuse_apply(lp["fuse_attention"], wp[None], f[None])
                return head_planes(lp, fused)[0]

            preds = jax.lax.map(fuse_one, (feat, warped))
        elif variant == "batched-fuse":
            # phase1 stays per-frame (the n=11 batched phase1 inside the full
            # program is the known compile-crash trigger), but warp + CReFF +
            # head run ONCE batched: one n=11 kernel launch instead of 11
            feat = jax.lax.map(
                lambda a: lr_model.forward_phase1(lp, a[None])[-1][0], x_lr
            )
            ref_rep = jnp.broadcast_to(ref_feat, (G - 1,) + ref_feat.shape[1:])
            warped = warp_feature(ref_rep, (fxr, fyr))
            fused = lr_model.fuse_apply(lp["fuse_attention"], warped, feat)
            preds = head_planes(lp, fused)
        else:
            preds = jax.lax.map(
                lambda a: lr_branch(lp, a[0][None], a[1][None], a[2][None], ref_feat)[0],
                (x_lr, fxr, fyr),
            )
        key_pred = jnp.argmax(resize_bilinear(key_logits, (H, W), align_corners=True),
                              axis=-1).astype(jnp.int32)
        return jnp.concatenate([key_pred, preds], axis=0)

    return gop


variants = ["full", "planes-head", "no-warp", "no-creff", "no-head", "batched-p1"]
if len(sys.argv) > 1:
    variants = sys.argv[1].split(",")
ts = {}
for v in variants:
    try:
        ts[v] = bench(v, make_gop(v), hr_params, lr_params, keyframe, frames, fx, fy)
    except Exception as e:
        print(f"{v:28s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

if "full" in ts:
    for v, t in ts.items():
        if v != "full":
            d = (ts["full"] - t) * 1e3
            print(f"delta full - {v:16s} = {d:+7.2f} ms/GOP ({d/11:+6.3f} ms/frame)", flush=True)
print("DONE", flush=True)
