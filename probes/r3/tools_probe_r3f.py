"""Round-3 probe F: dodge the batched-warp compile pathology.

Round-3 probe B showed `batched-p1` and `batched-fuse` both crash the TPU
worker, and BOTH contain the n=11 batched warp_feature. This probe isolates
the untried quadrant: phase1 batched over all 11 frames (the stage with the
most to gain — small-spatial convs at batch 1 starve the MXU) while warp +
CReFF + head stay per-frame inside a lax.map (the shapes the full program
already runs). Variants:

  full            : production ARPipeline program (reference point)
  p1batch-mapfuse : phase1 n=11 in ONE batch; lax.map over frames does
                    warp(n=1) + CReFF(n=1) + planes head(n=1)
  p1chunk4        : phase1 in chunks of 4 (fallback if n=11 regresses)
  p1only-1 / p1only-11 : standalone phase1 at n=1-mapped vs n=11-batched
                    (the pure utilization delta, no composition)
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
    @jax.jit
    def gop(hp, lp, key, frs, fxa, fya):
        hr_out = hr_model.apply(hp, key)
        key_logits, ref_feat = hr_out[0], hr_out[-1]
        s = jnp.float32(FH / fxa.shape[-2])
        fxr = _resize_plane_bilinear(fxa * s, (FH, FW), True)
        fyr = _resize_plane_bilinear(fya * s, (FH, FW), True)
        x_lr = resize_bilinear(frs, (H // 2, W // 2), align_corners=True)

        if variant in ("p1batch-mapfuse", "p1chunk4"):
            if variant == "p1batch-mapfuse":
                feat = lr_model.forward_phase1(lp, x_lr)[-1]  # [11, FH, FW, 256]
            else:
                x_p = jnp.pad(x_lr, ((0, 1), (0, 0), (0, 0), (0, 0)))
                feat = jax.lax.map(
                    lambda xc: lr_model.forward_phase1(lp, xc)[-1],
                    x_p.reshape(3, 4, *x_lr.shape[1:]),
                ).reshape(-1, FH, FW, 256)[: G - 1]

            def fuse_one(args):
                f, fxp, fyp = args
                warped = warp_feature(ref_feat, (fxp[None], fyp[None]))
                fused = lr_model.fuse_apply(lp["fuse_attention"], warped, f[None])
                return head_planes(lp, fused)[0]

            preds = jax.lax.map(fuse_one, (feat, fxr, fyr))
        else:  # full
            def lr_branch(args):
                xc, fxp, fyp = args
                warped = warp_feature(ref_feat, (fxp[None], fyp[None]))
                f = lr_model.forward_phase1(lp, xc[None])[-1]
                fused = lr_model.fuse_apply(lp["fuse_attention"], warped, f)
                return head_planes(lp, fused)[0]

            preds = jax.lax.map(lr_branch, (x_lr, fxr, fyr))

        key_pred = jnp.argmax(resize_bilinear(key_logits, (H, W), align_corners=True),
                              axis=-1).astype(jnp.int32)
        return jnp.concatenate([key_pred, preds], axis=0)

    return gop


@jax.jit
def p1only_1(lp, x_lr):
    return jax.lax.map(lambda xc: lr_model.forward_phase1(lp, xc[None])[-1][0], x_lr)


@jax.jit
def p1only_11(lp, x_lr):
    return lr_model.forward_phase1(lp, x_lr)[-1]


variants = ["full", "p1batch-mapfuse", "p1chunk4"]
if len(sys.argv) > 1:
    variants = sys.argv[1].split(",")
ts = {}
for v in variants:
    try:
        if v == "p1only-1":
            x_lr = resize_bilinear(frames, (H // 2, W // 2), align_corners=True)
            ts[v] = bench(v, p1only_1, lr_params, x_lr)
        elif v == "p1only-11":
            x_lr = resize_bilinear(frames, (H // 2, W // 2), align_corners=True)
            ts[v] = bench(v, p1only_11, lr_params, x_lr)
        else:
            ts[v] = bench(v, make_gop(v), hr_params, lr_params, keyframe, frames, fx, fy)
    except Exception as e:
        print(f"{v:28s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

if "full" in ts:
    for v, t in ts.items():
        if v != "full":
            d = (ts["full"] - t) * 1e3
            print(f"delta full - {v:16s} = {d:+7.2f} ms/GOP ({d/11:+6.3f} ms/frame)", flush=True)
print("DONE", flush=True)
