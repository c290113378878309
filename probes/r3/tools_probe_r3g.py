"""Round-3 probe G: stage deltas on the NEW (p1-batched) 16 ms GOP program,
plus the last untried batching quadrant.

r3b established the crash trigger is the n=11 BATCHED WARP (both crashing
variants contained it). With phase 1 now batched in production, the
remaining question: can warp stay per-frame while CReFF + head batch n=11
(one kernel launch instead of 11)?

  full            : production ARPipeline (p1_batched=True)
  mapwarp-batchfuse : p1 batched; lax.map warps frames one-at-a-time into a
                    stacked [11,...] buffer; CReFF + planes head run ONCE
  no-warp         : warp -> broadcast identity (delta = warp cost)
  no-creff        : fusion -> identity on warped (delta = CReFF total incl.
                    upsample/pad wrap)
  kernel-creff    : fusion -> raw creff_qkv_fused on pre-upsampled feat
                    (delta vs no-creff isolates the wrap overhead)
  no-frame-resize : slice instead of bilinear 0.5x downsize
  no-hr           : keyframe branch replaced by zeros ref (delta = HR branch)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.ops import resize_bilinear, warp_feature
from arseg_tpu.ops.resize import _linear_matrix
from arseg_tpu.ops.warp import _resize_plane_bilinear

enable_compile_cache()

H, W = 720, 960
FH, FW = 90, 120
DT = jnp.bfloat16
G = 12


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=8, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:
        print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
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
    print(f"{name:24s} {t*1e3:8.2f} ms/GOP  ({G/t:7.1f} fps)", flush=True)
    return t


rng = np.random.RandomState(0)
hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
hr_params = cast(hr_model.init(jax.random.PRNGKey(0)))
lr_params = cast(lr_model.init(jax.random.PRNGKey(1)))

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
        if variant == "no-hr":
            key_logits = jnp.zeros((1, FH * 8, FW * 8, 12), DT)
            ref_feat = jnp.zeros((1, FH, FW, 256), DT)
        else:
            hr_out = hr_model.apply(hp, key)
            key_logits, ref_feat = hr_out[0], hr_out[-1]
        s = jnp.float32(FH / fxa.shape[-2])
        fxr = _resize_plane_bilinear(fxa * s, (FH, FW), True)
        fyr = _resize_plane_bilinear(fya * s, (FH, FW), True)
        if variant == "no-frame-resize":
            x_lr = frs[:, : H // 2, : W // 2, :]
        else:
            x_lr = resize_bilinear(frs, (H // 2, W // 2), align_corners=True)

        feat = lr_model.forward_phase1(lp, x_lr)[-1]  # [11, 46, 60, 256]

        if variant == "mapwarp-batchfuse":
            warped = jax.lax.map(
                lambda a: warp_feature(ref_feat, (a[0][None], a[1][None]))[0],
                (fxr, fyr),
            )
            fused = lr_model.fuse_apply(lp["fuse_attention"], warped, feat)
            preds = head_planes(lp, fused)
        else:
            def fuse_one(args):
                f, fxp, fyp = args
                warped = (
                    ref_feat
                    if variant == "no-warp"
                    else warp_feature(ref_feat, (fxp[None], fyp[None]))
                )
                if variant == "no-creff":
                    fused = warped
                elif variant == "kernel-creff":
                    from arseg_tpu.ops.pallas_creff import creff_qkv_fused
                    fa = lp["fuse_attention"]
                    lr_up = resize_bilinear(f[None], (FH, FW), align_corners=True)
                    fused = creff_qkv_fused(
                        lr_up, warped, fa["lr_query_conv"], fa["hr_key_conv"],
                        fa["hr_value_conv"], 7, 7,
                    )
                else:
                    fused = lr_model.fuse_apply(lp["fuse_attention"], warped, f[None])
                return head_planes(lp, fused)[0]

            preds = jax.lax.map(fuse_one, (feat, fxr, fyr))

        key_pred = jnp.argmax(resize_bilinear(key_logits, (H, W), align_corners=True),
                              axis=-1).astype(jnp.int32)
        return jnp.concatenate([key_pred, preds], axis=0)

    return gop


variants = ["full", "mapwarp-batchfuse", "no-warp", "no-creff", "kernel-creff",
            "no-frame-resize", "no-hr"]
if len(sys.argv) > 1:
    variants = sys.argv[1].split(",")
ts = {}
for v in variants:
    if v == "prod":
        pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
        ts[v] = bench(v, pipe, hr_params, lr_params, keyframe, frames, (fx, fy))
    else:
        ts[v] = bench(v, make_gop(v), hr_params, lr_params, keyframe, frames, fx, fy)

if ts.get("full"):
    for v, t in ts.items():
        if v != "full" and t:
            d = (ts["full"] - t) * 1e3
            print(f"delta full - {v:18s} = {d:+7.2f} ms/GOP ({d/11:+6.3f} ms/frame)", flush=True)
print("DONE", flush=True)
