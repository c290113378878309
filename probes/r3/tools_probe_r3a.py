"""Round-3 probe A: per-stage cost of the camvid-bise18 NON-KEY frame path.

vs_baseline = AR fps / HR-every-frame fps, so only the non-key-frame stages
move the ratio (backbone speedups raise the denominator faster than the
numerator). Each stage is timed INSIDE one jitted fori_loop (the axon tunnel
charges ~2-3 ms per dispatch, swamping sub-ms stages measured call-by-call);
iterations are serialized through an s/s scale factor XLA cannot fold.
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
C = 256
DT = jnp.bfloat16
ITERS = 24


def bench(name, fn, *args, iters=ITERS, rounds=5):
    """Time `fn(*args)` looped `iters` times inside one jit."""

    def body(i, a0):
        out = fn(*a0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = leaf.ravel()[0].astype(jnp.float32)
        dep = (jnp.abs(s) + 1.0) / (jnp.abs(s) + 1.0)  # ==1, not foldable
        a1 = list(a0)
        a1[0] = (a1[0].astype(jnp.float32) * dep).astype(a1[0].dtype)
        return tuple(a1)

    @jax.jit
    def run(*a):
        a = jax.lax.fori_loop(0, iters, body, tuple(a))
        return a[0].ravel()[0]

    np.asarray(run(*args))  # compile + warm
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:46s} {t*1e3:8.3f} ms", flush=True)
    return t


rng = np.random.RandomState(0)
model = build_model("camvid-bise18", fuse=True)
params = model.init(jax.random.PRNGKey(1))
params = jax.tree_util.tree_map(
    lambda x: x.astype(DT) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
    params,
)

frames11 = jnp.asarray(rng.randn(11, H, W, 3).astype(np.float32)).astype(DT)
fx11 = jnp.asarray(rng.uniform(-16, 16, (11, H, W)).astype(np.float32))
fy11 = jnp.asarray(rng.uniform(-16, 16, (11, H, W)).astype(np.float32))
ref_feat = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(DT)
ref11 = jnp.broadcast_to(ref_feat, (11, FH, FW, C)) + 0.0
fxf = jnp.asarray(rng.uniform(-2, 2, (11, FH, FW)).astype(np.float32))
fyf = jnp.asarray(rng.uniform(-2, 2, (11, FH, FW)).astype(np.float32))
x_lr1 = jnp.asarray(rng.randn(1, 360, 480, 3).astype(np.float32)).astype(DT)
mid1 = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(DT)
warped1 = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(DT)
fused1 = jnp.asarray(rng.randn(1, FH, FW, C).astype(np.float32)).astype(DT)
logits1 = jnp.asarray(rng.randn(1, FH, FW, 12).astype(np.float32)).astype(DT)
big1 = jnp.asarray(rng.randn(1, H, W, 12).astype(np.float32)).astype(DT)

# ---- stage timings (per call; divide n=11 stages by 11 for per-frame) -------
bench("A  frame resize [11]x720x960->360x480",
      lambda x: resize_bilinear(x, (360, 480), align_corners=True), frames11)

def flow_resize(fx, fy):
    s = jnp.float32(FH / fx.shape[-2])
    return (_resize_plane_bilinear(fx * s, (FH, FW), True),
            _resize_plane_bilinear(fy * s, (FH, FW), True))

bench("B  flow resize 2x[11,720,960]->[11,90,120]", flow_resize, fx11, fy11)

bench("C  warp_feature [11,90,120,256]",
      lambda r, a, b: warp_feature(r, (a, b)), ref11, fxf, fyf)

def phase1(x, p):
    return model.forward_phase1(p, x)[-1]

bench("D  LR phase1 360x480 (n=1)", phase1, x_lr1, params)

fa = params["fuse_attention"]
from arseg_tpu.ops.pallas_creff import creff_qkv_fused

bench("E  creff_qkv_fused [1,90,120,256]",
      lambda a, b: creff_qkv_fused(
          a, b, fa["lr_query_conv"], fa["hr_key_conv"], fa["hr_value_conv"], 7, 7),
      mid1, warped1)

def head_only_current(fused, p):
    out = Fn.conv2d(p["conv_out"]["conv_out"], fused)
    out = resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8), align_corners=False)
    return jnp.argmax(out, axis=-1).astype(jnp.int32)

bench("F  head only CURRENT (conv+up+argmax)", head_only_current, fused1, params)

bench("F1 conv 1x1 256->12 only",
      lambda fused, p: Fn.conv2d(p["conv_out"]["conv_out"], fused), fused1, params)
bench("F2 x8 upsample [1,90,120,12]->[720,960,12]",
      lambda lg: resize_bilinear(lg, (H, W), align_corners=False), logits1)
bench("F3 argmax [1,720,960,12]",
      lambda lg: jnp.argmax(lg, axis=-1).astype(jnp.int32), big1)

MH = jnp.asarray(_linear_matrix(FH, H, False))
MW = jnp.asarray(_linear_matrix(FW, W, False))

def head_planes(fused, p):
    wfc = p["conv_out"]["conv_out"]["weight"][0, 0]
    bfc = p["conv_out"]["conv_out"]["bias"]
    lg = jnp.einsum("nhwc,cm->nmhw", fused, wfc) + bfc[None, :, None, None]
    lg = jnp.einsum("Hh,nmhw->nmHw", MH.astype(lg.dtype), lg)
    lg = jnp.einsum("Ww,nmhw->nmhW", MW.astype(lg.dtype), lg)
    return jnp.argmax(lg, axis=1).astype(jnp.int32)

bench("G  head only PLANES (H-first)", head_planes, fused1, params)

def head_planes_sub(fused, p):
    wfc = p["conv_out"]["conv_out"]["weight"][0, 0]
    bfc = p["conv_out"]["conv_out"]["bias"]
    lg = jnp.einsum("nhwc,cm->nmhw", fused, wfc) + bfc[None, :, None, None]
    return lg

bench("G1 planes final-conv dot only", head_planes_sub, fused1, params)

lgp1 = jnp.asarray(rng.randn(1, 12, FH, FW).astype(np.float32)).astype(DT)

bench("G2 planes H+W matmul up only",
      lambda lg: jnp.einsum("Ww,nmhw->nmhW", MW.astype(lg.dtype),
                            jnp.einsum("Hh,nmhw->nmHw", MH.astype(lg.dtype), lg)),
      lgp1)

bigp1 = jnp.asarray(rng.randn(1, 12, H, W).astype(np.float32)).astype(DT)
bench("G3 argmax [1,12,720,960] axis=1",
      lambda lg: jnp.argmax(lg, axis=1).astype(jnp.int32), bigp1)

# full non-key branch, current vs planes (n=1)
def lr_branch_current(x, fxp, fyp, ref, p):
    warped = warp_feature(ref, (fxp, fyp))
    feat = model.forward_phase1(p, x)[-1]
    out, _ = model.forward_phase2(p, feat, warped)
    out = resize_bilinear(out, (H, W), align_corners=True)
    return jnp.argmax(out, axis=-1).astype(jnp.int32)

bench("H  full non-key branch CURRENT (n=1)",
      lr_branch_current, x_lr1, fxf[:1], fyf[:1], ref_feat, params)

def lr_branch_planes(x, fxp, fyp, ref, p):
    warped = warp_feature(ref, (fxp, fyp))
    feat = model.forward_phase1(p, x)[-1]
    fused = model.fuse_apply(p["fuse_attention"], warped, feat)
    return head_planes(fused, p)

bench("H2 full non-key branch PLANES (n=1)",
      lr_branch_planes, x_lr1, fxf[:1], fyf[:1], ref_feat, params)

# agreement
a = np.asarray(jax.jit(head_only_current)(fused1, params))
b = np.asarray(jax.jit(head_planes)(fused1, params))
print(f"head agreement (bf16): {np.mean(a == b)*100:.4f}% match", flush=True)
print("DONE", flush=True)
