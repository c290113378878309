"""Analytic per-frame FLOPs of the HR-every-frame vs AR eval paths (XLA
cost_analysis, CPU backend — hardware-independent). Source of the FLOP-ratio
table in PERF.md's cross-hardware statement: the AR-Seg paper's headline is
a ~3x computational-cost reduction at scale 0.5x, and these ratios reproduce
it from this re-implementation (GOP 12, eval path incl. flow resize, warp,
CReFF fusion, head, logit upsample, argmax)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from arseg_tpu.models import build_model
from arseg_tpu.nn import functional as Fn
from arseg_tpu.ops import resize_bilinear, warp_feature
from arseg_tpu.ops.warp import _resize_plane_bilinear

G = 12
CONFIGS = [
    ("camvid-bise18", 720, 960),
    ("camvid-psp18", 720, 960),
    ("cityscapes-bise18", 1024, 2048),
    ("cityscapes-psp18", 1024, 2048),
]


def gflops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", float("nan")) / 1e9


def main():
    for name, H, W in CONFIGS:
        hr = build_model(name, fuse=False)
        lr = build_model(name, fuse=True)
        hp = hr.init(jax.random.PRNGKey(0))
        lp = lr.init(jax.random.PRNGKey(1))
        x = jnp.zeros((1, H, W, 3), jnp.float32)
        xl = jnp.zeros((1, H // 2, W // 2, 3), jnp.float32)

        def hr_frame(p, x):
            out = hr.apply(p, x)
            lg = resize_bilinear(out[0], (H, W), align_corners=True)
            return jnp.argmax(lg, axis=-1)

        g_hr = gflops(hr_frame, hp, x)

        # warp/CReFF live at the HR keyframe feature grid (the reference
        # warps the HR net's [-1] feature, evaluation.py:161-183)
        feat = jax.eval_shape(lambda p, x: hr.apply(p, x)[-1], hp, x)
        fh, fw, fc = feat.shape[1:]
        ref = jnp.zeros((1, fh, fw, fc), jnp.float32)
        fxy = (jnp.zeros((1, H, W), jnp.float32), jnp.zeros((1, H, W), jnp.float32))

        def nonkey(p, x, ref, fx, fy):
            s = jnp.float32(fh / fx.shape[-2])
            fxr = _resize_plane_bilinear(fx * s, (fh, fw), True)
            fyr = _resize_plane_bilinear(fy * s, (fh, fw), True)
            warped = warp_feature(ref, (fxr, fyr))
            feat = lr.forward_phase1(p, x)[-1]
            fused = lr.fuse_apply(p["fuse_attention"], warped, feat)
            if "bise" in name:
                out = Fn.conv2d(p["conv_out"]["conv_out"], fused)
                out = resize_bilinear(out, (H, W), align_corners=False)
            else:
                out, _ = lr.forward_phase2(p, feat, warped)
                out = resize_bilinear(out, (H, W), align_corners=True)
            return jnp.argmax(out, axis=-1)

        g_nk = gflops(nonkey, lp, xl, ref, *fxy)
        g_ar = (g_hr + (G - 1) * g_nk) / G
        print(
            f"{name}: HR/frame {g_hr:.1f} GF, AR non-key/frame {g_nk:.1f} GF, "
            f"AR amortized/frame {g_ar:.1f} GF, FLOP ratio HR/AR {g_hr/g_ar:.2f}x "
            f"(fuse feat {fh}x{fw}x{fc})",
            flush=True,
        )


if __name__ == "__main__":
    main()
