"""r4f: (a) fused resize->s2d LR input on the production GOP program;
(b) batched n=11 CReFF + batched planes head (pathology re-probe).

Context: round-4 headline math — the layout fixes sped our own HR-everyframe
baseline 45%, so vs_baseline reads ~1.85 against the 13.98 ms/GOP AR program.
Wins must come from LR-side-only stages. The round-4 profile attributes
~0.53 ms/GOP to the LR stems' s2d transpose copies + ~0.29 ms to the frame
resize's post-W-pass relayout; resize_bilinear_s2d removes both (arm a).
The per-frame fuse loop (while.16, 3.3 ms/GOP) serializes 11 CReFF kernel
launches + heads; r3c measured creff n=11 fine STANDALONE but the full
program with a batched fuse crashed the round-3 toolchain worker — the
lr_chunk=2 sibling pathology is GONE on this toolchain
(bench_logs/r4queue_pathology.log), so re-probe (arm b, subprocess-isolated:
run `batched-fuse` as its own invocation, never inside a session you care
about).

Usage:
  python probes/r4/tools_probe_r4f.py safe          # arm (a) + bitwise checks
  python probes/r4/tools_probe_r4f.py batched-fuse  # arm (b), RISKY
"""
import copy
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.gop import ARPipeline
from arseg_tpu.gop.pipeline import _resize_flow_planes, _as_tuple
from arseg_tpu.ops.warp import pad_for_warp, warp_feature
from arseg_tpu.utils.tree import cast_f32

enable_compile_cache()

H, W, G = 720, 960, 12
DT = jnp.bfloat16
MODE = sys.argv[1] if len(sys.argv) > 1 else "safe"


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
    print(f"{name:24s} {t*1e3:8.2f} ms/call  ({G/t:7.1f} fps)", flush=True)
    return t


hr_model = build_model("camvid-bise18", fuse=False)
lr_model = build_model("camvid-bise18", fuse=True)
hrp = cast_f32(hr_model.init(jax.random.PRNGKey(0)), DT)
lrp = cast_f32(lr_model.init(jax.random.PRNGKey(1)), DT)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
fr = jnp.asarray(rng.randn(G - 1, H, W, 3).astype(np.float32))
fx = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))
fy = jnp.asarray(rng.uniform(-16, 16, (G - 1, H, W)).astype(np.float32))


def agreement(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float((a == b).mean())


if MODE == "safe":
    # --- on-TPU bit-identity of the fused resize form --------------------
    from arseg_tpu.ops import resize_bilinear
    from arseg_tpu.ops.resize import resize_bilinear_s2d

    def unsh(y):
        n, h, w, c = y.shape
        z = y.reshape(n, h // 2, 2, w // 2, 2, c)
        return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(
            n, h // 2, w // 2, 4 * c
        )

    for dt in (jnp.float32, jnp.bfloat16):
        x = fr.astype(dt)
        fused = jax.jit(
            lambda v: resize_bilinear_s2d(v, (H // 2, W // 2), True)
        )(x)
        comp = jax.jit(
            lambda v: unsh(resize_bilinear(v, (H // 2, W // 2), True))
        )(x)
        d = np.asarray(fused, np.float32) - np.asarray(comp, np.float32)
        print(f"resize_s2d {jnp.dtype(dt).name}: max|d|={np.abs(d).max():.3g} "
              f"bitwise={np.array_equal(np.asarray(fused), np.asarray(comp))}",
              flush=True)

    # --- production pipeline A/B ------------------------------------------
    lr_plain = copy.copy(lr_model)
    lr_plain.s2d_input = False
    pipe_plain = ARPipeline(hr_model, lr_plain, scale=0.5, dtype=DT)
    pipe_fused = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)
    t_plain = bench("plain resize+s2d", pipe_plain, hrp, lrp, kf, fr, (fx, fy))
    t_fused = bench("fused resize_s2d", pipe_fused, hrp, lrp, kf, fr, (fx, fy))
    a = agreement(
        pipe_plain(hrp, lrp, kf, fr, (fx, fy)),
        pipe_fused(hrp, lrp, kf, fr, (fx, fy)),
    )
    print(f"class-map agreement fused vs plain: {a:.6f}")
    print(f"delta {(t_plain - t_fused)*1e3:+.2f} ms/GOP", flush=True)

elif MODE == "batched-fuse":
    # RISKY: one n=11 CReFF launch + one batched planes head after the
    # per-frame warp map (the round-3 crash had the batched WARP; here the
    # warp stays per-frame — only fuse + head batch).
    pipe = ARPipeline(hr_model, lr_model, scale=0.5, dtype=DT)

    @jax.jit
    def batched_fuse_step(hp, lp, keyframe, frames, flows):
        fx_, fy_ = flows
        g1, h, w, _ = frames.shape
        hp2, lp2, keyframe, frames = pipe._cast((hp, lp, keyframe, frames))
        hr_out = _as_tuple(hr_model.apply(hp2, keyframe))
        key_logits, ref_feat = hr_out[0], hr_out[-1]
        fx2, fy2 = _resize_flow_planes((fx_, fy_), ref_feat.shape[1:3])
        x_lr = pipe._lr_input(frames, (int(h * 0.5), int(w * 0.5)))
        feat = _as_tuple(lr_model.forward_phase1(lp2, x_lr))[-1]
        ref_pad = pad_for_warp(ref_feat)
        warped = jax.lax.map(
            lambda a: warp_feature(
                ref_pad, (a[0][None], a[1][None]), prepadded=True
            )[0],
            (fx2, fy2),
        )
        preds = lr_model.forward_phase2_argmax(lp2, feat, warped)
        from arseg_tpu.ops import resize_bilinear

        key_logits = resize_bilinear(key_logits, (h, w), align_corners=True)
        preds = jnp.concatenate(
            [jnp.argmax(key_logits, axis=-1), preds], axis=0
        )
        return preds.astype(jnp.int32)

    t_b = bench("batched fuse+head", batched_fuse_step, hrp, lrp, kf, fr, (fx, fy))
    t_p = bench("production per-frame", pipe, hrp, lrp, kf, fr, (fx, fy))
    a = agreement(
        batched_fuse_step(hrp, lrp, kf, fr, (fx, fy)),
        pipe(hrp, lrp, kf, fr, (fx, fy)),
    )
    print(f"agreement batched vs production: {a:.6f}")
    print(f"delta {(t_p - t_b)*1e3:+.2f} ms/GOP", flush=True)
else:
    raise SystemExit(f"unknown mode {MODE}")
