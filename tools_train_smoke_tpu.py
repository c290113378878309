"""Real-TPU training smoke: a few phase-2 FST steps (stage 2: teacher
forward + MV warp + CReFF merge + seg/cls/MSE losses + masked optimizer)
on the actual chip for both CamVid backbones. The CPU test suite covers
numerics; this validates the training stack's kernels/dtypes on hardware.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.models import build_model
from arseg_tpu.train.objectives import build_phase2_loss
from arseg_tpu.train.optim import make_optimizer, cosine_schedule
from arseg_tpu.train.step import make_train_step, masked_optimizer

enable_compile_cache()


def smoke(backend, model_type, crop_wh=(96, 64), steps=4):
    crop_w, crop_h = crop_wh
    batch = 2
    model = build_model(backend, fuse=True)
    teacher = build_model(backend, fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    teacher_params = teacher.init(jax.random.PRNGKey(1))
    frozen = ("final_conv",) if model_type == "pspnet" else ("conv_out.conv_out",)
    loss_fn = build_phase2_loss(
        model, teacher, model_type, "camvid", (crop_w, crop_h), scale=0.5,
        feat_loss="mse", stage2=True, with_motion=True,
    )
    optimizer = masked_optimizer(
        make_optimizer("adam", cosine_schedule(1e-3, 100)), params,
        frozen_prefixes=frozen,
    )
    step = make_train_step(loss_fn, optimizer)
    rng = np.random.RandomState(0)
    data = {
        "image": rng.randn(batch, crop_h, crop_w, 3).astype(np.float32),
        "label": rng.randint(0, 12, (batch, crop_h, crop_w)).astype(np.int32),
        "existence": np.ones((batch, 12), np.float32),
        "ref_image": rng.randn(batch, crop_h, crop_w, 3).astype(np.float32),
        "flow": rng.uniform(-4, 4, (batch, crop_h, crop_w, 2)).astype(np.float32),
    }
    opt_state = optimizer.init(params)
    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, teacher_params, data, sub)
        losses.append(float(metrics["loss"]))
    ok = np.all(np.isfinite(losses)) and losses[-1] < losses[0]
    print(f"{backend}: losses={['%.4f' % l for l in losses]} "
          f"{'OK (finite, decreasing)' if ok else 'PROBLEM'}", flush=True)
    return ok


if __name__ == "__main__":
    ok1 = smoke("camvid-psp18", "pspnet")
    ok2 = smoke("camvid-bise18", "bisenet")
    print("DONE", "PASS" if (ok1 and ok2) else "FAIL", flush=True)
