"""Evaluation engines: the reference's EvalConstRes / EvalAlterRes
(/root/reference `evaluation.py:90-215`) as jit-compiled device steps over a
host loader.

EvalConstRes: downscale input (bilinear align_corners=True) -> forward ->
upsample logits to label size (align_corners=True) -> argmax -> confusion
histogram. (softmax before argmax in the reference is monotone — elided.)

EvalAlterRes (the AR flagship path): HR net on the decoded keyframe -> take
its [-1] feature -> MV magnitude-rescale + bilinear resize to the feature
grid -> warp -> LR branch phase1 on the downscaled frame -> CReFF phase2 ->
upsample logits -> histogram.

TPU notes: each distinct input shape compiles once (shapes are fixed per
dataset in the protocol); the histogram stays on device across the whole
loop and comes back once.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from arseg_tpu.eval.metrics import confusion_update, miou_from_hist
from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow


def _as_tuple(x):
    return x if isinstance(x, tuple) else (x,)


@functools.lru_cache(maxsize=64)
def _const_step(model, scale, n_classes, ignore_label):
    @jax.jit
    def step(params, hist, image, label):
        h, w = image.shape[1], image.shape[2]
        x = resize_bilinear(image, (int(h * scale), int(w * scale)), align_corners=True)
        logits = _as_tuple(model.apply(params, x))[0]
        logits = resize_bilinear(logits, label.shape[1:3], align_corners=True)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return confusion_update(hist, label, pred, n_classes, ignore_label)

    return step


@functools.lru_cache(maxsize=64)
def _alter_step(highres_model, model, scale, n_classes, ignore_label):
    @jax.jit
    def step(hr_params, params, hist, image, label, ref_image, fx, fy):
        ref_feat = _as_tuple(highres_model.apply(hr_params, ref_image))[-1]
        # flow arrives as host-split (fx, fy) planes — a packed [..., 2]
        # array costs a ~3.7 ms/frame lane relayout on device
        f = scale_and_resize_flow((fx, fy), ref_feat.shape[1:3], mode="bilinear", split=True)
        warped = warp_feature(ref_feat, f)

        h, w = image.shape[1], image.shape[2]
        x = resize_bilinear(image, (int(h * scale), int(w * scale)), align_corners=True)
        feat = _as_tuple(model.forward_phase1(params, x))[-1]
        if (
            hasattr(model, "forward_phase2_argmax")
            and warped.shape[1:3] == tuple(label.shape[1:3])
        ):
            # same fused phase-2 + argmax path the AR pipeline serves with
            # (the logit upsample is the identity; log_softmax is monotonic)
            pred = model.forward_phase2_argmax(params, feat, warped)
        else:
            out, _ = model.forward_phase2(params, feat, warped)
            logits = resize_bilinear(out, label.shape[1:3], align_corners=True)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return confusion_update(hist, label, pred, n_classes, ignore_label)

    return step


class EvalConstRes:
    def __init__(self, scale=0.5, ignore_label=255, nanmean=False):
        self.scale = scale
        self.ignore_label = ignore_label
        self.nanmean = nanmean

    def __call__(self, model, params, loader, n_classes, progress=None):
        step = _const_step(model, self.scale, n_classes, self.ignore_label)
        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        for batch in loader:
            hist = step(params, hist, batch["image"], batch["label"])
            if progress:
                progress()
        return float(miou_from_hist(hist, self.nanmean))


class EvalAlterRes:
    def __init__(self, scale=0.5, ignore_label=255, nanmean=False):
        self.scale = scale
        self.ignore_label = ignore_label
        self.nanmean = nanmean

    def __call__(self, highres_model, hr_params, model, params, loader, n_classes, progress=None):
        step = _alter_step(highres_model, model, self.scale, n_classes, self.ignore_label)
        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        for batch in loader:
            flow = np.asarray(batch["flow"])
            hist = step(
                hr_params,
                params,
                hist,
                batch["image"],
                batch["label"],
                batch["ref_image"],
                np.ascontiguousarray(flow[..., 0]),
                np.ascontiguousarray(flow[..., 1]),
            )
            if progress:
                progress()
        return float(miou_from_hist(hist, self.nanmean))
