"""Training objectives: phase-1 (`train.py:209-298`) and phase-2 FST+CReFF
(`train_pair.py:290-410`) loss builders.

Each builder returns loss_fn(params, teacher_params, batch, ctx) ->
(loss, metrics-dict). Teacher forwards always run in eval mode (frozen BN
stats, no dropout) under stop_gradient — the reference wraps them in
torch.no_grad with teacher.eval().
"""

import jax
import jax.numpy as jnp

from arseg_tpu.nn import functional as Fn
from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow
from arseg_tpu.train import losses as L


def _teacher_feat(teacher_model, teacher_params, x):
    out = teacher_model.apply(teacher_params, x, Fn.Ctx(train=False))
    return jax.lax.stop_gradient(out[-1])


def _seg_losses(model_type, dataset, outputs, batch, out_hw, alpha):
    """Common per-model seg-loss wiring; returns (loss, out_p, metrics)."""
    y = batch["label"]
    if model_type == "pspnet":
        out, out_cls, out_p = outputs[0], outputs[1], outputs[2]
        out = resize_bilinear(out, out_hw, align_corners=True)
        if dataset == "camvid":
            seg = L.nll_loss(out, y)
            cls = L.bce_with_logits(out_cls, batch["existence"])
            return seg + alpha * cls, out_p, {"seg_loss": seg, "cls_loss": cls}
        aux = resize_bilinear(out_cls, out_hw, align_corners=True)
        seg = L.cross_entropy(out, y)
        auxl = L.cross_entropy(aux, y)
        return seg + 0.4 * auxl, out_p, {"seg_loss": seg, "aux_loss": auxl}
    # bisenet: triple OHEM
    out, out16, out32, out_p = outputs
    out = resize_bilinear(out, out_hw, align_corners=True)
    out16 = resize_bilinear(out16, out_hw, align_corners=True)
    out32 = resize_bilinear(out32, out_hw, align_corners=True)
    l0, l16, l32 = L.ohem_ce(out, y), L.ohem_ce(out16, y), L.ohem_ce(out32, y)
    return l0 + l16 + l32, out_p, {"seg_loss": l0}


def build_phase1_loss(
    model,
    model_type,
    dataset,
    cropsize_wh,
    scale,
    alpha=1.0,
    feat_loss=None,
    teacher_model=None,
):
    ch, cw = cropsize_wh[1], cropsize_wh[0]
    sh, sw = int(ch * scale), int(cw * scale)

    def loss_fn(params, teacher_params, batch, ctx):
        x_full = batch["image"]
        feat_target = None
        if feat_loss:
            hp = _teacher_feat(teacher_model, teacher_params, x_full)
            feat_target = resize_bilinear(hp, (sh, sw), align_corners=True)

        x = resize_bilinear(x_full, (sh, sw), align_corners=True)
        if model_type == "pspnet" and dataset == "cityscapes":
            outputs = model.apply(params, x, ctx)
            # plain semseg returns (out, aux); WithFuse returns (out, aux, p)
            outputs = (outputs[0], outputs[1], outputs[-1] if len(outputs) > 2 else None)
        else:
            outputs = model.apply(params, x, ctx)
        loss, out_p, metrics = _seg_losses(model_type, dataset, outputs, batch, (ch, cw), alpha)

        if feat_loss == "mse":
            fl = L.mse(feat_target, out_p)
            loss = loss + fl
            metrics["feat_loss"] = fl
        elif feat_loss == "KL":
            fl = L.kl_div_log_target(feat_target, out_p)
            loss = loss + fl
            metrics["feat_loss"] = fl
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def build_phase2_loss(
    model,
    teacher_model,
    model_type,
    dataset,
    cropsize_wh,
    scale,
    alpha=1.0,
    feat_loss="mse",
    stage2=False,
    with_motion=True,
):
    ch, cw = cropsize_wh[1], cropsize_wh[0]
    sh, sw = int(ch * scale), int(cw * scale)

    def loss_fn(params, teacher_params, batch, ctx):
        x_full = batch["image"]
        highres_p = _teacher_feat(teacher_model, teacher_params, x_full)

        x = resize_bilinear(x_full, (sh, sw), align_corners=True)
        if stage2:
            ref_p = _teacher_feat(teacher_model, teacher_params, batch["ref_image"])
            if with_motion:
                # train path uses NEAREST flow resampling (train_pair.py:345-348)
                f = scale_and_resize_flow(batch["flow"], ref_p.shape[1:3], mode="nearest", split=True)
                ref_p = warp_feature(ref_p, f)
            outputs = model.apply(params, x, ctx, mode="merge", ref_p=ref_p)
        else:
            outputs = model.apply(params, x, ctx, mode="normal")

        loss, out_p, metrics = _seg_losses(model_type, dataset, outputs, batch, (ch, cw), alpha)

        out_p = resize_bilinear(out_p, highres_p.shape[1:3], align_corners=True)
        if feat_loss == "mse":
            fl = L.mse(highres_p, out_p)
            loss = loss + fl
            metrics["feat_loss"] = fl
        elif feat_loss == "KL":
            fl = L.kl_div_log_target(highres_p, out_p)
            loss = loss + fl
            metrics["feat_loss"] = fl
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn
