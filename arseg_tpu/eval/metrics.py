"""Confusion-matrix mIoU, the reference's protocol bit-for-bit
(/root/reference `evaluation.py:127-137`): per-batch
bincount(label * n + pred) over non-ignored pixels accumulated into an
[n, n] histogram; IoU = diag / (col_sum + row_sum - diag); mIoU = plain mean
(classes absent from both label and prediction yield NaN there — replicated;
use nanmean=True for robust variants).

On a sharded eval the histogram is psum-reduced over the data axis — the
TPU-native equivalent of the reference's dormant dist.all_reduce
(`evaluation.py:134-135`).
"""

import jax
import jax.numpy as jnp


def confusion_update(hist, label, pred, n_classes: int, ignore_label: int = 255):
    """hist [n,n] += bincount over valid pixels. label/pred: int [...]."""
    label = label.reshape(-1)
    pred = pred.reshape(-1)
    keep = label != ignore_label
    idx = jnp.where(keep, label * n_classes + pred, 0)
    upd = jnp.zeros((n_classes * n_classes,), dtype=hist.dtype)
    upd = upd.at[idx].add(keep.astype(hist.dtype))
    return hist + upd.reshape(n_classes, n_classes)


def iou_from_hist(hist):
    diag = jnp.diagonal(hist)
    return diag / (hist.sum(axis=0) + hist.sum(axis=1) - diag)


def miou_from_hist(hist, nanmean: bool = False):
    ious = iou_from_hist(hist)
    return jnp.nanmean(ious) if nanmean else jnp.mean(ious)


def psum_hist(hist, axis_name: str = "data"):
    return jax.lax.psum(hist, axis_name)
