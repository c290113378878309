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

Sharded mode (`mesh=`): frames are sharded over the 1-D 'data' mesh axis
(shard_map) and each device's confusion histogram is psum-reduced — the
live TPU equivalent of the reference's dormant dist.all_reduce
(`evaluation.py:134-135`). Ragged batches are padded with ignore-label
frames (zero histogram contribution).

`dtype=jnp.bfloat16` casts the frames at the step boundary — the model
weights follow the input dtype — for serving-mode accuracy measurement
(f32 is the parity mode).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from arseg_tpu.eval.metrics import confusion_update, miou_from_hist, psum_hist
from arseg_tpu.models import phase2_argmax_head
from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow


def _as_tuple(x):
    return x if isinstance(x, tuple) else (x,)


def _pad_rows(arrs, pad, label_key, ignore_label):
    """Pad dict-of-arrays with `pad` extra rows along dim 0; padded frames
    get label == ignore_label so they contribute nothing to the histogram."""
    if pad == 0:
        return arrs
    out = {}
    for k, v in arrs.items():
        pw = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        if k == label_key:
            out[k] = np.pad(np.asarray(v), pw, constant_values=ignore_label)
        else:
            out[k] = np.pad(np.asarray(v), pw)
    return out


def _pad_to_multiple(arrs, n, label_key, ignore_label):
    b = next(iter(arrs.values())).shape[0]
    return _pad_rows(arrs, (-b) % n, label_key, ignore_label)


def _equalized(it, label_key, ignore_label):
    """Pad any batch smaller than the first one (the ragged tail — the
    protocol never drops samples, reference `evaluation.py` is batch-1) up
    to the first batch's row count: every step shares ONE compiled shape
    and padded frames are ignore-label inert."""
    first = None
    for arrs in it:
        b = next(iter(arrs.values())).shape[0]
        if first is None:
            first = b
        elif b < first:
            arrs = _pad_rows(arrs, first - b, label_key, ignore_label)
        yield arrs


def _const_hist(model, scale, n_classes, ignore_label, dtype):
    def local(params, image, label):
        if dtype is not None:
            image = image.astype(dtype)
        h, w = image.shape[1], image.shape[2]
        x = resize_bilinear(image, (int(h * scale), int(w * scale)), align_corners=True)
        logits = _as_tuple(model.apply(params, x))[0]
        logits = resize_bilinear(logits, label.shape[1:3], align_corners=True)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        return confusion_update(hist, label, pred, n_classes, ignore_label)

    return local


@functools.lru_cache(maxsize=64)
def _const_step(model, scale, n_classes, ignore_label, dtype, mesh):
    local = _const_hist(model, scale, n_classes, ignore_label, dtype)
    if mesh is not None:
        body = shard_map(
            lambda p, im, lb: psum_hist(local(p, im, lb)),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
    else:
        body = local

    @jax.jit
    def step(params, hist, image, label):
        return hist + body(params, image, label)

    return step


def _alter_hist(highres_model, model, scale, n_classes, ignore_label, dtype):
    def local(hr_params, params, image, label, ref_image, fx, fy):
        if dtype is not None:
            image = image.astype(dtype)
            ref_image = ref_image.astype(dtype)
        ref_feat = _as_tuple(highres_model.apply(hr_params, ref_image))[-1]
        # flow arrives as host-split (fx, fy) planes — a packed [..., 2]
        # array costs a ~3.7 ms/frame lane relayout on device
        f = scale_and_resize_flow((fx, fy), ref_feat.shape[1:3], mode="bilinear", split=True)
        warped = warp_feature(ref_feat, f)

        h, w = image.shape[1], image.shape[2]
        x = resize_bilinear(image, (int(h * scale), int(w * scale)), align_corners=True)
        feat = _as_tuple(model.forward_phase1(params, x))[-1]
        # same fused phase-2 + argmax path the AR pipeline serves with
        # (shared dispatch predicate: models.phase2_argmax_head)
        head = phase2_argmax_head(model, warped.shape[1:3], label.shape[1:3])
        if head is not None:
            pred = head(params, feat, warped)
        else:
            out, _ = model.forward_phase2(params, feat, warped)
            logits = resize_bilinear(out, label.shape[1:3], align_corners=True)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        return confusion_update(hist, label, pred, n_classes, ignore_label)

    return local


@functools.lru_cache(maxsize=64)
def _alter_step(highres_model, model, scale, n_classes, ignore_label, dtype, mesh):
    local = _alter_hist(highres_model, model, scale, n_classes, ignore_label, dtype)
    if mesh is not None:
        body = shard_map(
            lambda hp, p, im, lb, ri, fx, fy: psum_hist(local(hp, p, im, lb, ri, fx, fy)),
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P("data")),
            out_specs=P(),
        )
    else:
        body = local

    @jax.jit
    def step(hr_params, params, hist, image, label, ref_image, fx, fy):
        return hist + body(hr_params, params, image, label, ref_image, fx, fy)

    return step


def _staged(loader, prep, mesh, prefetch, ignore_label):
    """Host-prep each batch then stage it on device `prefetch` steps ahead
    (data/loader.py device_prefetch): the H2D transfer of batch k+1 overlaps
    the device compute of batch k — the eval-side double-buffered HBM
    prefetch (SURVEY §7.5). In sharded mode batches are placed with the
    'data' NamedSharding so the shard_map step starts with zero relayout."""
    it = _equalized((prep(b) for b in loader), "label", ignore_label)
    if prefetch <= 0:
        return it
    from arseg_tpu.data.loader import device_prefetch

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        sharding = NamedSharding(mesh, P("data"))
    return device_prefetch(it, size=prefetch, sharding=sharding)


class EvalConstRes:
    def __init__(self, scale=0.5, ignore_label=255, nanmean=False, mesh=None,
                 dtype=None, prefetch=2):
        self.scale = scale
        self.ignore_label = ignore_label
        self.nanmean = nanmean
        self.mesh = mesh
        self.dtype = dtype
        self.prefetch = prefetch

    def __call__(self, model, params, loader, n_classes, progress=None):
        step = _const_step(model, self.scale, n_classes, self.ignore_label,
                           self.dtype, self.mesh)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1

        def prep(batch):
            if n_dev > 1:
                batch = _pad_to_multiple(batch, n_dev, "label", self.ignore_label)
            return {"image": batch["image"], "label": batch["label"]}

        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        for batch in _staged(loader, prep, self.mesh, self.prefetch, self.ignore_label):
            hist = step(params, hist, batch["image"], batch["label"])
            if progress:
                progress()
        return float(miou_from_hist(hist, self.nanmean))


class EvalAlterRes:
    def __init__(self, scale=0.5, ignore_label=255, nanmean=False, mesh=None,
                 dtype=None, prefetch=2):
        self.scale = scale
        self.ignore_label = ignore_label
        self.nanmean = nanmean
        self.mesh = mesh
        self.dtype = dtype
        self.prefetch = prefetch

    def __call__(self, highres_model, hr_params, model, params, loader, n_classes, progress=None):
        step = _alter_step(highres_model, model, self.scale, n_classes,
                           self.ignore_label, self.dtype, self.mesh)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1

        def prep(batch):
            flow = np.asarray(batch["flow"])
            batch = {
                "image": batch["image"],
                "label": batch["label"],
                "ref_image": batch["ref_image"],
                "fx": np.ascontiguousarray(flow[..., 0]),
                "fy": np.ascontiguousarray(flow[..., 1]),
            }
            if n_dev > 1:
                batch = _pad_to_multiple(batch, n_dev, "label", self.ignore_label)
            return batch

        hist = jnp.zeros((n_classes, n_classes), dtype=jnp.float32)
        for batch in _staged(loader, prep, self.mesh, self.prefetch, self.ignore_label):
            hist = step(
                hr_params,
                params,
                hist,
                batch["image"],
                batch["label"],
                batch["ref_image"],
                batch["fx"],
                batch["fy"],
            )
            if progress:
                progress()
        return float(miou_from_hist(hist, self.nanmean))
