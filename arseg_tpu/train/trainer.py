"""Training drivers: phase-1 (HR / plain-LR image model, reference
`train.py:77-307`) and phase-2 (LR + CReFF + FST, `train_pair.py:91-429`).

Differences from the reference, by design:
  * hard-coded per-dataset policy (cropsize, scales, losses, optimizer kind,
    teacher checkpoint dirs) lives in DATASET_POLICY / explicit flags instead
    of inline code;
  * checkpoints carry explicit metadata (+ optimizer state for true resume)
    instead of filename-encoded scale/epoch — while still writing the
    reference-compatible 'PSPNet_{backend}_{scale}_{epoch}_' names so the
    eval protocol's scale-token discovery keeps working;
  * data parallelism is batch sharding over a jax 'data' mesh (see
    parallel/mesh.py), not nn.DataParallel.
"""

import os

import jax
import numpy as np

from arseg_tpu.data import CamVid, CamVidWithFlow, CityScapes, CityScapesWithFlow, Loader
from arseg_tpu.eval.engine import EvalConstRes, EvalAlterRes
from arseg_tpu.nn.bisenet import BiSeNetV1
from arseg_tpu.nn.pspnet import PSPNet
from arseg_tpu.nn.pspnet_semseg import PSPNetSemseg
from arseg_tpu.parallel import data_mesh, replicate
from arseg_tpu.train.objectives import build_phase1_loss, build_phase2_loss
from arseg_tpu.train.optim import (
    cosine_schedule,
    warmup_cosine_schedule,
    make_optimizer,
    t_max_for,
)
from arseg_tpu.train.step import make_train_step, masked_optimizer
from arseg_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from arseg_tpu.utils.torch_convert import load_torch_checkpoint

DATASET_POLICY = {
    "camvid": dict(
        cropsize=(960, 720),
        randomscale=(0.5, 0.675, 0.75, 0.875, 1.0, 1.25, 1.5, 1.75, 2.0, 2.5),
        n_classes=12,
        optimizer="adam",
        train_workers=8,
        val_workers=4,
    ),
    "cityscapes": dict(
        cropsize=(512, 1024),
        randomscale=(0.5, 0.75, 0.875, 1.0, 1.25, 1.5, 1.75, 2.0),
        n_classes=19,
        optimizer="sgd",
        train_workers=16,
        val_workers=4,
    ),
}

FINAL_CONV_PATH = {
    ("pspnet", "camvid"): "final_conv",
    ("pspnet", "cityscapes"): "cls.4",
    ("bisenet", "camvid"): "conv_out.conv_out",
    ("bisenet", "cityscapes"): "conv_out.conv_out",
}

PSP_SIZES = {
    "resnet18": (512, 256),
    "resnet34": (512, 256),
    "resnet50": (2048, 1024),
    "resnet101": (2048, 1024),
    "resnet152": (2048, 1024),
    "densenet": (1024, 512),
    "squeezenet": (512, 256),
}


def _compute_dtype(train_dtype):
    """'bfloat16' -> jnp.bfloat16 mixed-precision compute (see
    train/step.py); None/'float32' -> pure-f32 reference-parity mode."""
    if train_dtype in (None, "float32"):
        return None
    import jax.numpy as jnp

    return jnp.dtype(train_dtype)


def build_train_model(model_type, dataset, backend, n_classes, fuse, **kw):
    """Reference model registries (`train.py:141-170`, `train_pair.py:176-254`)."""
    if model_type == "pspnet":
        if dataset == "camvid":
            psp_size, deep = PSP_SIZES[backend]
            return PSPNet(
                n_classes=n_classes,
                psp_size=psp_size,
                deep_features_size=deep,
                backend=backend,
                fuse_version=kw.get("fuse_version", 1) if fuse else 0,
                attention_type=kw.get("atten_type", "local"),
                atten_k=kw.get("atten_k", 7),
            )
        return PSPNetSemseg(
            layers=int(backend.replace("resnet", "")),
            classes=n_classes,
            feat_dim=PSP_SIZES[backend][0],
            with_fuse=fuse,
            attention_type=kw.get("atten_type", "local"),
            atten_k=kw.get("atten_k", 7),
        )
    return BiSeNetV1(
        n_classes=n_classes,
        backend=backend,
        with_fuse=fuse,
        attention_type=kw.get("atten_type", "local"),
        atten_k=kw.get("atten_k", 7),
    )


def _load_params(path, backend_key=None):
    if path.endswith(".pth"):
        return load_torch_checkpoint(path, backend_key)
    return load_checkpoint(path)["params"]


def _apply_resume(resume, opt_state, verbose):
    """True resume from a checkpoint written by these trainers: restores
    params, optimizer state (incl. the schedule's step counter) and the
    epoch / best-mIoU cursors. Distinct from `snapshot`, which keeps the
    reference semantics (warm-start weights, fresh optimizer + warmup
    schedule). Two caveats, by design: the trainers save only on val-mIoU
    improvement, so resume continues from the *best* epoch, not the crash
    epoch; and the rng stream is re-seeded rather than replayed, so a
    resumed run is deterministic but not bit-identical to an uninterrupted
    one. Returns (params, opt_state, start_epoch, max_miou)."""
    ck = load_checkpoint(resume, opt_state_template=opt_state)
    if "opt_state" not in ck:
        raise ValueError(
            f"--resume checkpoint {resume!r} has no optimizer state; "
            "use --snapshot to warm-start from weights alone"
        )
    meta = ck.get("metadata") or {}
    start_epoch = int(meta.get("epoch", 0))
    max_miou = float(meta.get("miou", 0.0))
    if verbose:
        print(
            f"resuming from {resume}: epoch {start_epoch}, "
            f"best mIoU {max_miou:.4f}",
            flush=True,
        )
    return ck["params"], ck["opt_state"], start_epoch, max_miou


def _graft_final_conv(params, teacher_params, path):
    """load_decoder equivalent (`train.py:51-59`): copy the teacher's
    final_conv into the student tree. Copy-on-write along the grafted path —
    the caller's tree is never mutated (params dicts may be shared/reused)."""
    node = teacher_params
    for part in path.split("."):
        node = node[part]

    def rebuild(tree, parts):
        out = dict(tree)
        out[parts[0]] = dict(node) if len(parts) == 1 else rebuild(tree[parts[0]], parts[1:])
        return out

    return rebuild(params, path.split("."))


class TrainLoop:
    """Shared epoch-loop machinery for both phases."""

    def __init__(self, mesh=None, log_every=50, verbose=True):
        self.mesh = mesh if mesh is not None else data_mesh()
        self.log_every = log_every
        self.verbose = verbose

    def run_epoch(self, step_fn, params, opt_state, teacher_params, loader, rng, epoch):
        losses = []

        def staged():
            # H2D staged 2 batches ahead (async device_put overlaps the
            # transfer with the previous steps' compute; data/loader.py)
            from arseg_tpu.data.loader import device_prefetch

            def keep(b):
                return {
                    k: v
                    for k, v in b.items()
                    if k in ("image", "label", "existence", "ref_image", "flow")
                }

            it = (keep(b) for b in loader)
            sharding = None
            if self.mesh.devices.size > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                # stage ahead WITH the data sharding (a lazy shard_batch at
                # the loop head gives up the 2-batch lookahead)
                sharding = NamedSharding(self.mesh, PartitionSpec("data"))
            return device_prefetch(it, size=2, sharding=sharding)

        for i, batch in enumerate(staged()):
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step_fn(params, opt_state, teacher_params, batch, sub)
            losses.append(metrics["loss"])
            if self.verbose and i % self.log_every == 0:
                print(
                    f"[{epoch + 1}] it {i}: loss={float(metrics['loss']):.5f}",
                    flush=True,
                )
        mean_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")
        return params, opt_state, rng, mean_loss


def train_phase1(
    data_path,
    models_path,
    backend="resnet34",
    snapshot=None,
    batch_size=16,
    alpha=1.0,
    epochs=20,
    start_lr=1e-3,
    scale=1.0,
    feat_loss=None,
    dataset="camvid",
    model_type="pspnet",
    teacher_snapshot=None,
    seed=233,
    num_devices=None,
    num_workers=None,
    verbose=True,
    eval_every=1,
    cropsize=None,
    randomscale=None,
    bn_mode="sync",
    accum_steps=1,
    train_dtype=None,
    resume=None,
    nanmean=False,
):
    if resume and snapshot:
        raise ValueError("resume and snapshot are mutually exclusive: resume "
                         "restores a full trainer state, snapshot warm-starts "
                         "weights with a fresh optimizer")
    policy = DATASET_POLICY[dataset]
    os.makedirs(models_path, exist_ok=True)
    cropsize = cropsize or policy["cropsize"]
    randomscale = randomscale or policy["randomscale"]
    n_classes = policy["n_classes"]
    compute_dtype = _compute_dtype(train_dtype)

    if dataset == "camvid":
        train_ds = CamVid(data_path, cropsize=cropsize, mode="train", randomscale=randomscale)
        val_ds = CamVid(data_path, mode="val")
    else:
        train_ds = CityScapes(data_path, model_type=model_type, cropsize=cropsize,
                              mode="train", randomscale=randomscale)
        val_ds = CityScapes(data_path, model_type=model_type, mode="val")

    train_loader = Loader(train_ds, batch_size=batch_size, shuffle=True,
                          num_workers=num_workers or policy["train_workers"],
                          drop_last=True, seed=seed)
    val_loader = Loader(val_ds, batch_size=1, shuffle=False,
                        num_workers=policy["val_workers"], drop_last=True)

    model = build_train_model(model_type, dataset, backend, n_classes, fuse=False)
    key = jax.random.PRNGKey(seed)
    params = _load_params(snapshot) if snapshot else model.init(key)

    teacher_model, teacher_params = None, None
    frozen = ()
    if feat_loss:
        if teacher_snapshot is None:
            raise ValueError("feat_loss requires --teacher_snapshot")
        teacher_model = model
        teacher_params = _load_params(teacher_snapshot)
        fc = FINAL_CONV_PATH[(model_type, dataset)]
        params = _graft_final_conv(params, teacher_params, fc)
        if not snapshot:
            frozen = (fc,)

    t_max = t_max_for(epochs, len(train_ds), batch_size)
    if snapshot:
        schedule = warmup_cosine_schedule(start_lr, 1e-5, 500, t_max)
        base = make_optimizer("adam", schedule)
    else:
        schedule = cosine_schedule(start_lr, t_max)
        base = make_optimizer(policy["optimizer"], schedule)
    optimizer = masked_optimizer(base, params, frozen)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if resume:
        params, opt_state, start_epoch, max_miou0 = _apply_resume(
            resume, opt_state, verbose
        )

    loss_fn = build_phase1_loss(model, model_type, dataset, cropsize, scale,
                                alpha, feat_loss, teacher_model)
    mesh = data_mesh(num_devices, batch_size)
    step_fn = make_train_step(loss_fn, optimizer, mesh=mesh, bn_mode=bn_mode,
                              accum_steps=accum_steps, compute_dtype=compute_dtype)
    loop = TrainLoop(mesh, verbose=verbose)
    params = replicate(params, loop.mesh)

    evaluator = EvalConstRes(scale=scale, ignore_label=255, nanmean=nanmean)
    rng = jax.random.fold_in(jax.random.PRNGKey(seed + 1), start_epoch)
    max_miou, history = (max_miou0 if resume else 0.0), []
    for epoch in range(start_epoch, epochs):
        params, opt_state, rng, mean_loss = loop.run_epoch(
            step_fn, params, opt_state, teacher_params, train_loader, rng, epoch
        )
        if (epoch + 1) % eval_every:
            continue
        miou = evaluator(model, params, val_loader, n_classes)
        history.append(dict(epoch=epoch, loss=mean_loss, miou=miou))
        if verbose:
            print(f"epoch {epoch}: val mIoU {miou:.4f}, max {max_miou:.4f}", flush=True)
        if miou > max_miou:
            max_miou = miou
            save_checkpoint(
                os.path.join(models_path, f"PSPNet_{backend}_{scale}_{epoch + 1}_.npz"),
                params,
                metadata=dict(dataset=dataset, backend=backend, scale=scale,
                              epoch=epoch + 1, miou=miou, phase=1),
                opt_state=opt_state,
            )
    return params, history


def train_phase2(
    data_path,
    sequence_path,
    models_path,
    backend="resnet34",
    snapshot=None,
    batch_size=16,
    alpha=1.0,
    epochs=20,
    start_lr=1e-3,
    scale=1.0,
    feat_loss="mse",
    atten_type="local",
    atten_k=7,
    stage1_epoch=50,
    ref_gap=2,
    bitrate=3,
    with_motion=True,
    model_type="pspnet",
    dataset="camvid",
    fuse_version=1,
    teacher_snapshot=None,
    seed=689,
    num_devices=None,
    num_workers=None,
    verbose=True,
    eval_every=1,
    flow_shape=None,
    cropsize=None,
    randomscale=None,
    bn_mode="sync",
    accum_steps=1,
    train_dtype=None,
    resume=None,
    nanmean=False,
):
    if resume and snapshot:
        raise ValueError("resume and snapshot are mutually exclusive: resume "
                         "restores a full trainer state, snapshot warm-starts "
                         "weights with a fresh optimizer")
    policy = DATASET_POLICY[dataset]
    os.makedirs(models_path, exist_ok=True)
    cropsize = cropsize or policy["cropsize"]
    randomscale = randomscale or policy["randomscale"]
    n_classes = policy["n_classes"]
    compute_dtype = _compute_dtype(train_dtype)

    mv_dir = os.path.join(
        sequence_path, f"{bitrate}M-GOP{ref_gap}", f"MVmap_GOP{ref_gap}_dist_{ref_gap - 1}"
    )
    ref_dir = os.path.join(sequence_path, f"{bitrate}M-GOP{ref_gap}", "frames")
    flow_kw = {"flow_shape": flow_shape} if flow_shape else {}
    if dataset == "camvid":
        if with_motion:
            train_ds = CamVidWithFlow(
                data_path, cropsize=cropsize, mode="train",
                randomscale=randomscale, load_pair=True,
                ref_gap=ref_gap, flow_path=mv_dir, ref_path=ref_dir, **flow_kw,
            )
            val_ds = CamVidWithFlow(
                data_path, mode="val", load_pair=True, ref_gap=ref_gap,
                flow_path=mv_dir, ref_path=ref_dir, **flow_kw,
            )
        else:
            train_ds = CamVid(data_path, cropsize=cropsize, mode="train",
                              randomscale=randomscale, load_pair=True,
                              ref_gap=ref_gap, ref_path=ref_dir)
            val_ds = CamVid(data_path, mode="val", load_pair=True,
                            ref_gap=ref_gap, ref_path=ref_dir)
        val_ds_stage1 = CamVid(data_path, mode="val")
    else:
        if not with_motion:
            raise NotImplementedError("cityscapes phase-2 requires motion vectors")
        train_ds = CityScapesWithFlow(
            data_path, model_type=model_type, cropsize=cropsize, mode="train",
            randomscale=randomscale, ref_gap=ref_gap, flow_path=mv_dir,
        )
        val_ds = CityScapesWithFlow(
            data_path, model_type=model_type, mode="val", ref_gap=ref_gap, flow_path=mv_dir,
        )
        val_ds_stage1 = CityScapes(data_path, model_type=model_type, mode="val")

    train_loader = Loader(train_ds, batch_size=batch_size, shuffle=True,
                          num_workers=num_workers or policy["train_workers"],
                          drop_last=True, seed=seed)
    val_loader = Loader(val_ds, batch_size=1, shuffle=False,
                        num_workers=policy["val_workers"], drop_last=True)
    val_loader_stage1 = Loader(val_ds_stage1, batch_size=1, shuffle=False,
                               num_workers=4, drop_last=True)

    kw = dict(atten_type=atten_type, atten_k=atten_k, fuse_version=fuse_version)
    model = build_train_model(model_type, dataset, backend, n_classes, fuse=True, **kw)
    # The teacher is built from the SAME fuse class as the student
    # (reference `train_pair.py:178-254` constructs highres_net from the
    # fuse registry for every model_type/fuse_version): its normal-mode
    # forward then taps the feature at the STUDENT'S fusion depth — the
    # 512-ch backbone feature for camvid fuse_version=2, the stem for V3,
    # the 512-ch pre-final-conv feature for cityscapes-pspnet (the plain
    # semseg model returns only (out, aux) — no feature at all). The fuse
    # params the teacher tree lacks are never touched in normal mode.
    teacher_model = build_train_model(model_type, dataset, backend, n_classes, fuse=True, **kw)

    if teacher_snapshot is None:
        raise ValueError("phase 2 requires --teacher_snapshot (the HR model)")
    backend_key = f"{dataset}-{'psp' if model_type == 'pspnet' else 'bise'}{backend.replace('resnet', '')}"
    teacher_params = _load_params(teacher_snapshot, backend_key)

    key = jax.random.PRNGKey(seed)
    params = _load_params(snapshot, backend_key) if snapshot else model.init(key)

    frozen = ()
    fc = FINAL_CONV_PATH[(model_type, dataset)]
    if feat_loss:
        params = _graft_final_conv(params, teacher_params, fc)
        if not snapshot:
            frozen = (fc,)

    t_max = t_max_for(epochs, len(train_ds), batch_size)
    if snapshot:
        schedule = warmup_cosine_schedule(start_lr, 1e-5, 500, t_max)
        base = make_optimizer("adam", schedule)
    else:
        schedule = cosine_schedule(start_lr, t_max)
        base = make_optimizer(policy["optimizer"], schedule)
    optimizer = masked_optimizer(base, params, frozen)
    opt_state = optimizer.init(params)
    start_epoch = 0
    if resume:
        params, opt_state, start_epoch, max_miou0 = _apply_resume(
            resume, opt_state, verbose
        )

    mk_loss = lambda stage2: build_phase2_loss(
        model, teacher_model, model_type, dataset, cropsize, scale,
        alpha, feat_loss, stage2, with_motion,
    )
    mesh = data_mesh(num_devices, batch_size)
    step_stage1 = make_train_step(mk_loss(False), optimizer, mesh=mesh,
                                  bn_mode=bn_mode, accum_steps=accum_steps,
                                  compute_dtype=compute_dtype)
    step_stage2 = make_train_step(mk_loss(True), optimizer, mesh=mesh,
                                  bn_mode=bn_mode, accum_steps=accum_steps,
                                  compute_dtype=compute_dtype)

    loop = TrainLoop(mesh, verbose=verbose)
    params = replicate(params, loop.mesh)

    eval_stage2 = EvalAlterRes(scale=scale, ignore_label=255, nanmean=nanmean)
    eval_stage1 = EvalConstRes(scale=scale, ignore_label=255, nanmean=nanmean)
    rng = jax.random.fold_in(jax.random.PRNGKey(seed + 1), start_epoch)
    max_miou, history = (max_miou0 if resume else 0.0), []
    for epoch in range(start_epoch, epochs):
        stage2 = epoch >= stage1_epoch
        step_fn = step_stage2 if stage2 else step_stage1
        params, opt_state, rng, mean_loss = loop.run_epoch(
            step_fn, params, opt_state, teacher_params, train_loader, rng, epoch
        )
        if (epoch + 1) % eval_every:
            continue
        if stage2:
            miou = eval_stage2(teacher_model, teacher_params, model, params, val_loader, n_classes)
        else:
            miou = eval_stage1(model, params, val_loader_stage1, n_classes)
        history.append(dict(epoch=epoch, loss=mean_loss, miou=miou, stage=2 if stage2 else 1))
        if verbose:
            print(f"epoch {epoch}: val mIoU {miou:.4f}, max {max_miou:.4f}", flush=True)
        if miou > max_miou:
            max_miou = miou
            save_checkpoint(
                os.path.join(models_path, f"PSPNet_{backend}_{scale}_{epoch + 1}_.npz"),
                params,
                metadata=dict(dataset=dataset, backend=backend, scale=scale,
                              epoch=epoch + 1, miou=miou, phase=2,
                              stage=2 if stage2 else 1, ref_gap=ref_gap),
                opt_state=opt_state,
            )
    return params, history
