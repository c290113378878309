"""Phase-2 (FST + CReFF) training CLI (flag surface of reference
`train_pair.py:65-90`, plus --teacher_snapshot replacing the hard-coded
teacher dirs at `train_pair.py:195,218,238,248`)."""

import argparse

from arseg_tpu.train.trainer import train_phase2


def main(argv=None):
    p = argparse.ArgumentParser(description="Phase-2 (LR + CReFF + FST) training.")
    p.add_argument("--data-path", required=True)
    p.add_argument("--sequence-path", required=True)
    p.add_argument("--models-path", required=True)
    p.add_argument("--backend", default="resnet34")
    p.add_argument("--snapshot", default=None)
    p.add_argument("--resume", default=None, metavar="CKPT.npz",
                   help="true resume from a trainer checkpoint: params + optimizer "
                        "state + epoch/best-mIoU cursors (vs --snapshot: weights-only "
                        "warm start, fresh optimizer)")
    p.add_argument("--crop_x", type=int, default=256)
    p.add_argument("--crop_y", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--start-lr", type=float, default=0.001)
    p.add_argument("--milestones", default="10,20,30")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--feat_loss", default=None)
    p.add_argument("--atten_type", default="local")
    p.add_argument("--atten_k", type=int, default=7)
    p.add_argument("--stage1_epoch", type=int, default=50)
    p.add_argument("--ref_gap", type=int, default=2)
    p.add_argument("--bitrate", type=int, default=3)
    p.add_argument("--with_motion", type=int, default=0)
    p.add_argument("--model_type", default="pspnet")
    p.add_argument("--dataset", default="camvid")
    p.add_argument("--fuse_version", type=int, default=1)
    p.add_argument("--teacher_snapshot", required=True)
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=689)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches (single-chip "
                        "route to reference-scale batches; train/step.py)")
    p.add_argument("--flow_shape", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="MV-bin spatial shape when it differs from the "
                        "dataset default (720x960 CamVid / 1024x2048 Cityscapes)")
    p.add_argument("--bn_mode", default="sync", choices=["sync", "master"],
                   help="BN stats: global-batch (sync) or DataParallel-faithful replica-0 (master)")
    p.add_argument("--train_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision compute (f32 master params/opt/BN stats/losses)")
    args = p.parse_args(argv)

    train_phase2(
        data_path=args.data_path,
        sequence_path=args.sequence_path,
        models_path=args.models_path,
        backend=args.backend,
        snapshot=args.snapshot,
        resume=args.resume,
        batch_size=args.batch_size,
        alpha=args.alpha,
        epochs=args.epochs,
        start_lr=args.start_lr,
        scale=args.scale,
        feat_loss=args.feat_loss,
        atten_type=args.atten_type,
        atten_k=args.atten_k,
        stage1_epoch=args.stage1_epoch,
        ref_gap=args.ref_gap,
        bitrate=args.bitrate,
        with_motion=bool(args.with_motion),
        model_type=args.model_type,
        dataset=args.dataset,
        fuse_version=args.fuse_version,
        teacher_snapshot=args.teacher_snapshot,
        num_devices=args.num_devices,
        seed=args.seed,
        bn_mode=args.bn_mode,
        train_dtype=args.train_dtype,
        accum_steps=args.accum_steps,
        flow_shape=(tuple(args.flow_shape) + (2,)) if args.flow_shape else None,
    )


if __name__ == "__main__":
    main()
