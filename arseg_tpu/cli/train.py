"""Phase-1 training CLI (flag surface of reference `train.py:61-75`, plus
--teacher_snapshot replacing the hard-coded teacher dir at `train.py:176-177`).
"""

import argparse

from arseg_tpu.train.trainer import train_phase1


def main(argv=None):
    p = argparse.ArgumentParser(description="Phase-1 (HR / plain LR) training.")
    p.add_argument("--data-path", required=True)
    p.add_argument("--models-path", required=True)
    p.add_argument("--backend", default="resnet34")
    p.add_argument("--snapshot", default=None)
    p.add_argument("--resume", default=None, metavar="CKPT.npz",
                   help="true resume from a trainer checkpoint: params + optimizer "
                        "state + epoch/best-mIoU cursors (vs --snapshot: weights-only "
                        "warm start, fresh optimizer)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--start-lr", type=float, default=0.001)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--feat_loss", default=None)
    p.add_argument("--dataset", default="camvid")
    p.add_argument("--model_type", default="pspnet")
    p.add_argument("--teacher_snapshot", default=None)
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=233)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches (single-chip "
                        "route to reference-scale batches; train/step.py)")
    p.add_argument("--bn_mode", default="sync", choices=["sync", "master"],
                   help="BN stats: global-batch (sync) or DataParallel-faithful replica-0 (master)")
    p.add_argument("--train_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = mixed-precision compute (f32 master params/opt/BN stats/losses)")
    p.add_argument("--cropsize", type=int, nargs=2, default=None, metavar=("W", "H"),
                   help="override the per-dataset crop policy (reference hard-codes it)")
    args = p.parse_args(argv)

    train_phase1(
        data_path=args.data_path,
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
        dataset=args.dataset,
        model_type=args.model_type,
        teacher_snapshot=args.teacher_snapshot,
        num_devices=args.num_devices,
        seed=args.seed,
        bn_mode=args.bn_mode,
        train_dtype=args.train_dtype,
        accum_steps=args.accum_steps,
        cropsize=tuple(args.cropsize) if args.cropsize else None,
    )


if __name__ == "__main__":
    main()
