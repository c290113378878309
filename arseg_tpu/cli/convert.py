"""Checkpoint conversion CLI.

Two jobs (reference `convert_model_for_cityscapes.py:5-49` + our own
.pth -> pytree import):
  * torch: convert a reference .pth state_dict into an arseg_tpu .npz
    checkpoint (handles the DataParallel 'module.' prefix, per-family key
    aliases like 'cls.4' <-> 'final_conv', conv OIHW -> HWIO transposes).
  * metadata: stamp dataset/backbone/scale/epoch explicitly instead of the
    reference's filename-token parsing (`evaluation.py:313`, `train_pair.py:197`).
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert reference .pth checkpoints.")
    p.add_argument("src", help=".pth state_dict path")
    p.add_argument("dst", help="output .npz checkpoint path")
    p.add_argument("--backend", default=None,
                   help="key-alias family: camvid-psp18 | cityscapes-psp18 | "
                        "camvid-bise18 | cityscapes-bise18 | psp-densenet | "
                        "psp-squeezenet")
    p.add_argument("--dataset", default=None)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--miou", type=float, default=None)
    args = p.parse_args(argv)

    from arseg_tpu.utils.checkpoint import save_checkpoint
    from arseg_tpu.utils.torch_convert import load_torch_checkpoint

    params = load_torch_checkpoint(args.src, args.backend)
    meta = {
        k: v
        for k, v in dict(
            backend=args.backend, dataset=args.dataset, scale=args.scale,
            epoch=args.epoch, miou=args.miou, source=args.src,
        ).items()
        if v is not None
    }
    save_checkpoint(args.dst, params, meta)
    print(args.dst)


if __name__ == "__main__":
    main()
