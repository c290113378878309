"""Checkpoint conversion CLI.

Two jobs (reference `convert_model_for_cityscapes.py:5-49` + our own
.pth -> pytree import):
  * torch: convert a reference .pth state_dict into an arseg_tpu .npz
    checkpoint (handles the DataParallel 'module.' prefix, per-family key
    aliases like 'cls.4' <-> 'final_conv', conv OIHW -> HWIO transposes).
  * metadata: stamp dataset/backbone/scale/epoch explicitly instead of the
    reference's filename-token parsing (`evaluation.py:313`, `train_pair.py:197`).
  * --to_torch: the INVERSE — export an arseg_tpu checkpoint back to a
    reference-layout .pth state_dict (strict-loadable into the unmodified
    reference models, tests/test_torch_export.py), so models FST-trained
    here deploy straight onto the reference's PyTorch stack.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert reference .pth checkpoints.")
    p.add_argument("src", help=".pth state_dict path (or our checkpoint with --to_torch)")
    p.add_argument("dst", help="output .npz checkpoint path (.pth with --to_torch)")
    p.add_argument("--to_torch", action="store_true",
                   help="reverse direction: our checkpoint -> reference .pth")
    p.add_argument("--data_parallel", action="store_true",
                   help="with --to_torch: prefix keys with 'module.' "
                        "(nn.DataParallel layout)")
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

    if args.to_torch:
        import numpy as np
        import torch

        from arseg_tpu.utils.checkpoint import load_checkpoint
        from arseg_tpu.utils.torch_convert import export_state_dict

        params = load_checkpoint(args.src)["params"]
        sd = export_state_dict(params, args.backend,
                               data_parallel=args.data_parallel)
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   args.dst)
        print(args.dst)
        return

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
