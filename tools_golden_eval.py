"""Golden-number mIoU_d reproduction against the reference's released
evaluation artifacts (`/root/reference/evaluation-result/*.txt`,
README.md:62-75) — the de-facto integration test of the reference.

One command, the moment real data + checkpoints appear in the sandbox:

    python tools_golden_eval.py --config camvid-bise18 --gop 12 \
        --data_root /path/to/data \
        --hr  /path/BiSeNet_res18_1.0_....pth \
        --ar  /path/BiSeNet_res18_0.5_....pth \
        --lr  /path/BiSeNet_res18_0.5_....pth

* Stages the given checkpoints (.pth consumed directly via the converter,
  or our .npz) into the protocol's discovery layout
  (`eval/protocol.py:find_hr_snapshot` / `find_scale_snapshot`: mode dir +
  scale as the 3rd '_'-token of the filename, `evaluation.py:313`).
* Runs `run_protocol` for every mode a checkpoint was supplied for.
* Diffs each produced txt row-by-row against the same-named reference
  artifact; PASS when max |Δ mIoU| <= --tol (default 0.002 = the
  BASELINE.md "within 0.2 points" criterion).

Exit code 0 = all supplied modes pass; 1 = any diff exceeds tol;
2 = reference artifact missing for a produced file.
"""

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

REF_RESULTS = "/root/reference/evaluation-result"
MODE_DIRS = {"hr": "HR", "lr": "LR", "ar": "AR"}


def stage_checkpoints(args, ckpt_root):
    """Copy checkpoints into {ckpt_root}/{config}/{HR,AR,LR}/ with the
    scale-token filename the protocol's discovery expects."""
    for key, mode_dir in MODE_DIRS.items():
        src = getattr(args, key)
        if not src:
            continue
        scale = 1.0 if key == "hr" else args.test_scale
        ext = ".pth" if src.endswith(".pth") else ".npz"
        d = os.path.join(ckpt_root, args.config, mode_dir)
        os.makedirs(d, exist_ok=True)
        # model/backend tokens are cosmetic; discovery keys on token #2
        shutil.copy(src, os.path.join(d, f"Model_backend_{scale}_1_{ext}"))


def compare(result_dir, names, tol):
    """Row-by-row diff vs the released artifacts. Returns worst offence."""
    worst = 0.0
    failed = False
    for name in names:
        ref_path = os.path.join(REF_RESULTS, name)
        got_path = os.path.join(result_dir, name)
        if not os.path.exists(ref_path):
            print(f"MISSING reference artifact: {ref_path}", flush=True)
            sys.exit(2)
        ref = np.loadtxt(ref_path)
        got = np.loadtxt(got_path)
        if ref.shape != got.shape:
            print(f"{name}: SHAPE MISMATCH ref {ref.shape} vs got {got.shape}")
            failed = True
            continue
        delta = np.abs(ref - got)
        status = "PASS" if delta.max() <= tol else "FAIL"
        failed |= status == "FAIL"
        worst = max(worst, float(delta.max()))
        print(
            f"{name}: {status}  max|d|={delta.max() * 100:.3f} pts "
            f"(avg row: ref {ref[-1]:.4f} vs got {got[-1]:.4f})",
            flush=True,
        )
        for i, d in enumerate(delta[:-1]):
            if d > tol:
                print(f"    dist {i}: ref {ref[i]:.4f} got {got[i]:.4f} (d={d * 100:.3f} pts)")
    return failed, worst


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", required=True, help="e.g. camvid-bise18, cityscapes-psp18")
    p.add_argument("--data_root", required=True,
                   help="dir containing {dataset}-sequence/ in the reference layout")
    p.add_argument("--hr", default=None, help="HR checkpoint (.pth or .npz)")
    p.add_argument("--ar", default=None, help="AR fuse checkpoint at --test_scale")
    p.add_argument("--lr", default=None, help="LR fuse checkpoint at --test_scale")
    p.add_argument("--gop", type=int, default=12)
    p.add_argument("--test_scale", type=float, default=0.5)
    p.add_argument("--tol", type=float, default=0.002,
                   help="max |mIoU delta| in fraction (0.002 = 0.2 points, BASELINE.md)")
    p.add_argument("--flow_shape", type=int, nargs=2, default=None)
    p.add_argument("--result_dir", default=None,
                   help="keep produced txts here (default: temp dir)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard eval over a 'data' mesh (psum'd histograms)")
    p.add_argument("--dtype", default=None, choices=["bfloat16", "float32"],
                   help="serving dtype (default: checkpoint dtype, f32 parity)")
    args = p.parse_args(argv)

    if not (args.hr or args.ar or args.lr):
        p.error("supply at least one of --hr/--ar/--lr")
    if (args.ar or args.lr) and not args.hr:
        p.error("--ar/--lr modes also need --hr (AR distance-0 is the HR model)")

    dataset, backbone = args.config.split("-")
    from arseg_tpu.eval.protocol import DATASET_INFO, run_protocol

    bitrate = DATASET_INFO[dataset]["bitrate"]

    tmp = tempfile.mkdtemp(prefix="golden_")
    ckpt_root = os.path.join(tmp, "ckpt")
    result_dir = args.result_dir or os.path.join(tmp, "results")
    stage_checkpoints(args, ckpt_root)

    mesh = None
    if args.num_devices > 1:
        from arseg_tpu.parallel import data_mesh

        mesh = data_mesh(args.num_devices)
    dtype = None
    if args.dtype:
        import jax.numpy as jnp

        dtype = jnp.dtype(args.dtype)

    mode = (1 if args.hr else 0, 1 if args.lr else 0, 1 if args.ar else 0)
    run_protocol(
        dataset=dataset,
        backbone=backbone,
        mode=mode,
        gop=args.gop,
        test_scale=args.test_scale,
        data_root=args.data_root,
        ckpt_root=ckpt_root,
        result_dir=result_dir,
        flow_shape=tuple(args.flow_shape) + (2,) if args.flow_shape else None,
        mesh=mesh,
        dtype=dtype,
    )

    names = []
    if args.hr:
        names.append(f"{args.config}-1.0x-resolution-exp-GOP{args.gop}-{bitrate}-evaluation.txt")
    if args.lr:
        names.append(f"{args.config}-{args.test_scale}x-resolution-exp-GOP{args.gop}-{bitrate}-evaluation.txt")
    if args.ar:
        names.append(f"{args.config}-AR-{args.test_scale}x-resolution-exp-GOP{args.gop}-{bitrate}-evaluation.txt")

    failed, worst = compare(result_dir, names, args.tol)
    print(f"{'FAIL' if failed else 'PASS'}: worst delta {worst * 100:.3f} pts (tol {args.tol * 100:.1f})")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
