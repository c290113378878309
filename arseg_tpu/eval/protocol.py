"""The mIoU_d evaluation protocol (reference `evaluation.py:218-439`).

For each ref_gap in 1..GOP, build the dataset rooted at
  {data_root}/{ds}-sequence/{bitrate}-GOP{G}/decoded_GOP{G}_dist_{ref_gap-1}
(with MVmap/frames side-dirs for AR, ref_gap>1), evaluate HR/LR/AR, append
the mean as line 13 and write
  {ds}-{bb}[-AR]-{scale}x-resolution-exp-GOP{G}-{bitrate}-evaluation.txt
in np.savetxt default format — byte-compatible with the released
evaluation-result artifacts.
"""

import os
import time

import numpy as np

from arseg_tpu.data import CamVid, CamVidWithFlow, CityScapes, CityScapesWithFlow, Loader
from arseg_tpu.eval.engine import EvalConstRes, EvalAlterRes
from arseg_tpu.models import build_model
from arseg_tpu.utils.torch_convert import load_torch_checkpoint

DATASET_INFO = {
    "camvid": dict(bitrate="3M", n_classes=12),
    "cityscapes": dict(bitrate="5M", n_classes=19),
}


def load_params(path, backend):
    if path.endswith(".pth"):
        return load_torch_checkpoint(path, backend)
    from arseg_tpu.utils.checkpoint import load_checkpoint

    return load_checkpoint(path)["params"]


def _snapshots(d):
    return sorted(x for x in os.listdir(d) if not x.endswith(".json"))


def find_hr_snapshot(ckpt_root, dataset, backbone):
    d = os.path.join(ckpt_root, f"{dataset}-{backbone}", "HR")
    return os.path.join(d, _snapshots(d)[0])


def find_scale_snapshot(ckpt_root, dataset, backbone, mode_dir, test_scale):
    """Reference filename convention: scale is the 3rd '_'-token
    (`evaluation.py:313`)."""
    d = os.path.join(ckpt_root, f"{dataset}-{backbone}", mode_dir)
    matches = [x for x in _snapshots(d) if x.split("_")[2] == str(test_scale)]
    if not matches:
        raise FileNotFoundError(f"no {mode_dir} checkpoint for scale {test_scale} in {d}")
    return os.path.join(d, matches[0])


def _make_dataset(dataset, data_path, backbone, ref_gap=None, flow_path=None, ref_path=None, flow_shape=None):
    if ref_gap is None:  # plain single-frame dataset
        if dataset == "camvid":
            return CamVid(data_path, mode="test")
        return CityScapes(data_path, model_type=f"{backbone[:-2]}net", mode="val")
    if dataset == "camvid":
        kw = {"flow_shape": flow_shape} if flow_shape else {}
        return CamVidWithFlow(
            data_path, mode="test", load_pair=True, ref_gap=ref_gap,
            flow_path=flow_path, ref_path=ref_path, **kw,
        )
    kw = {"flow_shape": flow_shape} if flow_shape else {}
    return CityScapesWithFlow(
        data_path, model_type=f"{backbone[:-2]}net", mode="val",
        ref_gap=ref_gap, flow_path=flow_path, ref_path=ref_path, **kw,
    )


def _seq_paths(data_root, dataset, bitrate, gop, ref_gap):
    seq = os.path.join(data_root, f"{dataset}-sequence")
    data_path = os.path.join(seq, f"{bitrate}-GOP{gop}", f"decoded_GOP{gop}_dist_{ref_gap - 1}")
    flow_path = os.path.join(seq, f"{bitrate}-GOP{gop}", f"MVmap_GOP{gop}_dist_{ref_gap - 1}")
    ref_path = os.path.join(seq, f"{bitrate}-GOP{gop}", "frames")
    return data_path, flow_path, ref_path


def _write_result(result_dir, name, mious):
    mious = list(mious)
    mious.append(float(np.mean(mious)))
    os.makedirs(result_dir, exist_ok=True)
    np.savetxt(os.path.join(result_dir, name), np.asarray(mious))
    return mious


def run_protocol(
    dataset="camvid",
    backbone="psp18",
    mode=(1, 1, 1),
    gop=12,
    test_scale=0.5,
    data_root="./data",
    ckpt_root="./checkpoints",
    result_dir="./evaluation-result",
    batch_size=1,
    num_workers=4,
    verbose=True,
    flow_shape=None,
    mesh=None,
    dtype=None,
):
    info = DATASET_INFO[dataset]
    bitrate, n_classes = info["bitrate"], info["n_classes"]
    backend = f"{dataset}-{backbone}"
    results = {}

    # sharded eval: frames spread over the data mesh; keep every frame
    # (padding inside the engines handles ragged tails) and feed full
    # device-count batches
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev > 1:
        batch_size = max(batch_size, n_dev)
    eval_kw = dict(mesh=mesh, dtype=dtype)

    hr_snapshot = find_hr_snapshot(ckpt_root, dataset, backbone)
    hr_model = build_model(backend, fuse=False)
    hr_params = load_params(hr_snapshot, backend)

    t_start = time.perf_counter()

    def log(*a):
        if verbose:
            print(f"[{time.perf_counter() - t_start:7.1f}s]", *a, flush=True)

    def make_loader(ds):
        # never drop the ragged tail: the engines ignore-label-pad it to
        # the compiled batch shape, so batch_size>1 measures every sample
        # exactly like the reference's batch-1 loop
        return Loader(ds, batch_size=batch_size, shuffle=False,
                      num_workers=num_workers, drop_last=False)

    if mode[0]:  # HR
        mious = []
        for ref_gap in range(1, gop + 1):
            data_path, _, _ = _seq_paths(data_root, dataset, bitrate, gop, ref_gap)
            ds = _make_dataset(dataset, data_path, backbone)
            miou = EvalConstRes(scale=1.0, **eval_kw)(hr_model, hr_params, make_loader(ds), n_classes)
            log(ref_gap, "HR", "1.0x", miou)
            mious.append(miou)
        results["HR"] = _write_result(
            result_dir,
            f"{dataset}-{backbone}-1.0x-resolution-exp-GOP{gop}-{bitrate}-evaluation.txt",
            mious,
        )

    if mode[2]:  # AR
        ar_snapshot = find_scale_snapshot(ckpt_root, dataset, backbone, "AR", test_scale)
        ar_model = build_model(backend, fuse=True)
        ar_params = load_params(ar_snapshot, backend)
        mious = []
        for ref_gap in range(1, gop + 1):
            data_path, flow_path, ref_path = _seq_paths(data_root, dataset, bitrate, gop, ref_gap)
            if ref_gap > 1:
                ds = _make_dataset(dataset, data_path, backbone, ref_gap, flow_path, ref_path, flow_shape)
                miou = EvalAlterRes(scale=test_scale, **eval_kw)(
                    hr_model, hr_params, ar_model, ar_params, make_loader(ds), n_classes
                )
            else:  # distance 0 == pure HR on the keyframe
                ds = _make_dataset(dataset, data_path, backbone)
                miou = EvalConstRes(scale=1.0, **eval_kw)(hr_model, hr_params, make_loader(ds), n_classes)
            log(ref_gap, "AR", test_scale, miou)
            mious.append(miou)
        results["AR"] = _write_result(
            result_dir,
            f"{dataset}-{backbone}-AR-{test_scale}x-resolution-exp-GOP{gop}-{bitrate}-evaluation.txt",
            mious,
        )

    if mode[1]:  # LR
        lr_snapshot = find_scale_snapshot(ckpt_root, dataset, backbone, "LR", test_scale)
        lr_model = build_model(backend, fuse=True)
        lr_params = load_params(lr_snapshot, backend)
        mious = []
        for ref_gap in range(1, gop + 1):
            data_path, _, _ = _seq_paths(data_root, dataset, bitrate, gop, ref_gap)
            ds = _make_dataset(dataset, data_path, backbone)
            miou = EvalConstRes(scale=test_scale, **eval_kw)(lr_model, lr_params, make_loader(ds), n_classes)
            log(ref_gap, "LR", test_scale, miou)
            mious.append(miou)
        results["LR"] = _write_result(
            result_dir,
            f"{dataset}-{backbone}-{test_scale}x-resolution-exp-GOP{gop}-{bitrate}-evaluation.txt",
            mious,
        )

    return results
