"""End-to-end mIoU_d protocol on a synthetic GOP tree + metrics parity."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from synthetic_data import make_camvid_tree, FLOW_SHAPE
from arseg_tpu.eval.metrics import confusion_update, miou_from_hist
from arseg_tpu.eval.protocol import run_protocol
from arseg_tpu.models import build_model
from arseg_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
import jax


def test_confusion_matches_torch_bincount():
    rng = np.random.RandomState(0)
    n = 5
    label = rng.randint(0, n, (2, 13, 17)).astype(np.int32)
    label[0, 0, :5] = 255
    pred = rng.randint(0, n, (2, 13, 17)).astype(np.int32)

    tl, tp = torch.from_numpy(label).long(), torch.from_numpy(pred).long()
    keep = tl != 255
    ref = torch.bincount(tl[keep] * n + tp[keep], minlength=n * n).view(n, n).float()

    hist = confusion_update(
        jnp.zeros((n, n), jnp.float32), jnp.asarray(label), jnp.asarray(pred), n
    )
    np.testing.assert_array_equal(np.asarray(hist), ref.numpy())

    ious = ref.diag() / (ref.sum(0) + ref.sum(1) - ref.diag())
    np.testing.assert_allclose(
        float(miou_from_hist(hist)), ious.mean().item(), rtol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    model = build_model("camvid-psp18", fuse=False)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, metadata={"scale": 1.0, "epoch": 3})
    out = load_checkpoint(path)
    assert out["metadata"]["epoch"] == 3
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(out["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_protocol_camvid_end_to_end(tmp_path):
    """Full HR+AR+LR protocol over a synthetic GOP tree with random weights:
    exercises dataset crawl, keyframe/MV lookup, engines, and txt output."""
    gop = 3
    make_camvid_tree(str(tmp_path / "data"), gop=gop)

    ck_root = tmp_path / "ckpt"
    hr_dir = ck_root / "camvid-psp18" / "HR"
    ar_dir = ck_root / "camvid-psp18" / "AR"
    lr_dir = ck_root / "camvid-psp18" / "LR"
    for d in (hr_dir, ar_dir, lr_dir):
        os.makedirs(d)

    plain = build_model("camvid-psp18", fuse=False)
    fuse = build_model("camvid-psp18", fuse=True)
    save_checkpoint(
        str(hr_dir / "PSPNet_resnet18_1.0_1_.npz"),
        plain.init(jax.random.PRNGKey(0)),
        {"scale": 1.0},
    )
    save_checkpoint(
        str(ar_dir / "PSPNet_resnet18_0.5_1_.npz"),
        fuse.init(jax.random.PRNGKey(1)),
        {"scale": 0.5},
    )
    save_checkpoint(
        str(lr_dir / "PSPNet_resnet18_0.5_2_.npz"),
        fuse.init(jax.random.PRNGKey(2)),
        {"scale": 0.5},
    )

    results = run_protocol(
        dataset="camvid",
        backbone="psp18",
        mode=(1, 1, 1),
        gop=gop,
        test_scale=0.5,
        data_root=str(tmp_path / "data"),
        ckpt_root=str(ck_root),
        result_dir=str(tmp_path / "results"),
        num_workers=2,
        verbose=False,
        flow_shape=FLOW_SHAPE,
    )

    for mode_key, fname in [
        ("HR", "camvid-psp18-1.0x-resolution-exp-GOP3-3M-evaluation.txt"),
        ("AR", "camvid-psp18-AR-0.5x-resolution-exp-GOP3-3M-evaluation.txt"),
        ("LR", "camvid-psp18-0.5x-resolution-exp-GOP3-3M-evaluation.txt"),
    ]:
        vals = np.loadtxt(str(tmp_path / "results" / fname))
        assert vals.shape == (gop + 1,)
        np.testing.assert_allclose(vals[-1], np.mean(vals[:-1]), rtol=1e-6)
        assert np.all(vals >= 0) and np.all(vals <= 1)
        assert results[mode_key][-1] == pytest.approx(vals[-1], rel=1e-6)
    # AR distance-0 equals HR distance-0 by construction (evaluation.py:332-337)
    hr = np.loadtxt(str(tmp_path / "results" / "camvid-psp18-1.0x-resolution-exp-GOP3-3M-evaluation.txt"))
    ar = np.loadtxt(str(tmp_path / "results" / "camvid-psp18-AR-0.5x-resolution-exp-GOP3-3M-evaluation.txt"))
    assert hr[0] == pytest.approx(ar[0], rel=1e-6)


def test_engine_dtype_modes():
    """bf16 serving mode through the eval engines stays close to f32 parity
    mode (PARITY.md §2): same protocol, same frames, dtype knob only."""
    import jax.numpy as jnp
    from arseg_tpu.models import build_model
    from arseg_tpu.eval.engine import EvalConstRes, EvalAlterRes

    rng = np.random.RandomState(7)
    model = build_model("camvid-psp18", fuse=False)
    params = model.init(jax.random.PRNGKey(3))
    fuse = build_model("camvid-psp18", fuse=True)
    fuse_params = fuse.init(jax.random.PRNGKey(4))
    n = 4
    batches = [
        {
            "image": rng.randn(1, 48, 64, 3).astype(np.float32),
            "label": rng.randint(0, 12, (1, 48, 64)).astype(np.int32),
            "ref_image": rng.randn(1, 48, 64, 3).astype(np.float32),
            "flow": rng.uniform(-3, 3, (1, 48, 64, 2)).astype(np.float32),
        }
        for _ in range(n)
    ]
    m32 = EvalConstRes(scale=0.5)(model, params, batches, 12)
    m16 = EvalConstRes(scale=0.5, dtype=jnp.bfloat16)(model, params, batches, 12)
    assert abs(m32 - m16) < 0.1, (m32, m16)

    a32 = EvalAlterRes(scale=0.5)(model, params, fuse, fuse_params, batches, 12)
    a16 = EvalAlterRes(scale=0.5, dtype=jnp.bfloat16)(
        model, params, fuse, fuse_params, batches, 12
    )
    assert abs(a32 - a16) < 0.1, (a32, a16)


@pytest.mark.parametrize("backbone", ["psp18", "bise18"])
def test_protocol_cityscapes_end_to_end(tmp_path, backbone):
    """HR+AR protocol over a synthetic Cityscapes tree (leftImg8bit/gtFine
    layout, sequence keyframes, MV bins): exercises the CityScapes(+WithFlow)
    crawl, per-model normalization, trainId conversion, and the 19-class
    mIoU_d loop for both backbones."""
    from synthetic_data import make_cityscapes_tree, CS_FLOW_SHAPE

    gop = 3
    make_cityscapes_tree(str(tmp_path / "data"), gop=gop)

    ck_root = tmp_path / "ckpt"
    hr_dir = ck_root / f"cityscapes-{backbone}" / "HR"
    ar_dir = ck_root / f"cityscapes-{backbone}" / "AR"
    for d in (hr_dir, ar_dir):
        os.makedirs(d)
    plain = build_model(f"cityscapes-{backbone}", fuse=False)
    fuse = build_model(f"cityscapes-{backbone}", fuse=True)
    save_checkpoint(
        str(hr_dir / "PSPNet_resnet18_1.0_1_.npz"),
        plain.init(jax.random.PRNGKey(0)), {"scale": 1.0},
    )
    save_checkpoint(
        str(ar_dir / "PSPNet_resnet18_0.5_1_.npz"),
        fuse.init(jax.random.PRNGKey(1)), {"scale": 0.5},
    )

    results = run_protocol(
        dataset="cityscapes",
        backbone=backbone,
        mode=(1, 0, 1),
        gop=gop,
        test_scale=0.5,
        data_root=str(tmp_path / "data"),
        ckpt_root=str(ck_root),
        result_dir=str(tmp_path / "results"),
        num_workers=2,
        verbose=False,
        flow_shape=CS_FLOW_SHAPE,
    )
    for key, fname in [
        ("HR", f"cityscapes-{backbone}-1.0x-resolution-exp-GOP3-5M-evaluation.txt"),
        ("AR", f"cityscapes-{backbone}-AR-0.5x-resolution-exp-GOP3-5M-evaluation.txt"),
    ]:
        vals = np.loadtxt(str(tmp_path / "results" / fname))
        assert vals.shape == (gop + 1,)
        assert np.all(np.isfinite(vals)) and np.all(vals >= 0)
        assert results[key][-1] == pytest.approx(vals[-1], rel=1e-6)
    hr = results["HR"]
    ar = results["AR"]
    assert hr[0] == pytest.approx(ar[0], rel=1e-6)
