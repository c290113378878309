"""GOP serving prefetch (gop/feeder.py): background host assembly + device
staging must reproduce serial loading exactly, in order; the async writer
must produce the same PNGs as inline writing; worker errors must surface.

Reference counterpart: none — the reference's evaluation loop decodes
serially on the forward thread (`/root/reference/evaluation.py`); this is
the TPU-native overlap layer the BASELINE north star asks for."""

import numpy as np
import pytest
from PIL import Image

from arseg_tpu.data.camvid import CamVidWithFlowTest
from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder, _assemble

H, W = 24, 32
GAP = 4
N = 12  # three GOPs


@pytest.fixture()
def seq_dir(tmp_path):
    rng = np.random.RandomState(0)
    data = tmp_path / "decoded"
    flows = tmp_path / "mv"
    data.mkdir()
    flows.mkdir()
    for i in range(N):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            data / f"{i:05d}.png"
        )
        rng.randint(-8, 8, (H // 2, W // 2, 2)).astype(np.int16).tofile(
            flows / f"{i:05d}.bin"
        )
    return data, flows


def _dataset(seq_dir):
    data, flows = seq_dir
    return CamVidWithFlowTest(
        str(data), ref_gap=GAP, ref_path=str(data), flow_path=str(flows),
        flow_shape=(H // 2, W // 2, 2),
    )


@pytest.mark.parametrize("workers", [1, 3])
def test_feeder_matches_serial(seq_dir, workers):
    ds = _dataset(seq_dir)
    feeder = GOPFeeder(ds, GAP, num_workers=workers, depth=2, stage=False)
    assert len(feeder) == N // GAP
    seen = []
    for gi, kf, fr, (fx, fy) in feeder:
        seen.append(gi)
        ekf, efr, efx, efy = _assemble(ds, gi * GAP, GAP)
        np.testing.assert_array_equal(kf, ekf)
        np.testing.assert_array_equal(fr, efr)
        np.testing.assert_array_equal(fx, efx)
        np.testing.assert_array_equal(fy, efy)
    assert seen == list(range(N // GAP))


def test_feeder_device_stage(seq_dir):
    import jax

    ds = _dataset(seq_dir)
    out = list(GOPFeeder(ds, GAP, depth=2, stage=True))
    assert [gi for gi, *_ in out] == list(range(N // GAP))
    gi, kf, fr, (fx, fy) = out[0]
    assert isinstance(kf, jax.Array) and isinstance(fx, jax.Array)
    ekf, _, efx, _ = _assemble(ds, 0, GAP)
    np.testing.assert_array_equal(np.asarray(kf), ekf)
    np.testing.assert_array_equal(np.asarray(fx), efx)


def test_feeder_gop_batch(seq_dir):
    """gop_batch=2 over 3 GOPs: one [2,...] stack + the tail as a single
    GOP, covering every frame exactly once in order."""
    ds = _dataset(seq_dir)
    out = list(GOPFeeder(ds, GAP, depth=2, stage=False, gop_batch=2))
    assert [gi for gi, *_ in out] == [0, 2]
    gi, kf, fr, (fx, fy) = out[0]
    assert kf.shape == (2, H, W, 3) and fr.shape == (2, GAP - 1, H, W, 3)
    assert fx.shape == (2, GAP - 1, H // 2, W // 2)
    for b in range(2):
        ekf, efr, efx, efy = _assemble(ds, b * GAP, GAP)
        np.testing.assert_array_equal(kf[b], ekf[0])
        np.testing.assert_array_equal(fr[b], efr)
        np.testing.assert_array_equal(fx[b], efx)
        np.testing.assert_array_equal(fy[b], efy)
    gi, kf, fr, _ = out[1]
    assert gi == 2 and kf.shape == (1, H, W, 3) and fr.shape == (GAP - 1, H, W, 3)
    np.testing.assert_array_equal(kf, _assemble(ds, 2 * GAP, GAP)[0])


def test_feeder_error_propagates(seq_dir):
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return {
                "image": np.zeros((H, W, 3), np.float32),
                "flow": np.zeros((H // 2, W // 2, 2), np.float32),
            }

    with pytest.raises(RuntimeError, match="boom"):
        list(GOPFeeder(Broken(), GAP, num_workers=2, stage=False))


def test_async_writer(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    rng = np.random.RandomState(1)
    preds = rng.randint(0, 12, (GAP, H, W)).astype(np.int32)
    w = AsyncWriter(str(out), colorize=False)
    w.put(preds, [f"{i:05d}" for i in range(GAP)])
    w.close()
    for i in range(GAP):
        arr = np.asarray(Image.open(out / f"{i:05d}.png"))
        np.testing.assert_array_equal(arr, preds[i].astype(np.uint8))


def test_async_writer_error_surfaces_no_deadlock(tmp_path):
    """A failing writer (bad out_dir) must drain its bounded queue and
    re-raise at put()/close() instead of deadlocking the producer."""
    w = AsyncWriter(str(tmp_path / "missing" / "dir"), colorize=False)
    preds = np.zeros((GAP, H, W), np.int32)
    try:
        for i in range(8):  # > queue depth; would hang before the drain fix
            w.put(preds, [f"{j:05d}" for j in range(GAP)])
        w.close()
        raise AssertionError("expected the writer error to surface")
    except (FileNotFoundError, OSError):
        pass
