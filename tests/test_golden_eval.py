"""tools_golden_eval.py must be runnable the moment real data appears:
stage checkpoints into the protocol discovery layout, run the protocol,
and diff row-by-row against released artifacts. Exercised here on the
synthetic GOP tree with a self-made 'reference' artifact (PASS) and a
perturbed one (FAIL)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from synthetic_data import make_camvid_tree

import tools_golden_eval as golden
from arseg_tpu.models import build_model
from arseg_tpu.utils.checkpoint import save_checkpoint


@pytest.mark.slow
def test_golden_eval_pass_and_fail(tmp_path, monkeypatch):
    make_camvid_tree(str(tmp_path / "data"), gop=3)
    ck = str(tmp_path / "hr.npz")
    model = build_model("camvid-psp18", fuse=False)
    save_checkpoint(ck, model.init(jax.random.PRNGKey(0)), {"scale": 1.0})

    result_dir = str(tmp_path / "results")
    ref_dir = str(tmp_path / "ref_results")
    monkeypatch.setattr(golden, "REF_RESULTS", ref_dir)

    argv = [
        "--config", "camvid-psp18", "--gop", "3",
        "--data_root", str(tmp_path / "data"),
        "--hr", ck, "--result_dir", result_dir,
        "--flow_shape", "48", "64",
    ]

    # no reference artifact -> exit 2
    os.makedirs(ref_dir)
    with pytest.raises(SystemExit) as e:
        golden.main(argv)
    assert e.value.code == 2

    # self-consistent artifact -> PASS (exit 0)
    name = "camvid-psp18-1.0x-resolution-exp-GOP3-3M-evaluation.txt"
    data = np.loadtxt(os.path.join(result_dir, name))
    np.savetxt(os.path.join(ref_dir, name), data)
    with pytest.raises(SystemExit) as e:
        golden.main(argv)
    assert e.value.code == 0

    # perturb one distance beyond tol -> FAIL (exit 1)
    bad = data.copy()
    bad[1] += 0.01
    np.savetxt(os.path.join(ref_dir, name), bad)
    with pytest.raises(SystemExit) as e:
        golden.main(argv)
    assert e.value.code == 1
