import sys, os, tempfile
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np, jax
from arseg_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from synthetic_data import make_camvid_tree, FLOW_SHAPE
from arseg_tpu.models import build_model
from arseg_tpu.utils.checkpoint import save_checkpoint
from arseg_tpu.eval.protocol import run_protocol
import jax.numpy as jnp

tmp = tempfile.mkdtemp()
gop = 3
make_camvid_tree(os.path.join(tmp, "data"), gop=gop)
ck = os.path.join(tmp, "ckpt")
for sub, key, scale in [("HR", 0, "1.0"), ("AR", 1, "0.5"), ("LR", 2, "0.5")]:
    d = os.path.join(ck, "camvid-psp18", sub)
    os.makedirs(d)
    m = build_model("camvid-psp18", fuse=(sub != "HR"))
    save_checkpoint(os.path.join(d, f"PSPNet_resnet18_{scale}_1_.npz"),
                    m.init(jax.random.PRNGKey(key)), {"scale": float(scale)})
res = run_protocol(
    dataset="camvid", backbone="psp18", mode=(1, 0, 1), gop=gop,
    test_scale=0.5, data_root=os.path.join(tmp, "data"), ckpt_root=ck,
    result_dir=os.path.join(tmp, "results"), num_workers=2, verbose=False,
    flow_shape=FLOW_SHAPE, dtype=jnp.bfloat16,
)
hr, ar = res["HR"], res["AR"]
ok = all(np.isfinite(v) for v in hr + ar) and abs(hr[0] - ar[0]) < 1e-6
print(f"HR={['%.4f' % v for v in hr]} AR={['%.4f' % v for v in ar]}", flush=True)
print("DONE", "PASS" if ok else "FAIL", flush=True)
