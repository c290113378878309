"""Real-checkpoint parity (VERDICT round-1 item #3).

Loads the released reference checkpoint at /tmp/ref_ckpt.pth into
  (a) the UNMODIFIED reference torch model (oracle, CPU), and
  (b) this framework via utils/torch_convert,
runs both on identical full-resolution inputs and reports logit / feature /
argmax deltas in f32 (parity mode) and bf16 (serving mode).

CPU-only (JAX_PLATFORMS=cpu) — runs alongside TPU jobs. Results land in
PARITY.md.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_ckpt.pth"
H, W = 720, 960


def main():
    from reference_oracle import install_reference

    install_reference()
    sys.path.insert(0, "/root/reference")
    from model import pspnet as ref_pspnet

    sd = torch.load(CKPT, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    has_fuse = any("fuse" in k for k in sd)
    print(f"checkpoint: {CKPT}, {len(sd)} keys, fuse={has_fuse}", flush=True)

    ref = ref_pspnet.PSPNet(
        n_classes=12, sizes=(1, 2, 3, 6), psp_size=512,
        deep_features_size=256, backend="resnet18", pretrained=False,
    )
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    print("torch load: missing", missing, "unexpected", unexpected, flush=True)
    assert not unexpected
    ref.eval()

    import jax
    import jax.numpy as jnp
    from arseg_tpu.models import build_model
    from arseg_tpu.utils.torch_convert import load_torch_checkpoint

    model = build_model("camvid-psp18", fuse=False)
    params = load_torch_checkpoint(CKPT, "camvid-psp18")

    # structure check vs a fresh init
    init = model.init(jax.random.PRNGKey(0))
    flat_c = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    pc = {jax.tree_util.keystr(k): v.shape for k, v in flat_c}
    pi = {jax.tree_util.keystr(k): v.shape for k, v in flat_i}
    only_c = sorted(set(pc) - set(pi))
    only_i = sorted(set(pi) - set(pc))
    mismat = sorted(k for k in set(pc) & set(pi) if pc[k] != pi[k])
    print("converted-only:", only_c[:10], flush=True)
    print("init-only:", only_i[:10], flush=True)
    print("shape-mismatch:", mismat[:10], flush=True)
    assert not only_c and not only_i and not mismat, "tree mismatch"

    rng = np.random.RandomState(0)
    # realistic input statistics: normalized image range
    x = rng.randn(1, H, W, 3).astype(np.float32) * 0.8

    with torch.no_grad():
        t_out, t_cls, t_p = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_out = t_out.numpy().transpose(0, 2, 3, 1)
    t_p = t_p.numpy().transpose(0, 2, 3, 1)

    def run(dtype):
        p = params
        xx = jnp.asarray(x)
        if dtype is not None:
            xx = xx.astype(dtype)
        out, cls, feat = model.apply(p, xx)
        return (np.asarray(out, np.float32), np.asarray(feat, np.float32))

    rows = []
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        j_out, j_p = run(dtype)
        d_logit = np.abs(j_out - t_out)
        d_feat = np.abs(j_p - t_p)
        agree = float((j_out.argmax(-1) == t_out.argmax(-1)).mean())
        rows.append(
            dict(mode=name,
                 logit_max=float(d_logit.max()), logit_mean=float(d_logit.mean()),
                 feat_max=float(d_feat.max()), feat_mean=float(d_feat.mean()),
                 argmax_agree=agree)
        )
        print(rows[-1], flush=True)
    return rows


if __name__ == "__main__":
    main()
