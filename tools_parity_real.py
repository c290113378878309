"""Real-checkpoint parity (VERDICT items: round-1 #3, round-2 #2 breadth).

Usage: python tools_parity_real.py <ckpt.pth> [config]
    config in {camvid-psp18, camvid-bise18, cityscapes-psp18,
    cityscapes-bise18} (default camvid-psp18); fuse checkpoints are
    autodetected from the state_dict keys.

Loads the released reference checkpoint into
  (a) the UNMODIFIED reference torch model (oracle, CPU), and
  (b) this framework via utils/torch_convert,
runs both on identical full-resolution inputs (plain forward, and for fuse
checkpoints the phase-2 merge with a shared random warped feature) and
reports logit / feature / argmax deltas in f32 (parity mode) and bf16
(serving mode). CPU-only — runs alongside TPU jobs. Results land in
PARITY.md §1.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_ckpt.pth"
CONFIG = sys.argv[2] if len(sys.argv) > 2 else "camvid-psp18"

SIZES = {"camvid": (720, 960), "cityscapes": (512, 1024)}


def build_ref(config, fuse):
    """The unmodified reference model for a config (classes/ctor args as in
    tests/test_model_parity.py; reference model/{pspnet,pspnet_semseg,
    bisenet}.py)."""
    dataset, backbone = config.split("-")
    n_classes = 12 if dataset == "camvid" else 19
    if backbone == "bise18":
        from model.bisenet import BiSeNetV1, BiSeNetV1WithFuse

        cls = BiSeNetV1WithFuse if fuse else BiSeNetV1
        return cls(n_classes=n_classes, backend="resnet18")
    if dataset == "camvid":
        from model.pspnet import PSPNet, PSPNetWithFuse

        if fuse:
            return PSPNetWithFuse(sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
                                  deep_features_size=256, backend="resnet18",
                                  atten_k=7)
        return PSPNet(sizes=(1, 2, 3, 6), n_classes=12, psp_size=512,
                      deep_features_size=256, backend="resnet18",
                      pretrained=False)
    from model.pspnet_semseg import PSPNet as CityPlain, PSPNetWithFuse as CityFuse

    # feat_dim=512 for resnet18 (the reference default 2048 is the r50 dim);
    # note the released cityscapes-psp18 checkpoints come from the WithFuse
    # class in BOTH HR and AR roles (convert_model_for_cityscapes.py), so
    # fuse autodetection normally lands on CityFuse here
    kw = dict(layers=18, bins=(1, 2, 3, 6), dropout=0.1, classes=19,
              zoom_factor=8, feat_dim=512, use_ppm=True, pretrained=True)
    return CityFuse(**kw) if fuse else CityPlain(**kw)


def ref_forward(ref, config, fuse, x_nchw, ref_p_nchw):
    """(primary logits, deep feature) from the reference forward; fuse models
    run mode='merge' with the shared warped feature."""
    with torch.no_grad():
        if fuse:
            out = ref(torch.from_numpy(x_nchw), mode="merge",
                      ref_p=torch.from_numpy(ref_p_nchw))
        else:
            out = ref(torch.from_numpy(x_nchw))
    if config.endswith("bise18"):
        return out[0].numpy(), out[3].numpy()  # out, feat/fused
    return out[0].numpy(), out[2].numpy()  # out, p


def ours_forward(model, params, config, fuse, x_nhwc, ref_p_nhwc, dtype):
    import jax.numpy as jnp

    xx = jnp.asarray(x_nhwc)
    if dtype is not None:
        xx = xx.astype(dtype)
    if fuse:
        rp = jnp.asarray(ref_p_nhwc)
        if dtype is not None:
            rp = rp.astype(dtype)
        out = model.apply(params, xx, mode="merge", ref_p=rp)
    else:
        out = model.apply(params, xx)
    if config.endswith("bise18"):
        return (np.asarray(out[0], np.float32), np.asarray(out[3], np.float32))
    return (np.asarray(out[0], np.float32), np.asarray(out[2], np.float32))


def feat_channels(config):
    """Warped-feature shape of the merge path per config (reference
    evaluation.py fusion points)."""
    dataset, backbone = config.split("-")
    h, w = SIZES[dataset]
    if backbone == "bise18":
        return 256, h // 8, w // 8
    if dataset == "camvid":
        return 64, h, w  # full-res 64-ch fusion (the psp18-CamVid quirk)
    return 512, h // 8, w // 8


def main():
    from reference_oracle import install_reference

    install_reference()
    sys.path.insert(0, "/root/reference")

    sd = torch.load(CKPT, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    # every reference WithFuse class names its CReFF module `fuse_attention`
    # (plain BiSeNet also has `conv_atten` ARM keys — don't match on 'atten')
    fuse = any(k.startswith("fuse_attention") for k in sd)
    print(f"checkpoint: {CKPT}, config={CONFIG}, {len(sd)} keys, fuse={fuse}",
          flush=True)

    ref = build_ref(CONFIG, fuse)
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    print("torch load: missing", missing, "unexpected", unexpected, flush=True)
    assert not unexpected, "wrong config for this checkpoint?"
    ref.eval()

    import jax
    import jax.numpy as jnp
    from arseg_tpu.models import build_model
    from arseg_tpu.utils.torch_convert import load_torch_checkpoint

    model = build_model(CONFIG, fuse=fuse)
    params = load_torch_checkpoint(CKPT, CONFIG)

    # structure check vs a fresh init
    init = model.init(jax.random.PRNGKey(0))
    pc = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    pi = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    only_c = sorted(set(pc) - set(pi))
    only_i = sorted(set(pi) - set(pc))
    mismat = sorted(k for k in set(pc) & set(pi) if pc[k] != pi[k])
    print("converted-only:", only_c[:10], flush=True)
    print("init-only:", only_i[:10], flush=True)
    print("shape-mismatch:", mismat[:10], flush=True)
    assert not only_c and not only_i and not mismat, "tree mismatch"

    h, w = SIZES[CONFIG.split("-")[0]]
    rng = np.random.RandomState(0)
    x = rng.randn(1, h, w, 3).astype(np.float32) * 0.8  # normalized-image range
    c, fh, fw = feat_channels(CONFIG)
    ref_p = rng.randn(1, c, fh, fw).astype(np.float32)

    t_out, t_feat = ref_forward(ref, CONFIG, fuse, x.transpose(0, 3, 1, 2), ref_p)
    t_out = t_out.transpose(0, 2, 3, 1)
    t_feat = t_feat.transpose(0, 2, 3, 1)
    ref_p_nhwc = ref_p.transpose(0, 2, 3, 1)

    rows = []
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        j_out, j_feat = ours_forward(model, params, CONFIG, fuse, x,
                                     ref_p_nhwc, dtype)
        d_logit = np.abs(j_out - t_out)
        d_feat = np.abs(j_feat - t_feat)
        agree = float((j_out.argmax(-1) == t_out.argmax(-1)).mean())
        rows.append(
            dict(config=CONFIG, fuse=fuse, mode=name,
                 logit_max=float(d_logit.max()), logit_mean=float(d_logit.mean()),
                 feat_max=float(d_feat.max()), feat_mean=float(d_feat.mean()),
                 argmax_agree=agree)
        )
        print(rows[-1], flush=True)
    return rows


if __name__ == "__main__":
    main()
