"""Convert reference PyTorch checkpoints (.pth state_dicts) to arseg_tpu
param trees, replacing the reference's filename-parsing + key-renaming
machinery (`convert_model_for_cityscapes.py`, `train.py:51-59`).

Mechanics:
  * strip the DataParallel 'module.' prefix,
  * per-model key aliases (e.g. semseg 'layer0.0' -> 'backbone.conv1';
    shared-module aliases like bisenet 'final_conv' -> 'conv_out.conv_out'),
  * transpose conv kernels OIHW -> HWIO and linear weights [out,in]->[in,out]
    (MultiheadAttention in_proj_weight stays in torch layout [3E, E]),
  * drop num_batches_tracked.
"""

import re

import numpy as np
import jax.numpy as jnp

# key-prefix rewrites per model family (applied after 'module.' strip; first
# match wins; None = drop the key)
ALIASES = {
    "camvid-psp18": {},
    "cityscapes-psp18": {
        "layer0.0": "backbone.conv1",
        "layer0.1": "backbone.bn1",
        "layer1": "backbone.layer1",
        "layer2": "backbone.layer2",
        "layer3": "backbone.layer3",
        "layer4": "backbone.layer4",
        "final_conv": "cls.4",
    },
    "camvid-bise18": {
        "feat_conv_out": "conv_out.conv",
        "final_conv": "conv_out.conv_out",
        "out_upsample": None,
    },
}
ALIASES["cityscapes-bise18"] = ALIASES["camvid-bise18"]

# DenseNet torch modules register twice (ModuleList 'blocks.N' + named
# 'denseblockN'/'transitionN' attrs, reference `model/extractors.py:230-247`);
# keep the named keys, drop the duplicates, and flatten the stem Sequential.
ALIASES["psp-densenet"] = {
    "feats.start_features": "feats",
    "feats.blocks": None,
}
ALIASES["psp-squeezenet"] = {
    "feats.feat_1.0": "feats.feat_1.conv",
    "feats.feat_2.1": "feats.feat_2.fire1",
    "feats.feat_2.2": "feats.feat_2.fire2",
    "feats.feat_3.1": "feats.feat_3.fire1",
    "feats.feat_3.2": "feats.feat_3.fire2",
    "feats.feat_4.0": "feats.feat_4.fire1",
    "feats.feat_4.1": "feats.feat_4.fire2",
    "feats.feat_4.2": "feats.feat_4.fire3",
    "feats.feat_4.3": "feats.feat_4.fire4",
}

# mid-key regex rewrites (the dense layers name their modules 'norm.1'/
# 'conv.2', reference `model/extractors.py:168-175`; our tree uses dot-free
# names — scoped to denselayers so the PSP decoder's 'up_N.conv.1' Sequential
# indices stay untouched)
SUBSTITUTIONS = {
    "psp-densenet": [
        (r"(denselayer\d+)\.(norm|conv)\.(\d)\.", r"\1.\2\3."),
    ],
}


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _convert_leaf(key: str, arr: np.ndarray):
    leaf = key.rsplit(".", 1)[-1]
    if leaf == "num_batches_tracked":
        return None
    if leaf == "in_proj_weight":
        return arr  # torch layout kept; consumed as [3E, E]
    if leaf == "weight":
        if arr.ndim == 4:
            return arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.ndim == 2:
            return arr.transpose(1, 0)  # [out,in] -> [in,out]
    return arr


def _apply_alias(key: str, aliases: dict):
    for prefix in sorted(aliases, key=len, reverse=True):
        if key == prefix or key.startswith(prefix + "."):
            tgt = aliases[prefix]
            if tgt is None:
                return None
            return tgt + key[len(prefix) :]
    return key


def convert_state_dict(state_dict, backend: str | None = None):
    """state_dict: {torch_key: tensor/ndarray} -> nested arseg_tpu param tree."""
    aliases = ALIASES.get(backend, {}) if backend else {}
    substitutions = SUBSTITUTIONS.get(backend, []) if backend else []
    tree = {}
    seen = set()
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module.") :]
        key = _apply_alias(key, aliases)
        for pattern, repl in substitutions:
            if key is not None:
                key = re.sub(pattern, repl, key)
        if key is None or key in seen:
            continue
        seen.add(key)
        arr = _convert_leaf(key, _to_numpy(val))
        if arr is None:
            continue
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def load_torch_checkpoint(path: str, backend: str | None = None):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_state_dict(sd, backend)


def load_decoder_from(params, torch_params, final_conv_path="final_conv"):
    """Equivalent of reference load_decoder (`train.py:51-59`): copy the HR
    checkpoint's final_conv weights into `params` at `final_conv_path`."""
    node = torch_params
    for part in final_conv_path.split("."):
        node = node[part]
    out = dict(params)
    cursor = out
    parts = final_conv_path.split(".")
    for part in parts[:-1]:
        cursor[part] = dict(cursor[part])
        cursor = cursor[part]
    cursor[parts[-1]] = {"weight": node["weight"], "bias": node["bias"]}
    return out
