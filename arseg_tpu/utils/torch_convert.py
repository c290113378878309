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


# the reference registers these module OBJECTS under two attribute paths
# (`pspnet_semseg.py:169` final_conv = cls[-1]; `bisenet.py:428-429`
# feat_conv_out/final_conv = conv_out.conv/.conv_out), so its state_dicts
# carry both names; import dedupes to one tree node, export re-emits every
# registered path so strict torch loads pass
SHARED_EXPORT = {
    "cityscapes-psp18": {"cls.4": ("final_conv", "cls.4")},
    "camvid-bise18": {
        "conv_out.conv": ("feat_conv_out", "conv_out.conv"),
        "conv_out.conv_out": ("final_conv", "conv_out.conv_out"),
    },
}
SHARED_EXPORT["cityscapes-bise18"] = SHARED_EXPORT["camvid-bise18"]


def _invert_leaf(key: str, arr: np.ndarray):
    leaf = key.rsplit(".", 1)[-1]
    if leaf == "in_proj_weight":
        return arr  # kept in torch layout on import
    if leaf == "weight":
        if arr.ndim == 4:
            return arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        if arr.ndim == 2:
            return arr.transpose(1, 0)  # [in,out] -> [out,in]
    return arr


def export_state_dict(params, backend: str | None = None,
                      data_parallel: bool = False):
    """Inverse of convert_state_dict: arseg_tpu param tree -> reference
    torch state_dict, so models FST-trained here deploy straight back onto
    the reference's PyTorch stack (train on TPU, serve anywhere).

    Mechanics mirror the import in reverse: conv kernels HWIO -> OIHW,
    linear weights [in,out] -> [out,in], key aliases/substitutions
    inverted (longest-target-first), a zero `num_batches_tracked` emitted
    beside every BatchNorm `running_mean` (torch registers it; its value
    only matters for momentum=None training), and an optional DataParallel
    'module.' prefix. Keys the import drops are parameterless in the
    reference (e.g. bisenet's nn.Upsample `out_upsample`), so
    `module.load_state_dict(exported, strict=True)` passes — round-trip
    tested against the unmodified reference models
    (tests/test_torch_export.py). Returns {key: np.ndarray}; pass through
    torch.as_tensor / cli/convert.py --to_torch for a .pth."""
    if backend in ("psp-densenet", "psp-squeezenet"):
        # the densenet import DROPS the reference's duplicate 'feats.blocks.N'
        # registrations and flattens the stem Sequential — a strict-loadable
        # inverse needs the block->name duplication rebuilt; neither ablation
        # backbone is a deployment target, so refuse rather than emit a
        # state_dict that fails strict load
        raise NotImplementedError(
            f"export_state_dict does not support backend {backend!r} "
            "(ablation backbones; export the four headline configs)"
        )
    aliases = ALIASES.get(backend, {}) if backend else {}
    shared = SHARED_EXPORT.get(backend, {}) if backend else {}
    inv_aliases = {
        v: k for k, v in aliases.items() if v is not None and v not in shared
    }
    inv_subs = []
    for pattern, repl in SUBSTITUTIONS.get(backend, []) if backend else []:
        # the only substitution family is the densenet 'norm.1'->'norm1'
        # flattening; invert it structurally
        if pattern == r"(denselayer\d+)\.(norm|conv)\.(\d)\.":
            inv_subs.append((r"(denselayer\d+)\.(norm|conv)(\d)\.", r"\1.\2.\3."))
        else:  # pragma: no cover - no other substitution exists
            raise NotImplementedError(f"cannot invert substitution {pattern}")

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    out = {}
    for key, arr in flat.items():
        names = [key]
        for prefix in sorted(shared, key=len, reverse=True):
            if key == prefix or key.startswith(prefix + "."):
                names = [t + key[len(prefix):] for t in shared[prefix]]
                break
        else:
            for prefix in sorted(inv_aliases, key=len, reverse=True):
                if key == prefix or key.startswith(prefix + "."):
                    names = [inv_aliases[prefix] + key[len(prefix):]]
                    break
        for name in names:
            for pattern, repl in inv_subs:
                name = re.sub(pattern, repl, name)
            out[name] = _invert_leaf(name, arr)
            if name.endswith(".running_mean"):
                out[name[: -len("running_mean")] + "num_batches_tracked"] = (
                    np.zeros((), np.int64)
                )
    if data_parallel:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


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
