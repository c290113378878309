"""Native checkpoint format: flattened-key .npz + explicit JSON metadata.

Replaces the reference's filename-encoded metadata (scale/epoch parsed out of
'PSPNet_{backend}_{scale}_{epoch}_.pth', `evaluation.py:313`,
`train_pair.py:197`) with an explicit metadata dict (dataset, backbone,
scale, epoch, mIoU, ...). The eval protocol still understands the reference
filename convention for drop-in use of released checkpoints (.pth via
utils/torch_convert).
"""

import json
import os

import numpy as np
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(path, params, metadata=None, opt_state=None):
    """path: .npz file. Optimizer state (a pytree of arrays) is stored under
    reserved '__opt__/' keys, enabling true resume (absent in the reference)."""
    flat = _flatten({"params": params})
    if opt_state is not None:
        import jax

        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"__opt__/{i}"] = np.asarray(leaf)
    path = os.fspath(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    meta_path = os.path.splitext(path)[0] + ".json"
    with open(meta_path, "w") as f:
        json.dump(metadata or {}, f, indent=2, default=str)


def load_checkpoint(path, opt_state_template=None):
    path = os.fspath(path)
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat = {k: data[k] for k in data.files if not k.startswith("__opt__/")}
    tree = _unflatten(flat)
    out = {"params": tree.get("params", tree)}
    meta_path = os.path.splitext(path)[0] + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["metadata"] = json.load(f)
    if opt_state_template is not None and "__opt__/0" in data.files:
        import jax

        n = len(jax.tree_util.tree_leaves(opt_state_template))
        stored = sum(1 for k in data.files if k.startswith("__opt__/"))
        if stored != n:
            raise ValueError(
                f"checkpoint stores {stored} optimizer-state leaves but the "
                f"template has {n} — optimizer/flags differ from the saving run"
            )
        leaves = [data[f"__opt__/{i}"] for i in range(n)]
        out["opt_state"] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state_template), [jnp.asarray(l) for l in leaves]
        )
    return out
