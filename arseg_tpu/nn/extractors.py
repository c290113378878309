"""Non-ResNet PSPNet backbones: DenseNet-121 (8x) and SqueezeNet, NHWC
functional, torch-name-compatible param trees.

Parity targets in the reference backbone factory:
  * DenseNet (`model/extractors.py:165-260`): torchvision densenet121
    topology with downsampling reduced to 8x — stem conv s2 + maxpool s2,
    then ONLY the first transition average-pools (`downsample = i < 1`,
    `model/extractors.py:244`); returns (final 1024-ch feature, the
    transition3 output 512-ch as deep supervision feature — tapped at block
    index 5, `model/extractors.py:256-260`).
  * SqueezeNet (`model/extractors.py:263-320`): squeezenet1_1 feature stack
    regrouped into feat_1..feat_4 with dilation 2 in feat_3's fires and 4 in
    feat_4's; returns (f4 512-ch @ 1/8, f3 256-ch).
"""

import jax.numpy as jnp
from jax import lax

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init


def _avg_pool_2x2(x):
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return out / 4.0


# ----------------------------------------------------------------- DenseNet

DENSENET121 = dict(growth_rate=32, block_config=(6, 12, 24, 16),
                   num_init_features=64, bn_size=4)


def init_densenet121(rng: Init.RngStream, input_channel: int = 3):
    cfg = DENSENET121
    g, bn_size = cfg["growth_rate"], cfg["bn_size"]
    p = {
        "conv0": Init.conv_msra(rng, 7, 7, input_channel, cfg["num_init_features"]),
        "norm0": Init.bn_default(cfg["num_init_features"]),
    }
    c = cfg["num_init_features"]
    for bi, n_layers in enumerate(cfg["block_config"]):
        block = {}
        for li in range(n_layers):
            cin = c + li * g
            block[f"denselayer{li + 1}"] = {
                "norm1": Init.bn_default(cin),
                "conv1": Init.conv_msra(rng, 1, 1, cin, bn_size * g),
                "norm2": Init.bn_default(bn_size * g),
                "conv2": Init.conv_msra(rng, 3, 3, bn_size * g, g),
            }
        p[f"denseblock{bi + 1}"] = block
        c += n_layers * g
        if bi != len(cfg["block_config"]) - 1:
            p[f"transition{bi + 1}"] = {
                "norm": Init.bn_default(c),
                "conv": Init.conv_msra(rng, 1, 1, c, c // 2),
            }
            c //= 2
    return p


def apply_densenet121(p, x, ctx, path=""):
    cfg = DENSENET121
    y = Fn.conv2d(p["conv0"], x, stride=2, padding=3)
    y = Fn.relu(Fn.batch_norm(p["norm0"], y, ctx, path + "norm0"))
    y = Fn.max_pool_3x3_s2_p1(y)

    deep = None
    for bi, n_layers in enumerate(cfg["block_config"]):
        block = p[f"denseblock{bi + 1}"]
        bpath = f"{path}denseblock{bi + 1}."
        for li in range(n_layers):
            lp = block[f"denselayer{li + 1}"]
            lpath = f"{bpath}denselayer{li + 1}."
            new = Fn.relu(Fn.batch_norm(lp["norm1"], y, ctx, lpath + "norm1"))
            new = Fn.conv2d(lp["conv1"], new)
            new = Fn.relu(Fn.batch_norm(lp["norm2"], new, ctx, lpath + "norm2"))
            new = Fn.conv2d(lp["conv2"], new, padding=1)
            y = jnp.concatenate([y, new], axis=-1)
        if bi != len(cfg["block_config"]) - 1:
            tp = p[f"transition{bi + 1}"]
            tpath = f"{path}transition{bi + 1}."
            y = Fn.relu(Fn.batch_norm(tp["norm"], y, ctx, tpath + "norm"))
            y = Fn.conv2d(tp["conv"], y)
            if bi < 1:  # only transition1 downsamples (extractors.py:244)
                y = _avg_pool_2x2(y)
            if bi == 2:  # blocks list index 5 == transition3 (extractors.py:256)
                deep = y
    return y, deep


# ---------------------------------------------------------------- SqueezeNet

SQUEEZENET_FIRES = {
    # name: (cin, squeeze, expand1x1, expand3x3, dilation)
    "feat_2": [("fire1", 64, 16, 64, 64, 1), ("fire2", 128, 16, 64, 64, 1)],
    "feat_3": [("fire1", 128, 32, 128, 128, 2), ("fire2", 256, 32, 128, 128, 2)],
    "feat_4": [
        ("fire1", 256, 48, 192, 192, 4),
        ("fire2", 384, 48, 192, 192, 4),
        ("fire3", 384, 64, 256, 256, 4),
        ("fire4", 512, 64, 256, 256, 4),
    ],
}


def init_squeezenet(rng: Init.RngStream, input_channel: int = 3):
    p = {"feat_1": {"conv": Init.conv_kaiming_uniform(rng, 3, 3, input_channel, 64)}}
    for group, fires in SQUEEZENET_FIRES.items():
        gp = {}
        for name, cin, sq, e1, e3, _dil in fires:
            gp[name] = {
                "squeeze": Init.conv_kaiming_uniform(rng, 1, 1, cin, sq),
                "expand1x1": Init.conv_kaiming_uniform(rng, 1, 1, sq, e1),
                "expand3x3": Init.conv_kaiming_uniform(rng, 3, 3, sq, e3),
            }
        p[group] = gp
    return p


def _fire(p, x, dilation):
    s = Fn.relu(Fn.conv2d(p["squeeze"], x))
    return jnp.concatenate(
        [
            Fn.relu(Fn.conv2d(p["expand1x1"], s)),
            Fn.relu(Fn.conv2d(p["expand3x3"], s, padding=dilation, dilation=dilation)),
        ],
        axis=-1,
    )


def apply_squeezenet(p, x, ctx, path=""):
    del ctx, path  # no batch norm in squeezenet1_1
    y = Fn.relu(Fn.conv2d(p["feat_1"]["conv"], x, stride=2, padding=1))
    y = Fn.max_pool_3x3_s2_p1(y)
    for name, *_rest, dil in SQUEEZENET_FIRES["feat_2"]:
        y = _fire(p["feat_2"][name], y, dil)
    y = Fn.max_pool_3x3_s2_p1(y)
    for name, *_rest, dil in SQUEEZENET_FIRES["feat_3"]:
        y = _fire(p["feat_3"][name], y, dil)
    f3 = y
    for name, *_rest, dil in SQUEEZENET_FIRES["feat_4"]:
        y = _fire(p["feat_4"][name], y, dil)
    return y, f3


# ------------------------------------------------------------------ factory

BACKBONE_FEATURES = {
    # backend -> (psp_size, deep_features_size)
    "densenet": (1024, 512),
    "squeezenet": (512, 256),
}


def init_backbone(rng, backend, input_channel=3):
    if backend == "densenet":
        return init_densenet121(rng, input_channel)
    if backend == "squeezenet":
        return init_squeezenet(rng, input_channel)
    raise ValueError(f"unknown backbone {backend}")


def apply_backbone(p, x, backend, ctx, path=""):
    if backend == "densenet":
        return apply_densenet121(p, x, ctx, path)
    if backend == "squeezenet":
        return apply_squeezenet(p, x, ctx, path)
    raise ValueError(f"unknown backbone {backend}")
