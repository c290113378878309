"""ResNet backbones, NHWC functional, torch-parity.

Two families used by the reference:

* Dilated ResNet (PSPNet backbones): 8x downsample, layer3/layer4 dilated
  (reference `model/extractors.py:108-158`). Two dilation styles exist:
  - "arseg": extractors behavior — the FIRST block of a layer keeps
    dilation 1 in both convs (extractors._make_layer only passes dilation to
    blocks 1+), later blocks use (d, d).
  - "semseg": after the hszhao/semseg surgery (`model/pspnet_semseg.py:59-68`)
    conv2 of EVERY block in layer3/4 is dilated: block0 (1, d), later (d, d).

* Standard ResNet-18/34 (BiSeNet context path, `model/bisenet.py:70-158`):
  strides (1,2,2,2), no dilation, returns (feat8, feat16, feat32).

Param tree mirrors torch module names: conv1, bn1, layer{1..4}.{i}.{conv1,
bn1, conv2, bn2, downsample.{0,1}} (+conv3/bn3 for bottlenecks).
"""

from arseg_tpu.nn import functional as Fn
from arseg_tpu.nn import init as Init

RESNET_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}
EXPANSION = {"basic": 1, "bottleneck": 4}


def make_resnet_config(depth: int, variant: str):
    """variant: 'arseg' | 'semseg' (dilated, 8x) or 'bisenet' (strided, 32x).

    Returns a list of per-layer lists of per-block dicts:
      {stride, dil1, dil2, downsample}   (dil2 applies to conv2; bottleneck
      conv2 carries both stride and dilation, conv1/conv3 are 1x1)."""
    block_type, counts = RESNET_LAYERS[depth]
    exp = EXPANSION[block_type]
    if variant in ("arseg", "semseg"):
        strides = (1, 2, 1, 1)
        dilations = (1, 1, 2, 4)
    elif variant == "bisenet":
        strides = (1, 2, 2, 2)
        dilations = (1, 1, 1, 1)
    else:
        raise ValueError(variant)

    layers = []
    inplanes = 64
    for li, (count, stride, dil) in enumerate(zip(counts, strides, dilations)):
        planes = 64 * (2**li)
        blocks = []
        for bi in range(count):
            s = stride if bi == 0 else 1
            if bi == 0:
                dil1 = 1
                dil2 = dil if variant == "semseg" else 1
            else:
                dil1 = dil
                dil2 = dil
            ds = bi == 0 and (s != 1 or inplanes != planes * exp)
            blocks.append(
                dict(
                    stride=s,
                    dil1=dil1,
                    dil2=dil2,
                    downsample=ds,
                    cin=inplanes,
                    planes=planes,
                )
            )
            inplanes = planes * exp
        layers.append(blocks)
    return dict(block_type=block_type, layers=layers, expansion=exp)


def init_resnet(rng: Init.RngStream, cfg, input_channel: int = 3, style: str = "msra"):
    """style 'msra' = extractors init; 'default' = torch Conv2d default."""
    conv = Init.conv_msra if style == "msra" else Init.conv_kaiming_uniform
    exp = cfg["expansion"]
    p = {
        "conv1": conv(rng, 7, 7, input_channel, 64, bias=False),
        "bn1": Init.bn_default(64),
    }
    for li, blocks in enumerate(cfg["layers"]):
        lp = {}
        for bi, b in enumerate(blocks):
            cin, planes = b["cin"], b["planes"]
            if cfg["block_type"] == "basic":
                bp = {
                    "conv1": conv(rng, 3, 3, cin, planes, bias=False),
                    "bn1": Init.bn_default(planes),
                    "conv2": conv(rng, 3, 3, planes, planes, bias=False),
                    "bn2": Init.bn_default(planes),
                }
            else:
                bp = {
                    "conv1": conv(rng, 1, 1, cin, planes, bias=False),
                    "bn1": Init.bn_default(planes),
                    "conv2": conv(rng, 3, 3, planes, planes, bias=False),
                    "bn2": Init.bn_default(planes),
                    "conv3": conv(rng, 1, 1, planes, planes * 4, bias=False),
                    "bn3": Init.bn_default(planes * 4),
                }
            if b["downsample"]:
                bp["downsample"] = {
                    "0": conv(rng, 1, 1, cin, planes * exp, bias=False),
                    "1": Init.bn_default(planes * exp),
                }
            lp[str(bi)] = bp
        p[f"layer{li + 1}"] = lp
    return p


def _basic_block(p, x, ctx, path, b):
    out = Fn.conv2d(p["conv1"], x, stride=b["stride"], padding=b["dil1"], dilation=b["dil1"])
    out = Fn.relu(Fn.batch_norm(p["bn1"], out, ctx, path + ".bn1"))
    out = Fn.conv2d(p["conv2"], out, stride=1, padding=b["dil2"], dilation=b["dil2"])
    out = Fn.batch_norm(p["bn2"], out, ctx, path + ".bn2")
    if "downsample" in p:
        res = Fn.conv2d(p["downsample"]["0"], x, stride=b["stride"])
        res = Fn.batch_norm(p["downsample"]["1"], res, ctx, path + ".downsample.1")
    else:
        res = x
    return Fn.relu(out + res)


def _bottleneck_block(p, x, ctx, path, b):
    out = Fn.conv2d(p["conv1"], x)
    out = Fn.relu(Fn.batch_norm(p["bn1"], out, ctx, path + ".bn1"))
    out = Fn.conv2d(p["conv2"], out, stride=b["stride"], padding=b["dil2"], dilation=b["dil2"])
    out = Fn.relu(Fn.batch_norm(p["bn2"], out, ctx, path + ".bn2"))
    out = Fn.conv2d(p["conv3"], out)
    out = Fn.batch_norm(p["bn3"], out, ctx, path + ".bn3")
    if "downsample" in p:
        res = Fn.conv2d(p["downsample"]["0"], x, stride=b["stride"])
        res = Fn.batch_norm(p["downsample"]["1"], res, ctx, path + ".downsample.1")
    else:
        res = x
    return Fn.relu(out + res)


def resnet_stem(p, x, ctx, path=""):
    if Fn.stem_s2d4_enabled(ctx) and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        # serving path: block-form stem + parity maxpool (see functional.py
        # STEM_S2D4_BLOCKS — same math, 4x the MXU contraction depth)
        b = Fn.conv_stem_s2d4_blocks(p["conv1"], x)
        b = Fn.relu(Fn.batch_norm(Fn.tile_bn4(p["bn1"]), b, ctx, path + "bn1"))
        if Fn.S2D4_POOL_HALF_D2S_BATCH and b.shape[0] > 1:
            # half d2s: only the row parity unblocks (128-aligned lane
            # split), W parity resolves at the pooled tensor (bitwise)
            return Fn.max_pool_3x3_s2_p1_blocks_half(b)
        if Fn.S2D4_POOL_D2S_BATCH and b.shape[0] > 1:
            # r4m profile: at batch>1 LR shapes the parity-max chain costs
            # ~0.52 ms vs reduce_window's 0.25 — unblock + pool instead
            # (bitwise-equal; the r4j HR n==1 win keeps the parity form)
            return Fn.max_pool_3x3_s2_p1(Fn.d2s_blocks(b))
        return Fn.max_pool_3x3_s2_p1_blocks(b)
    x = Fn.conv2d(p["conv1"], x, stride=2, padding=3)
    x = Fn.relu(Fn.batch_norm(p["bn1"], x, ctx, path + "bn1"))
    return Fn.max_pool_3x3_s2_p1(x)


def resnet_layer(p, x, cfg, li, ctx, path_prefix=""):
    blocks = cfg["layers"][li]
    block_fn = _basic_block if cfg["block_type"] == "basic" else _bottleneck_block
    lp = p[f"layer{li + 1}"]
    for bi, b in enumerate(blocks):
        x = block_fn(lp[str(bi)], x, ctx, f"{path_prefix}layer{li + 1}.{bi}", b)
    return x


def resnet_apply(p, x, cfg, ctx, path_prefix="", return_stages=False):
    """Full backbone. Dilated variants return (x4, x3) like extractors
    (`model/extractors.py:146-158`); with return_stages=True returns
    (feat8, feat16, feat32) like the BiSeNet Resnet (`model/bisenet.py:84-94`)."""
    x = resnet_stem(p, x, ctx, path_prefix)
    x = resnet_layer(p, x, cfg, 0, ctx, path_prefix)
    x2 = resnet_layer(p, x, cfg, 1, ctx, path_prefix)
    x3 = resnet_layer(p, x2, cfg, 2, ctx, path_prefix)
    x4 = resnet_layer(p, x3, cfg, 3, ctx, path_prefix)
    if return_stages:
        return x2, x3, x4
    return x4, x3
