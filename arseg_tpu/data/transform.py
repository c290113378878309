"""Host-side augmentation pipelines (PIL/cv2/numpy), NHWC.

Re-implements the reference transform families (/root/reference
`dataset/transform.py`): single (im+label), pair (im+ref share every RNG
draw), and pairOF (the ref's "label" slot carries the motion-vector map; flip
negates the x component, scale resamples with cv2 INTER_NEAREST and — in the
V2 variant actually used — multiplies MV magnitude by the scale,
`dataset/transform.py:292-320`; crop slices the array).

RNG: a shared python `random.Random` instance passed at construction keeps
draw order identical to the reference (which uses the global `random`).
"""

import random as _random

import numpy as np
import cv2
from PIL import Image, ImageEnhance


class Pipeline:
    """Compose for single-sample dict {'im': PIL, 'lb': PIL} transforms."""

    def __init__(self, ops):
        self.ops = ops

    def __call__(self, im_lb):
        for op in self.ops:
            im_lb = op(im_lb)
        return im_lb


class PairPipeline:
    def __init__(self, ops):
        self.ops = ops

    def __call__(self, im_lb, ref_im_lb):
        for op in self.ops:
            im_lb, ref_im_lb = op(im_lb, ref_im_lb)
        return im_lb, ref_im_lb


class RandomCrop:
    def __init__(self, size, rng=None):
        self.size = size
        self.rng = rng or _random

    def _params(self, w, h):
        W, H = self.size
        resize = None
        if w < W or h < H:
            scale = float(W) / w if w < h else float(H) / h
            w, h = int(scale * w + 1), int(scale * h + 1)
            resize = (w, h)
        sw = self.rng.random() * (w - W)
        sh = self.rng.random() * (h - H)
        crop = (int(sw), int(sh), int(sw) + W, int(sh) + H)
        return resize, crop

    def __call__(self, im_lb):
        im, lb = im_lb["im"], im_lb["lb"]
        if (tuple(self.size)) == im.size:
            return im_lb
        resize, crop = self._params(*im.size)
        if resize:
            im = im.resize(resize, Image.BILINEAR)
            lb = lb.resize(resize, Image.NEAREST)
        return dict(im=im.crop(crop), lb=lb.crop(crop))


class HorizontalFlip:
    def __init__(self, p=0.5, rng=None):
        self.p = p
        self.rng = rng or _random

    def __call__(self, im_lb):
        if self.rng.random() > self.p:
            return im_lb
        return dict(
            im=im_lb["im"].transpose(Image.FLIP_LEFT_RIGHT),
            lb=im_lb["lb"].transpose(Image.FLIP_LEFT_RIGHT),
        )


class RandomScale:
    def __init__(self, scales=(1,), rng=None):
        self.scales = scales
        self.rng = rng or _random

    def __call__(self, im_lb):
        im, lb = im_lb["im"], im_lb["lb"]
        scale = self.rng.choice(self.scales)
        w, h = int(im.size[0] * scale), int(im.size[1] * scale)
        return dict(
            im=im.resize((w, h), Image.BILINEAR), lb=lb.resize((w, h), Image.NEAREST)
        )


class ColorJitter:
    def __init__(self, brightness=None, contrast=None, saturation=None, rng=None):
        self.rng = rng or _random
        self.brightness = [max(1 - brightness, 0), 1 + brightness] if brightness else None
        self.contrast = [max(1 - contrast, 0), 1 + contrast] if contrast else None
        self.saturation = [max(1 - saturation, 0), 1 + saturation] if saturation else None

    def _draw(self):
        return (
            self.rng.uniform(*self.brightness),
            self.rng.uniform(*self.contrast),
            self.rng.uniform(*self.saturation),
        )

    @staticmethod
    def _enhance(im, rb, rc, rs):
        im = ImageEnhance.Brightness(im).enhance(rb)
        im = ImageEnhance.Contrast(im).enhance(rc)
        return ImageEnhance.Color(im).enhance(rs)

    def __call__(self, im_lb):
        rb, rc, rs = self._draw()
        return dict(im=self._enhance(im_lb["im"], rb, rc, rs), lb=im_lb["lb"])


class MultiScale:
    def __init__(self, scales):
        self.scales = scales

    def __call__(self, img):
        W, H = img.size
        return [
            img.resize((int(W * r), int(H * r)), Image.BILINEAR) for r in self.scales
        ]


# ------------------------------------------------------------- pair variants


class PairColorJitter(ColorJitter):
    def __call__(self, im_lb, ref_im_lb):
        rb, rc, rs = self._draw()
        return (
            dict(im=self._enhance(im_lb["im"], rb, rc, rs), lb=im_lb["lb"]),
            dict(im=self._enhance(ref_im_lb["im"], rb, rc, rs), lb=ref_im_lb["lb"]),
        )


class PairHorizontalFlip(HorizontalFlip):
    def __call__(self, im_lb, ref_im_lb):
        if self.rng.random() > self.p:
            return im_lb, ref_im_lb
        f = lambda d: dict(
            im=d["im"].transpose(Image.FLIP_LEFT_RIGHT),
            lb=d["lb"].transpose(Image.FLIP_LEFT_RIGHT),
        )
        return f(im_lb), f(ref_im_lb)


class PairRandomScale(RandomScale):
    def __call__(self, im_lb, ref_im_lb):
        scale = self.rng.choice(self.scales)
        w, h = int(im_lb["im"].size[0] * scale), int(im_lb["im"].size[1] * scale)
        f = lambda d: dict(
            im=d["im"].resize((w, h), Image.BILINEAR),
            lb=d["lb"].resize((w, h), Image.NEAREST),
        )
        return f(im_lb), f(ref_im_lb)


class PairRandomCrop(RandomCrop):
    def __call__(self, im_lb, ref_im_lb):
        im, lb = im_lb["im"], im_lb["lb"]
        if tuple(self.size) == im.size:
            return im_lb, ref_im_lb
        resize, crop = self._params(*im.size)

        def f(d):
            i, l = d["im"], d["lb"]
            if resize:
                i = i.resize(resize, Image.BILINEAR)
                l = l.resize(resize, Image.NEAREST)
            return dict(im=i.crop(crop), lb=l.crop(crop))

        return f(im_lb), f(ref_im_lb)


# ----------------------------------------------------------- pairOF variants
# ref_im_lb['lb'] is the [H, W, 2] motion-vector array.


def _resize_flow_nearest(flow, w, h):
    # the reference pads to 3 channels before cv2.resize; behaviour-identical
    flow3 = np.concatenate([flow, flow[..., 0:1]], axis=-1)
    flow3 = cv2.resize(flow3, dsize=(w, h), interpolation=cv2.INTER_NEAREST)
    return flow3[..., :2]


class PairOFHorizontalFlip(HorizontalFlip):
    def __call__(self, im_lb, ref_im_lb):
        if self.rng.random() > self.p:
            return im_lb, ref_im_lb
        flow = np.array(ref_im_lb["lb"])
        flow[..., 0] = -flow[..., 0]
        flow = np.fliplr(flow)
        return (
            dict(
                im=im_lb["im"].transpose(Image.FLIP_LEFT_RIGHT),
                lb=im_lb["lb"].transpose(Image.FLIP_LEFT_RIGHT),
            ),
            dict(im=ref_im_lb["im"].transpose(Image.FLIP_LEFT_RIGHT), lb=flow),
        )


class PairOFRandomScaleV2(RandomScale):
    """Resize + multiply MV magnitude by the scale (transform.py:292-320)."""

    def __call__(self, im_lb, ref_im_lb):
        scale = self.rng.choice(self.scales)
        w, h = int(im_lb["im"].size[0] * scale), int(im_lb["im"].size[1] * scale)
        flow = _resize_flow_nearest(np.asarray(ref_im_lb["lb"]), w, h) * scale
        return (
            dict(
                im=im_lb["im"].resize((w, h), Image.BILINEAR),
                lb=im_lb["lb"].resize((w, h), Image.NEAREST),
            ),
            dict(im=ref_im_lb["im"].resize((w, h), Image.BILINEAR), lb=flow),
        )


class PairOFRandomScale(RandomScale):
    """V1: resize without magnitude rescale (transform.py:263-289)."""

    def __call__(self, im_lb, ref_im_lb):
        scale = self.rng.choice(self.scales)
        w, h = int(im_lb["im"].size[0] * scale), int(im_lb["im"].size[1] * scale)
        flow = _resize_flow_nearest(np.asarray(ref_im_lb["lb"]), w, h)
        return (
            dict(
                im=im_lb["im"].resize((w, h), Image.BILINEAR),
                lb=im_lb["lb"].resize((w, h), Image.NEAREST),
            ),
            dict(im=ref_im_lb["im"].resize((w, h), Image.BILINEAR), lb=flow),
        )


class PairOFRandomCrop(RandomCrop):
    def __call__(self, im_lb, ref_im_lb):
        im, lb = im_lb["im"], im_lb["lb"]
        if tuple(self.size) == im.size:
            return im_lb, ref_im_lb
        resize, crop = self._params(*im.size)
        ref_im, flow = ref_im_lb["im"], np.asarray(ref_im_lb["lb"])
        if resize:
            im = im.resize(resize, Image.BILINEAR)
            lb = lb.resize(resize, Image.NEAREST)
            ref_im = ref_im.resize(resize, Image.BILINEAR)
            flow = _resize_flow_nearest(flow, *resize)
        flow = flow[crop[1] : crop[3], crop[0] : crop[2], :]
        return (
            dict(im=im.crop(crop), lb=lb.crop(crop)),
            dict(im=ref_im.crop(crop), lb=flow),
        )


def normalize(img, mean, std):
    """PIL/uint8 HWC -> float32 HWC normalized (torch ToTensor+Normalize)."""
    x = np.asarray(img, dtype=np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
