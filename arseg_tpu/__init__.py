"""arseg_tpu — a TPU-native (JAX/XLA/Pallas) compressed-video semantic
segmentation framework with the capabilities of THU-LYJ-Lab/AR-Seg.

Inside each GOP of an HEVC-compressed video an expensive HR branch runs on
the keyframe and a cheap LR branch runs on the non-keyframes; LR quality is
recovered by CReFF (motion-vector warping of the keyframe's HR feature plus a
local cross-attention fusion, implemented as a fused Pallas kernel) and FST
training (MSE feature distillation from a frozen HR teacher).

Layout convention: all device tensors are NHWC (TPU-native); the reference is
NCHW. The checkpoint converter (utils/torch_convert.py) transposes weights.
"""

__version__ = "0.1.0"
