"""Offline preprocessing tools (host-side, L0 of the layer map).

`video` binds the native arsegvid library (native/arsegvid.cpp); `labels`
converts CamVid RGB annotations to index maps; `preprocess` drives
compressed-dataset generation for CamVid/Cityscapes.
"""

from arseg_tpu.tools.video import (  # noqa: F401
    NativeVideo,
    load_native,
    merge_motion_np,
)
