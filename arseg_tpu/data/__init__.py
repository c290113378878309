from arseg_tpu.data.camvid import (
    CamVid,
    CamVidWithBiFlow,
    CamVidWithFlow,
    CamVidWithFlowTest,
    CamVidwithCUmap,
    CamVidwithCUmapSingleBranch,
)
from arseg_tpu.data.cityscapes import CityScapes, CityScapesWithFlow
from arseg_tpu.data.loader import Loader

__all__ = [
    "CamVid",
    "CamVidWithBiFlow",
    "CamVidWithFlow",
    "CamVidWithFlowTest",
    "CamVidwithCUmap",
    "CamVidwithCUmapSingleBranch",
    "CityScapes",
    "CityScapesWithFlow",
    "Loader",
]
