from arseg_tpu.data.camvid import CamVid, CamVidWithFlow
from arseg_tpu.data.cityscapes import CityScapes, CityScapesWithFlow
from arseg_tpu.data.loader import Loader

__all__ = [
    "CamVid",
    "CamVidWithFlow",
    "CityScapes",
    "CityScapesWithFlow",
    "Loader",
]
