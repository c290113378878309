from arseg_tpu.gop.pipeline import ARPipeline
from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder

__all__ = ["ARPipeline", "GOPFeeder", "AsyncWriter"]
