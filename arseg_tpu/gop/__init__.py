from arseg_tpu.gop.pipeline import ARPipeline
from arseg_tpu.gop.feeder import AsyncWriter, GOPFeeder
from arseg_tpu.gop.video_source import VideoGOPSource

__all__ = ["ARPipeline", "GOPFeeder", "AsyncWriter", "VideoGOPSource"]
