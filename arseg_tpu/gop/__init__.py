from arseg_tpu.gop.pipeline import ARPipeline

__all__ = ["ARPipeline"]
