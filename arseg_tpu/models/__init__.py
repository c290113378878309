from arseg_tpu.models.registry import build_model, MODELS

__all__ = ["build_model", "MODELS"]
