from arseg_tpu.models.registry import build_model, phase2_argmax_head, MODELS

__all__ = ["build_model", "phase2_argmax_head", "MODELS"]
