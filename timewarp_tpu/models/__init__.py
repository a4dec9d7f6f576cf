from timewarp_tpu.models.constructor import build_model, ModelConfig

__all__ = ["build_model", "ModelConfig"]
