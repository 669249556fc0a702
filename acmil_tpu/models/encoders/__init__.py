from acmil_tpu.models.encoders.build import build_encoder, CustomModel, ENCODER_SPECS

__all__ = ["build_encoder", "CustomModel", "ENCODER_SPECS"]
