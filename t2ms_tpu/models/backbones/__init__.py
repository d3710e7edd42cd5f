from t2ms_tpu.models.backbones import ddpm, rectified_flow

__all__ = ["ddpm", "rectified_flow"]
