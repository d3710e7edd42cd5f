from t2ms_tpu.models.denoisers.dit import DiT, sinusoidal_positions, time_embedding
from t2ms_tpu.models.denoisers.mlp import MLPDenoiser

__all__ = ["DiT", "MLPDenoiser", "sinusoidal_positions", "time_embedding"]
