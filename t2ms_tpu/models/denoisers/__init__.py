from t2ms_tpu.models.denoisers.dit import DiT, sinusoidal_positions, time_embedding
from t2ms_tpu.models.denoisers.dit_fast import (fast_dit_forward,
                                                fast_forward_supported)
from t2ms_tpu.models.denoisers.mlp import MLPDenoiser

__all__ = ["DiT", "MLPDenoiser", "sinusoidal_positions", "time_embedding",
           "fast_dit_forward", "fast_forward_supported"]
