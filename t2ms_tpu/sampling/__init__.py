from t2ms_tpu.sampling.sampler import (
    SamplerOutput,
    decode_trajectory,
    make_cfg_sampler,
)

__all__ = ["SamplerOutput", "decode_trajectory", "make_cfg_sampler"]
