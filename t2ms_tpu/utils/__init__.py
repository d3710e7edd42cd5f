from t2ms_tpu.utils.prng import named_fold, root_key, step_key

__all__ = ["named_fold", "root_key", "step_key"]
