from t2ms_tpu.utils.logging import (JsonlLogger, StepTimer, plot_loss_curve,
                                    profile_trace, write_json_data)
from t2ms_tpu.utils.prng import (named_fold, root_key, seed_everything,
                                 step_key)

__all__ = ["JsonlLogger", "StepTimer", "named_fold", "plot_loss_curve",
           "profile_trace", "root_key", "seed_everything", "step_key",
           "write_json_data"]
