from t2ms_tpu.training.optim import (
    onecycle_adamw,
    vae_schedule,
    warmup_cosine_adamw,
)

__all__ = ["onecycle_adamw", "vae_schedule", "warmup_cosine_adamw"]
