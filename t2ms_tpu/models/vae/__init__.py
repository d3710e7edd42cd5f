from t2ms_tpu.models.vae.lavae import LAVAE, lavae_loss, smooth_l1_temporal_loss
from t2ms_tpu.models.vae.tsae import (TSae, TSaeDiffusion,
                                      tsae_adapter_loss, tsae_loss)

__all__ = ["LAVAE", "lavae_loss", "smooth_l1_temporal_loss",
           "TSae", "TSaeDiffusion", "tsae_adapter_loss", "tsae_loss"]
