"""t2ms_tpu — a TPU-native text-to-time-series diffusion framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
T2MS reference (T2S IJCAI'25 fork): length-adaptive VAEs, rectified-flow /
DDPM latent diffusion with DiT or MLP denoisers, text conditioning with
classifier-free guidance, the full evaluation suite (C-FID via TS2Vec,
CRPS/MRR/DTW/feature-based measures), motion datasets, skeleton rendering
and the offline dataset-construction pipeline.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  cli/        entry-point apps (train / infer / evaluate / pretrain_vae)
  training/   jitted training loops, optimizers, checkpoints (Orbax)
  sampling/   fused-CFG lax.scan samplers (euler/heun/midpoint/ddim)
  serving/    online dynamic-batching engine (+ cli.serve HTTP front-end)
  models/     backbones (flow math), denoisers (DiT/MLP), VAEs
  ops/        TPU kernels: resize-as-matmul, attention, fused adaLN
  data/       length-bucketed host pipelines (CSV + motion JSON)
  parallel/   mesh / sharding utilities (DP/TP over ICI)
  evaluate/   metrics, TS2Vec (JAX), DTW (native C++ + XLA)
  visualize/  skeleton animators, diagnostic plots
  pipeline/   offline dataset construction (captions, embeddings, mergers)
"""

__version__ = "0.1.0"

# Compile-once-per-machine: persistent XLA compilation cache (see
# config.enable_persistent_compilation_cache — opt out with
# T2MS_NO_COMPILE_CACHE=1). Enabled at import so every entry point (CLIs,
# bench, gate, tests) shares it without per-script wiring.
from t2ms_tpu.config import enable_persistent_compilation_cache as _epcc

_epcc()
del _epcc
