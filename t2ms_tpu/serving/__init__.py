"""Production serving: dynamic micro-batching over fixed-shape compiled
samplers. See engine.ServingEngine."""

from t2ms_tpu.serving.engine import (EngineOverloaded, GenerationResult,
                                     ServingEngine, make_serving_sampler)

__all__ = ["ServingEngine", "GenerationResult", "make_serving_sampler",
           "EngineOverloaded"]
