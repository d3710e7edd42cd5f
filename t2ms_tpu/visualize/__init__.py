from t2ms_tpu.visualize.benchpress import (
    RearV_BenchpressAnimator,
    RearViewBenchpressAnimator,
    TopV_BenchpressAnimator,
    TopViewBenchpressAnimator,
)
from t2ms_tpu.visualize.diagnostics import (
    plot_comparison,
    plot_generation_figs,
    plot_pca_tsne,
    plot_side_by_side_comparison,
    save_diffusion_gif,
)

__all__ = [
    "RearV_BenchpressAnimator", "RearViewBenchpressAnimator",
    "TopV_BenchpressAnimator", "TopViewBenchpressAnimator",
    "plot_comparison", "plot_generation_figs", "plot_pca_tsne",
    "plot_side_by_side_comparison", "save_diffusion_gif",
]
