from t2ms_tpu.evaluate.dtw import (calculate_dtw, dtw_jax, dtw_jax_batch,
                                   dtw_native, dtw_numpy)
from t2ms_tpu.evaluate.feature_measures import (calculate_acd, calculate_kd,
                                                calculate_mdd, calculate_sd)
from t2ms_tpu.evaluate.fid import calculate_fid
from t2ms_tpu.evaluate.metrics import (MinMaxScaler,
                                       calculate_correlational_score,
                                       calculate_crps, calculate_ed,
                                       calculate_mrr, calculate_mse,
                                       calculate_sequence_correlation,
                                       calculate_wape, min_max_normalize_columns,
                                       mrr_at_10, normalize_per_row,
                                       sequence_correlation, wape,
                                       zscore_normalize_columns)
from t2ms_tpu.evaluate.ts2vec import TS2Vec, initialize_ts2vec

__all__ = [
    "TS2Vec", "calculate_acd", "calculate_correlational_score",
    "calculate_crps", "calculate_dtw", "calculate_ed", "calculate_fid",
    "calculate_kd", "calculate_mdd", "calculate_mrr", "calculate_mse",
    "calculate_sd", "calculate_sequence_correlation", "calculate_wape",
    "dtw_jax", "dtw_jax_batch", "dtw_native", "dtw_numpy",
    "initialize_ts2vec", "min_max_normalize_columns", "mrr_at_10",
    "MinMaxScaler", "normalize_per_row", "sequence_correlation", "wape",
    "zscore_normalize_columns",
]
