from t2ms_tpu.data.embedder import (
    FakeEmbedder,
    OpenAIEmbedder,
    PrecomputedEmbedder,
    get_embedder,
)
from t2ms_tpu.data.loaders import ArrayBatch, BucketBatcher
from t2ms_tpu.data.motion import (
    MotionRecord,
    load_motion_records,
    map_target_len,
    reference_random_split,
)
from t2ms_tpu.data.registry import DATA_DICT, csv_path_for
from t2ms_tpu.data.t2s import T2SData, load_t2s_csv, split_indices

__all__ = [
    "ArrayBatch", "BucketBatcher", "DATA_DICT", "FakeEmbedder",
    "MotionRecord", "OpenAIEmbedder", "PrecomputedEmbedder", "T2SData",
    "csv_path_for", "get_embedder", "load_motion_records", "load_t2s_csv",
    "map_target_len", "reference_random_split", "split_indices",
]
