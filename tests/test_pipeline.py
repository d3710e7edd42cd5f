"""Offline pipeline tests with fake LLM clients: caption generation
(resumable), embedding enrichment, corpus build -> CSV -> loadable by the
T2S parser, mergers, validators, best-of-N selection."""

import json
import os

import numpy as np
import pytest

from t2ms_tpu.pipeline.captions import clip_caption, generate_captions
from t2ms_tpu.pipeline.corpus import (check_directory, corpus_to_csv,
                                      cosine_similarity, find_missing_ids,
                                      generate_corpus, select_best_captions,
                                      sliding_windows, validate_sample_json)
from t2ms_tpu.pipeline.embeddings import (build_prefix, enrich_captions,
                                          subject_classes)
from t2ms_tpu.pipeline.llm import FakeChat, FakeEmbed
from t2ms_tpu.pipeline.mergers import (perpendicular_distance,
                                       wrist_to_shoulder_distances)


def test_sliding_windows():
    w = sliding_windows(list(range(10)), 4)
    assert len(w) == 6
    assert w[0] == [0, 1, 2, 3] and w[-1] == [5, 6, 7, 8]


def test_caption_generation_resumable(tmp_path):
    data = {"subj_correct": {"clip0": {
        "feature_0": [1.0, 2.0], "feature_1": [2.0, 3.0],
        "feature_2": [0.1, 0.2], "feature_3": [3.0, 1.0],
        "feature_4": [1.0, 0.5]}}}
    dp = tmp_path / "data.json"
    dp.write_text(json.dumps(data))
    out = str(tmp_path / "captions")
    n = generate_captions(FakeChat(), str(dp), out, {}, make_figures=False)
    assert n == 1
    cap = json.loads(open(os.path.join(out, "subj_correct", "clip0",
                                       "caption.json")).read())
    assert cap["Summary"].startswith("synthetic summary")
    # resumable: second run skips
    assert generate_captions(FakeChat(), str(dp), out, {},
                             make_figures=False) == 0


def test_embedding_enrichment(tmp_path):
    data = {"s_tilting_to_the_right_elbows_flaring": {
        "c0": {"feature_0": [1.0] * 7}}}
    dp = tmp_path / "data.json"
    dp.write_text(json.dumps(data))
    croot = tmp_path / "caps"
    d = croot / "s_tilting_to_the_right_elbows_flaring" / "c0"
    d.mkdir(parents=True)
    (d / "caption.json").write_text(json.dumps({"Summary": "hello"}))
    n = enrich_captions(FakeEmbed(), str(dp), str(croot))
    assert n == 1
    cap = json.loads((d / "caption.json").read_text())
    assert len(cap["Prefix_embedding"]) == 128
    assert len(cap["Summary_embedding"]) == 128
    assert "7 frames" in cap["Prefix"]
    assert "tilting to the right and elbows flaring" in cap["Prefix"]


def test_subject_classes_and_prefix():
    assert subject_classes("x_correct_y") == "correct"
    assert subject_classes("nothing") == "unknown"
    assert "categorized as correct" in build_prefix(36, "correct")


def test_corpus_generation_to_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    series = np.sin(np.linspace(0, 20, 40)) + 0.1 * rng.standard_normal(40)
    out = str(tmp_path / "corpus")
    n = generate_corpus(FakeChat(), FakeEmbed(), series, 24, out)
    assert n == 16  # 40 - 24 windows
    assert find_missing_ids(out) == []
    assert check_directory(out, 24) == []
    ok, _ = validate_sample_json(os.path.join(out, "data_sample_0_1.json"),
                                 24)
    assert ok
    csv_path = str(tmp_path / "embedding_cleaned_synth_24.csv")
    assert corpus_to_csv(out, csv_path, 24) == 16
    from t2ms_tpu.data.t2s import load_t2s_csv
    ds = load_t2s_csv("embedding_cleaned_synth_24", str(tmp_path), "train",
                      proportion=0.9)
    assert ds.samples.shape == (15, 24)
    assert ds.embeddings.shape == (15, 128)

    # resumability: progress file short-circuits a second run
    assert generate_corpus(FakeChat(), FakeEmbed(), series, 24, out) == 0


def test_validation_catches_bad_samples(tmp_path):
    bad = tmp_path / "data_sample_3_1.json"
    bad.write_text(json.dumps({"sampled_time_series": [1, 2],
                               "embedding": [0.0] * 5}))
    ok, msg = validate_sample_json(str(bad), 24)
    assert not ok and "sampled_time_series" in msg
    issues = check_directory(str(tmp_path), 24)
    assert len(issues) == 1
    assert find_missing_ids(str(tmp_path)) == []


def test_cosine_and_best_of_n():
    a = np.array([1.0, 0.0])
    assert cosine_similarity(a, a) == pytest.approx(1.0)
    assert cosine_similarity(a, -a) == pytest.approx(-1.0)
    assert cosine_similarity(a, np.zeros(2)) == 0.0
    embs = {0: np.stack([a, a, -a])}
    # candidates 0/1 agree, 2 is opposite -> winner in {0,1}
    assert select_best_captions(embs)[0] in (0, 1)


def test_perpendicular_distance_and_wrist_geometry():
    # line y=0 from (0,0) to (2,0); point (1,3) -> distance 3
    assert perpendicular_distance([1, 3], [0, 0], [2, 0]) == pytest.approx(3)
    assert perpendicular_distance([1, 1], [0, 0], [0, 0]) is None
    pose = [[0, 0], [2, 0], [0, -2], [2, -2], [0, -1], [2, -1],
            [0.5, -1.5], [1.5, -2.5]]
    d = wrist_to_shoulder_distances([pose])
    assert d[0][0] == pytest.approx(1.5)   # right wrist to shoulder line
    assert d[0][1] == pytest.approx(2.5)


def test_clip_caption_json_parsing():
    feats = {"f0": [1, 2], "f1": [2, 3], "f2": [1, 1], "f3": [0, 1]}
    cap = clip_caption(FakeChat(), feats, {})
    assert "Summary" in cap
