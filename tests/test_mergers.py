"""FeatureMerger tests over synthetic recording directory trees."""

import json
import os

import numpy as np
import pytest

from t2ms_tpu.pipeline.mergers import (BenchpressFeatureMerger,
                                       DeadliftFeatureMerger)

BP_FEATURE = {f"feature_{i}": n for i, n in enumerate(
    ["bar_x", "bar_y", "barx/bar_y", "left_shoulder_y", "right_shoulder_y",
     "left_dist", "right_dist", "left_elbow", "left_shoulder", "right_elbow",
     "right_shoulder", "left_torso-arm", "right_torso-arm"])}

DL_FEATURE = {f"feature_{i}": n for i, n in enumerate(
    ["left_knee", "left_hip", "right_knee", "right_hip", "body_length",
     "left_torso-arm", "right_torso-arm"])}


def _write_benchpress_tree(root, n_frames=6):
    subj = root / "correct" / "subjA"
    angles = ["left_elbow", "left_shoulder", "right_elbow", "right_shoulder",
              "left_torso-arm", "right_torso-arm"]
    for view, names in (("rear", angles[:4]), ("top", angles[4:])):
        for name in names:
            d = subj / "angle_dataset" / view / name
            d.mkdir(parents=True, exist_ok=True)
            (d / "clip1.txt").write_text("\n".join(
                f"{i},{90 + i}" for i in range(n_frames)))
    lat = subj / "coordinate_dataset" / "lateral_view"
    lat.mkdir(parents=True)
    (lat / "clip1.txt").write_text("\n".join(
        f"{i},{100 + i},{200 + i}" for i in range(n_frames)))
    rear = subj / "coordinate_dataset" / "rear_view"
    rear.mkdir(parents=True)
    (rear / "clip1.txt").write_text("\n".join(
        f"Frame {i}: [[(10, {300 + i}), (20, {310 + i}), (1, 1)]]"
        for i in range(n_frames)))
    top = subj / "coordinate_dataset" / "top_view"
    top.mkdir(parents=True)
    pose = ("[[(0, 0), (2, 0), (0, -2), (2, -2), (0, -1), (2, -1), "
            "(0.5, -1.5), (1.5, -2.5)]]")
    (top / "clip1.txt").write_text("\n".join(
        f"Frame {i}: {pose}" for i in range(n_frames)))
    return root


def test_benchpress_merger(tmp_path):
    _write_benchpress_tree(tmp_path / "rec")
    out = tmp_path / "out"
    m = BenchpressFeatureMerger([str(tmp_path / "rec" / "correct")],
                                str(out), "", BP_FEATURE)
    data = json.loads((out / "data.json").read_text())
    assert "subjA_correct" in data
    clip = data["subjA_correct"]["clip1"]
    # all 13 features present, consistent length
    assert set(clip.keys()) == set(BP_FEATURE.keys())
    assert all(len(v) == 6 for v in clip.values())
    # barx/bar_y ratio correct
    np.testing.assert_allclose(clip["feature_2"][0], 100 / 200)
    # wrist-shoulder distances from the fixed pose
    assert clip["feature_5"][0] == pytest.approx(1.5)
    assert clip["feature_6"][0] == pytest.approx(2.5)
    # feature keys sorted numerically
    assert list(clip.keys()) == [f"feature_{i}" for i in range(13)]


def test_benchpress_multi_error_relabel(tmp_path):
    _write_benchpress_tree(tmp_path / "rec")
    me = tmp_path / "me.csv"
    me.write_text("subject,err1,err2\nsubjA,tilting_to_the_right,"
                  "elbows_flaring\n")
    out = tmp_path / "out"
    BenchpressFeatureMerger([str(tmp_path / "rec" / "correct")], str(out),
                            str(me), BP_FEATURE)
    data = json.loads((out / "data.json").read_text())
    assert "subjA_tilting_to_the_right_elbows_flaring" in data


def _write_deadlift_tree(root, n_frames=5):
    s = root / "correct" / "subjB" / "set1"
    (s / "Chessboard").mkdir(parents=True)
    d = s / "Angle" / "3D"
    d.mkdir(parents=True)
    rows = "\n".join(
        ",".join([str(i)] + [f"{10.0 + i + j}" for j in range(7)])
        for i in range(n_frames))
    (d / "clip_1.csv").write_text(rows)
    # a set WITHOUT Chessboard must be skipped
    s2 = root / "correct" / "subjB" / "set2"
    d2 = s2 / "Angle" / "3D"
    d2.mkdir(parents=True)
    (d2 / "clip_1.csv").write_text(rows)
    return root


def test_deadlift_merger(tmp_path):
    _write_deadlift_tree(tmp_path / "rec")
    out = tmp_path / "out"
    m = DeadliftFeatureMerger([str(tmp_path / "rec" / "correct")],
                              str(out), "", DL_FEATURE)
    data = json.loads((out / "data.json").read_text())
    assert list(data.keys()) == ["subjB_set1_correct"]   # set2 skipped
    feats = data["subjB_set1_correct"]["1"]
    assert len(feats["left_knee"]) == 5
    # body_length x100 scaling
    assert feats["body_length"][0] == pytest.approx((10.0 + 0 + 4) * 100)


def test_deadlift_multi_error(tmp_path):
    _write_deadlift_tree(tmp_path / "rec")
    me = tmp_path / "me.json"
    me.write_text(json.dumps({"subjB": [[
        {"error": "correct", "set": "set1", "clips": [1]},
        {"error": "Lower_back_rounding", "set": "set1", "clips": [1]},
    ]]}))
    out = tmp_path / "out"
    DeadliftFeatureMerger([str(tmp_path / "rec" / "correct")], str(out),
                          str(me), DL_FEATURE)
    data = json.loads((out / "data.json").read_text())
    assert "subjB_set1_correct_Lower_back_rounding" in data
