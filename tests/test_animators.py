"""Skeleton animator tests: kinematics precompute + GIF rendering."""

import os

import numpy as np
import pytest

from t2ms_tpu.visualize.benchpress import (RearViewBenchpressAnimator,
                                           TopViewBenchpressAnimator)


def _config(n=3):
    t = np.linspace(0, 1, n)
    return {
        "left_shoulder": 30 + 10 * t, "right_shoulder": 30 + 10 * t,
        "left_elbow": 90 + 20 * t, "right_elbow": 90 + 20 * t,
        "left_shoulder_y": 320 + 50 * t, "right_shoulder_y": 320 + 50 * t,
        "left_torso-arm": 45 + 5 * t, "right_torso-arm": 45 + 5 * t,
        "left_dist": 200 + 20 * t, "right_dist": 200 + 20 * t,
    }


def test_rear_view_kinematics_and_gif(tmp_path):
    anim = RearViewBenchpressAnimator(_config())
    # forearm length preserved: |wrist - elbow| == L_fore
    d = np.linalg.norm(anim.l_wr - anim.l_el, axis=1)
    np.testing.assert_allclose(d, anim.L_fore, rtol=1e-6)
    # upper arm foreshortened by |sin(torso-arm)|
    want = anim.L_upper * np.abs(np.sin(np.deg2rad(anim.th_l)))
    got = np.linalg.norm(anim.l_el - anim.l_sh, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    out = anim.animate(str(tmp_path / "rear.gif"))
    assert os.path.getsize(out) > 1000


def test_top_view_pose_and_gif(tmp_path):
    anim = TopViewBenchpressAnimator(_config())
    pts = anim.pts        # (n, 8, 2)
    assert pts.shape == (3, 8, 2)
    # shoulders fixed at width 1 around center x=0
    np.testing.assert_allclose(pts[:, 0, 0], -0.5)
    np.testing.assert_allclose(pts[:, 1, 0], 0.5)
    # wrists drop below their shoulders by the normalized distances
    np.testing.assert_allclose(pts[:, 6, 1], pts[:, 0, 1] - anim.d_r)
    np.testing.assert_allclose(pts[:, 7, 1], pts[:, 1, 1] - anim.d_l)
    out = anim.animate(str(tmp_path / "top.gif"))
    assert os.path.getsize(out) > 1000


def test_missing_feature_raises():
    cfg = _config()
    del cfg["left_elbow"]
    with pytest.raises(KeyError):
        RearViewBenchpressAnimator(cfg)
