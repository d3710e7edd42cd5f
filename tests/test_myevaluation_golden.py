"""Golden tests for the motion-track multi-run metrics.

Oracle = a direct loop transcription of the reference formulas
(myevaluation.py:42-107 — MRR with the ravel-cosine from
Dataset_Construction_Pipeline/Evaluate_Datasets.py:6-15, Gaussian CRPS)
evaluated on a proper (N, T, D, G) stack, compared against our vectorized
implementations; plus an end-to-end check that cli.myevaluation feeds the
run axis through as the generation axis (values must move when runs
genuinely differ — the round-1 np.repeat bug made them blind to it).
"""

import numpy as np
from scipy.stats import norm

from t2ms_tpu.evaluate import calculate_crps, calculate_mrr


RNG = np.random.default_rng(42)
ORI = RNG.standard_normal((5, 24, 4))
GEN = np.stack([ORI + s * RNG.standard_normal(ORI.shape)
                for s in (0.05, 0.4, 1.5)], axis=-1)


def _oracle_mrr(ori_data, gen_data, threshold=0.5):
    """Reference myevaluation.py:42-67 / evaluation.py:21-45."""
    def ravel_cos(a, b):
        a, b = np.array(a).ravel(), np.array(b).ravel()
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
        return np.nan_to_num(s)

    N, G = ori_data.shape[0], gen_data.shape[3]
    scores = np.zeros(N)
    for i in range(N):
        sims = [np.mean(ravel_cos(ori_data[i], gen_data[i, :, :, g]))
                for g in range(G)]
        rank = None
        for idx in np.argsort(sims)[::-1]:
            if sims[idx] > threshold:
                rank = idx + 1
                break
        scores[i] = 1.0 / rank if rank is not None else 0.0
    return scores.mean()


def _oracle_crps(ori_data, gen_data):
    """Reference myevaluation.py:74-107 / evaluation.py:51-84."""
    N, T, D = ori_data.shape
    G = gen_data.shape[3]
    vals = []
    for i in range(N):
        total = 0.0
        for j in range(D):
            per_gen = []
            for g in range(G):
                mean = gen_data[i, :, j, g].mean()
                std = gen_data[i, :, j, g].std()
                if std == 0:
                    std += 1e-8
                obs = ori_data[i, :, j]
                cdf_obs = np.where(obs < mean, 0, 1)
                cdf_pred = norm.cdf(obs, loc=mean, scale=std)
                per_gen.append(np.mean((cdf_obs - cdf_pred) ** 2))
            total += np.mean(per_gen)
        vals.append(total / D)
    return np.mean(vals)


def test_mrr_matches_reference_formula():
    np.testing.assert_allclose(calculate_mrr(ORI, GEN),
                               _oracle_mrr(ORI, GEN), rtol=1e-12)
    # shifted positive data so cosines are informative (above threshold)
    ori = np.abs(ORI) + 1.0
    gen = np.stack([ori + s * RNG.standard_normal(ori.shape)
                    for s in (1.2, 0.01, 0.6)], axis=-1)
    ours, oracle = calculate_mrr(ori, gen), _oracle_mrr(ori, gen)
    np.testing.assert_allclose(ours, oracle, rtol=1e-12)
    assert 0.0 < ours <= 1.0


def test_crps_matches_reference_formula():
    np.testing.assert_allclose(calculate_crps(ORI, GEN),
                               _oracle_crps(ORI, GEN), rtol=1e-10)


def test_myevaluation_run_axis_drives_multi_run_metrics():
    """evaluate_data must route the run stack into MRR/CRPS as the
    generation axis: metric values change when run variation changes."""
    import argparse

    from t2ms_tpu.cli.myevaluation import evaluate_data

    args = argparse.Namespace(method_list="MSE,MRR,CRPS,ED", device="cpu")
    G, D, T = 4, 3, 24
    base = np.abs(RNG.standard_normal((D, T))) + 1.0
    ori = np.repeat(base[None], G, axis=0)               # (G, D, T)
    tight = np.stack([base + 0.01 * RNG.standard_normal((D, T))
                      for _ in range(G)])
    wide = np.stack([base + (0.01 + 1.5 * g) * RNG.standard_normal((D, T))
                     for g in range(G)])
    r_tight = evaluate_data(args, ori, tight, 0, {})[0]
    r_wide = evaluate_data(args, ori, wide, 0, {})[0]
    assert r_tight["CRPS"] != r_wide["CRPS"]
    assert r_tight["CRPS"] < r_wide["CRPS"]
    # golden cross-check against the oracles on the same stacks
    obs = np.transpose(ori, (0, 2, 1))[:1]
    for gen, res in ((tight, r_tight), (wide, r_wide)):
        stack = np.transpose(np.transpose(gen, (0, 2, 1)), (1, 2, 0))[None]
        np.testing.assert_allclose(res["MRR"], _oracle_mrr(obs, stack),
                                   rtol=1e-12)
        np.testing.assert_allclose(res["CRPS"], _oracle_crps(obs, stack),
                                   rtol=1e-10)
