"""Reference-native soft detection metrics (kernels/seg_metrics.py —
reference lib/segmentation_metrics.py:34-214): polyline resampling,
tolerance-falloff point scores, the from-scratch optimal-assignment
solver, and the per-page/aggregate metric semantics."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from kraken_spark.kernels.seg_metrics import (aggregate_detection_metrics,
                                              baseline_soft_score,
                                              compute_detection_metrics,
                                              interpolate_polyline,
                                              linear_sum_assignment,
                                              match_baselines_soft)


def test_interpolate_polyline_uniform_spacing():
    out = interpolate_polyline([[0, 0], [100, 0]], spacing=5.0)
    assert out.shape == (20, 2)  # round(100/5) = 20 samples incl. ends
    assert np.allclose(out[0], [0, 0]) and np.allclose(out[-1], [100, 0])
    gaps = np.linalg.norm(np.diff(out, axis=0), axis=1)
    assert np.allclose(gaps, gaps[0])
    # multi-segment arc-length parameterization: corner preserved in
    # spacing terms, not vertex terms
    bent = interpolate_polyline([[0, 0], [10, 0], [10, 10]], spacing=5.0)
    assert bent.shape[0] == 4  # round(20/5)
    assert np.allclose(bent[-1], [10, 10])
    # degenerate inputs
    assert interpolate_polyline([[3, 4]]).shape == (1, 2)
    assert interpolate_polyline([[3, 4], [3, 4]]).shape == (1, 2)
    # short lines keep a 2-point floor
    assert interpolate_polyline([[0, 0], [1, 0]], spacing=5.0).shape[0] == 2


def test_point_score_falloff():
    a = interpolate_polyline([[0, 0], [100, 0]])
    tol = 8.0
    for dy, want in ((0.0, 1.0), (8.0, 1.0), (16.0, 0.5), (24.0, 0.0),
                     (50.0, 0.0)):
        b = interpolate_polyline([[0, dy], [100, dy]])
        assert abs(baseline_soft_score(a, b, tol) - want) < 1e-9, dy
    # 1.5*tol -> (3*tol - 1.5*tol) / (2*tol) = 0.75
    b = interpolate_polyline([[0, 12.0], [100, 12.0]])
    assert abs(baseline_soft_score(a, b, tol) - 0.75) < 1e-9


def test_linear_sum_assignment_brute_force_parity():
    rng = np.random.Generator(np.random.PCG64(42))
    for _ in range(120):
        n = int(rng.integers(1, 7))
        m = int(rng.integers(1, 7))
        c = rng.uniform(0, 10, (n, m))
        r, cc = linear_sum_assignment(c)
        if n <= m:
            best = min(sum(c[i, p[i]] for i in range(n))
                       for p in itertools.permutations(range(m), n))
            assert len(r) == n and list(r) == sorted(r)
        else:
            best = min(sum(c[p[j], j] for j in range(m))
                       for p in itertools.permutations(range(n), m))
            assert len(r) == m
        assert abs(float(c[r, cc].sum()) - best) < 1e-9
        assert len(set(cc.tolist())) == len(cc)


def test_match_baselines_soft_prefers_nearer():
    tol = 8.0
    preds = [interpolate_polyline([[0, 0], [100, 0]]),
             interpolate_polyline([[0, 40], [100, 40]])]
    gts = [interpolate_polyline([[0, 41], [100, 41]]),
           interpolate_polyline([[0, 1], [100, 1]])]
    score, matches, ms = match_baselines_soft(preds, gts, tol)
    assert score.shape == (2, 2)
    assert sorted(matches) == [(0, 1), (1, 0)]  # crossed pairing is optimal
    assert np.allclose(ms, 1.0)


def test_compute_detection_metrics_cases():
    line = [[0, 0], [100, 0]]
    far = [[0, 200], [100, 200]]
    assert compute_detection_metrics([], [], 8.0)["f1"] == 1.0
    assert compute_detection_metrics([line], [], 8.0)["f1"] == 0.0
    assert compute_detection_metrics([], [line], 8.0)["f1"] == 0.0
    perfect = compute_detection_metrics([line], [line], 8.0)
    assert perfect == {"precision": 1.0, "recall": 1.0, "f1": 1.0,
                       "num_pred": 1, "num_gt": 1}
    # one true hit + one spurious detection: precision 0.5, recall 1
    m = compute_detection_metrics([line, far], [line], 8.0)
    assert abs(m["precision"] - 0.5) < 1e-9 and abs(m["recall"] - 1.0) < 1e-9
    assert abs(m["f1"] - 2 / 3) < 1e-9
    # partial-credit band: a line offset by 2*tol scores 0.5 on both sides
    off = [[0, 16.0], [100, 16.0]]
    soft = compute_detection_metrics([off], [line], 8.0)
    assert abs(soft["precision"] - 0.5) < 1e-9


def test_aggregate_detection_metrics_macro():
    pages = [{"precision": 1.0, "recall": 0.5, "f1": 2 / 3},
             {"precision": 0.0, "recall": 0.0, "f1": 0.0}]
    agg = aggregate_detection_metrics(pages)
    assert agg == {"precision": 0.5, "recall": 0.25, "f1": 1 / 3}
    assert aggregate_detection_metrics([]) == {"precision": 0.0,
                                               "recall": 0.0, "f1": 0.0}


def test_assignment_properties_random():
    """Property sweep: the solver's assignment is a valid partial
    permutation, its cost never exceeds any random valid assignment, and
    transposition is consistent."""
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(60):
        n = int(rng.integers(1, 12))
        m = int(rng.integers(1, 12))
        c = rng.uniform(0, 100, (n, m))
        r, cc = linear_sum_assignment(c)
        k = min(n, m)
        assert len(r) == len(cc) == k
        assert len(set(r.tolist())) == k and len(set(cc.tolist())) == k
        got = float(c[r, cc].sum())
        # never beaten by random valid assignments
        for _ in range(20):
            rows = rng.permutation(n)[:k]
            cols = rng.permutation(m)[:k]
            assert got <= float(c[rows, cols].sum()) + 1e-9
        rt, ct = linear_sum_assignment(c.T)
        assert abs(float(c.T[rt, ct].sum()) - got) < 1e-9


def test_detection_metric_bounds_random():
    """Soft P/R/F1 stay in [0,1] and are symmetric under swapping pred/gt
    (precision <-> recall) on random polyline sets."""
    rng = np.random.Generator(np.random.PCG64(11))
    for _ in range(20):
        def rand_lines(k):
            out = []
            for _ in range(k):
                y = float(rng.uniform(0, 200))
                x0 = float(rng.uniform(0, 100))
                out.append([[x0, y], [x0 + float(rng.uniform(10, 200)), y]])
            return out
        a = rand_lines(int(rng.integers(0, 5)))
        b = rand_lines(int(rng.integers(0, 5)))
        mab = compute_detection_metrics(a, b, 8.0)
        mba = compute_detection_metrics(b, a, 8.0)
        for m in (mab, mba):
            for k in ("precision", "recall", "f1"):
                assert 0.0 <= m[k] <= 1.0
        assert abs(mab["precision"] - mba["recall"]) < 1e-9
        assert abs(mab["recall"] - mba["precision"]) < 1e-9
