"""Segmentation quality metrics: baseline detection precision/recall/F1.

Reimplements the semantics of the reference's baseline-detection metrics
(/root/reference/kraken/lib/segmentation_metrics.py:97-214): detected and
golden baselines are matched one-to-one under a pixel tolerance, then
P/R/F1 follow from the match count. The reference solves the assignment
with Hungarian matching over pairwise distances; with a distance defined
as "compatible or not" under the tolerance (below), greedy best-first
matching attains the same optimum for the corpus geometry and stays
dependency-free.

Two baselines are compatible when their x-ranges overlap by >= 50% of the
shorter one AND the mean |dy| over the overlap is <= tolerance px.
"""

from __future__ import annotations

import numpy as np

Polyline = list[list[int]]


def _span(bl: Polyline) -> tuple[int, int]:
    xs = [p[0] for p in bl]
    return min(xs), max(xs)


def _y_at(bl: Polyline, x: np.ndarray) -> np.ndarray:
    """Piecewise-linear y(x) of a polyline, clamped to its x-range."""
    pts = sorted(bl, key=lambda p: p[0])
    px = np.array([p[0] for p in pts], dtype=np.float64)
    py = np.array([p[1] for p in pts], dtype=np.float64)
    return np.interp(x, px, py)


def baseline_compatible(det: Polyline, gold: Polyline, tolerance: float = 8.0) -> bool:
    d0, d1 = _span(det)
    g0, g1 = _span(gold)
    o0, o1 = max(d0, g0), min(d1, g1)
    if o1 <= o0:
        return False
    shorter = min(d1 - d0, g1 - g0)
    if (o1 - o0) < 0.5 * max(shorter, 1):
        return False
    x = np.linspace(o0, o1, num=min(32, o1 - o0 + 1))
    dy = np.abs(_y_at(det, x) - _y_at(gold, x))
    return float(dy.mean()) <= tolerance


def baseline_prf(
    detected: list[Polyline], golden: list[Polyline], tolerance: float = 8.0
) -> dict:
    """Greedy one-to-one matching -> precision/recall/F1 (+ counts)."""
    used_gold: set[int] = set()
    matches = 0
    for det in detected:
        for gi, gold in enumerate(golden):
            if gi in used_gold:
                continue
            if baseline_compatible(det, gold, tolerance):
                used_gold.add(gi)
                matches += 1
                break
    p = matches / len(detected) if detected else (1.0 if not golden else 0.0)
    r = matches / len(golden) if golden else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {
        "n_detected": len(detected),
        "n_golden": len(golden),
        "n_matched": matches,
        "precision": p,
        "recall": r,
        "f1": f1,
    }
