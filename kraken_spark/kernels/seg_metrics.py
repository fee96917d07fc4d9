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


def rasterize_baselines(baselines: list[Polyline], h: int, w: int,
                        band: int = 2) -> np.ndarray:
    """GT baseline target map: a ±band-row band along every polyline
    segment — the seg_train.gt_maps convention generalized to arbitrary
    polylines (the reference's segmentation dataset rasterizes XML
    baselines into per-class target maps the same way, kraken
    lib/dataset/segmentation.py)."""
    bl = np.zeros((h, w), dtype=bool)
    for pts in baselines:
        if len(pts) == 1:
            x, y = pts[0]
            if 0 <= x < w:
                bl[max(y - band, 0): y + band + 1, x] = True
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            n = max(abs(x1 - x0), abs(y1 - y0), 1)
            xs = np.clip(np.linspace(x0, x1, n + 1).round().astype(int), 0, w - 1)
            ys = np.linspace(y0, y1, n + 1).round().astype(int)
            for x, y in zip(xs, ys):
                bl[max(y - band, 0): y + band + 1, x] = True
    return bl


def rasterize_regions(regions: list[Polyline], h: int, w: int,
                      pad: int = 2) -> np.ndarray:
    """GT region target map: padded bbox fill per region boundary (the
    gt_maps convention; region classes are coarse by design)."""
    rg = np.zeros((h, w), dtype=bool)
    for bnd in regions:
        if not bnd:
            continue
        xs = [p[0] for p in bnd]
        ys = [p[1] for p in bnd]
        rg[max(min(ys) - pad, 0): max(ys) + pad + 1,
           max(min(xs) - pad, 0): max(xs) + pad + 1] = True
    return rg


def pixel_class_counts(pred: np.ndarray, gt: np.ndarray) -> dict:
    """tp/fp/fn/tn pixel counts for one class (bool maps, same shape) —
    the additive form of the reference segtest's per-class pixel
    accuracy / IoU (ketos/segmentation.py:525-529), summable across
    pages/tasks before the ratio is taken."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    tp = int(np.count_nonzero(pred & gt))
    fp = int(np.count_nonzero(pred & ~gt))
    fn = int(np.count_nonzero(~pred & gt))
    return {"tp": tp, "fp": fp, "fn": fn,
            "tn": int(pred.size - tp - fp - fn)}


def pixel_metrics_of(counts: dict) -> dict:
    """(summed) counts -> {accuracy, iou}."""
    tot = counts["tp"] + counts["fp"] + counts["fn"] + counts["tn"]
    union = counts["tp"] + counts["fp"] + counts["fn"]
    return {
        "accuracy": (counts["tp"] + counts["tn"]) / tot if tot else 1.0,
        "iou": counts["tp"] / union if union else 1.0,
    }
