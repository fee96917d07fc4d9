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


# ---------------------------------------------------------------------------
# Reference-native soft detection metrics
# (/root/reference/kraken/lib/segmentation_metrics.py:34-214): polylines
# resampled to ~uniform spacing, per-point scores with tolerance falloff
# (1 inside tol, linear to 0 at 3*tol), symmetric pairwise scores, OPTIMAL
# one-to-one assignment, soft precision = sum(match scores)/n_pred. The
# reference solves the assignment with scipy's linear_sum_assignment;
# `linear_sum_assignment` below is a from-scratch Jonker-Volgenant
# shortest-augmenting-path solver (no scipy in this engine) — optimal
# assignments may be non-unique, but every optimum has the same score sum,
# so the reported metrics are identical.
# ---------------------------------------------------------------------------
def interpolate_polyline(points, spacing: float = 5.0) -> np.ndarray:
    """Resample a polyline to approximately uniform point spacing
    (segmentation_metrics.py:34-72 semantics, incl. the half-to-even
    rounding of the point count and searchsorted segment lookup)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if pts.shape[0] < 2:
        return pts
    seg = np.linalg.norm(pts[1:] - pts[:-1], axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total < 1e-6:
        return pts[:1]
    num = max(2, int(round(total / spacing)))
    target = np.linspace(0.0, total, num)
    idx = np.clip(np.searchsorted(cum, target), 1, len(cum) - 1)
    s0, s1 = cum[idx - 1], cum[idx]
    ln = s1 - s0
    t = np.where(ln > 1e-8, (target - s0) / np.where(ln > 1e-8, ln, 1.0), 0.0)
    return pts[idx - 1] + t[:, None] * (pts[idx] - pts[idx - 1])


def _point_scores(min_dists: np.ndarray, tol: float) -> np.ndarray:
    """1 inside tol, linear falloff to 0 at 3*tol
    (segmentation_metrics.py:75-95)."""
    return np.where(
        min_dists <= tol, 1.0,
        np.where(min_dists < 3 * tol, (3 * tol - min_dists) / (2 * tol), 0.0))


def baseline_soft_score(pred_points: np.ndarray, gt_points: np.ndarray,
                        tol: float) -> float:
    """Directed mean point score pred -> gt
    (segmentation_metrics.py:97-116)."""
    d = np.linalg.norm(pred_points[:, None, :] - gt_points[None, :, :],
                       axis=-1)
    return float(_point_scores(d.min(axis=1), tol).mean())


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment over a rectangular cost matrix — the
    scipy.optimize.linear_sum_assignment contract (every row matched when
    rows <= cols, row indices returned sorted). Jonker-Volgenant shortest
    augmenting paths with dual potentials (the classic O(n m^2) primal-
    dual Hungarian formulation); brute-force-pinned in tests."""
    cost = np.asarray(cost, dtype=np.float64)
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape
    if n == 0:
        e = np.zeros(0, dtype=np.int64)
        return e, e
    u = np.zeros(n)
    v = np.zeros(m + 1)
    way = np.zeros(m, dtype=np.int64)
    p = np.full(m + 1, -1, dtype=np.int64)  # p[j] = row assigned to col j
    for i in range(n):
        p[m] = i  # virtual column temporarily holds the new row
        j0 = m
        minv = np.full(m, np.inf)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            cur = cost[i0] - u[i0] - v[:m]
            upd = ~used[:m] & (cur < minv)
            minv[upd] = cur[upd]
            way[upd] = j0
            free = np.nonzero(~used[:m])[0]
            j1 = free[np.argmin(minv[free])]
            delta = minv[j1]
            # dual update: tight edges stay tight, frontier shrinks by delta
            um = used[:m]
            u[p[:m][um]] += delta
            u[i] += delta  # the virtual column always holds row i
            v[:m][um] -= delta
            v[m] -= delta
            minv[~um] -= delta
            j0 = j1
            if p[j0] == -1:
                break
        while j0 != m:  # augment along the alternating path
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows = p[:m]
    cols = np.arange(m, dtype=np.int64)
    keep = rows >= 0
    rows, cols = rows[keep], cols[keep]
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    return (cols, rows) if transposed else (rows, cols)


def match_baselines_soft(pred_polylines, gt_polylines, tol: float):
    """Symmetric score matrix + optimal assignment
    (segmentation_metrics.py:119-151). Inputs are resampled point arrays
    (interpolate_polyline). Returns (score_matrix, matches,
    match_scores)."""
    n_pred, n_gt = len(pred_polylines), len(gt_polylines)
    score = np.zeros((n_pred, n_gt))
    for i, pred in enumerate(pred_polylines):
        for j, gt in enumerate(gt_polylines):
            score[i, j] = (baseline_soft_score(pred, gt, tol)
                           + baseline_soft_score(gt, pred, tol)) / 2.0
    rows, cols = linear_sum_assignment(1.0 - score)
    return score, list(zip(rows.tolist(), cols.tolist())), score[rows, cols]


def compute_detection_metrics(pred_polylines, gt_polylines,
                              tol: float) -> dict:
    """Per-page soft precision/recall/F1 (segmentation_metrics.py:154-192):
    precision = sum(match scores)/n_pred, recall = /n_gt. Polylines are
    vertex lists; resampling happens here."""
    n_pred, n_gt = len(pred_polylines), len(gt_polylines)
    if n_pred == 0 and n_gt == 0:
        return {"precision": 1.0, "recall": 1.0, "f1": 1.0,
                "num_pred": 0, "num_gt": 0}
    if n_pred == 0 or n_gt == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0,
                "num_pred": n_pred, "num_gt": n_gt}
    pred_pts = [interpolate_polyline(p) for p in pred_polylines]
    gt_pts = [interpolate_polyline(g) for g in gt_polylines]
    _, _, match_scores = match_baselines_soft(pred_pts, gt_pts, tol)
    s = float(match_scores.sum())
    precision, recall = s / n_pred, s / n_gt
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "num_pred": n_pred, "num_gt": n_gt}


def aggregate_detection_metrics(page_metrics: list[dict]) -> dict:
    """Macro-average across pages (segmentation_metrics.py:195-214)."""
    if not page_metrics:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    n = len(page_metrics)
    return {k: sum(m[k] for m in page_metrics) / n
            for k in ("precision", "recall", "f1")}
