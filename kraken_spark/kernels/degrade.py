"""Deterministic scan-degradation model over the synthetic corpus.

The clean renderer (kernels/render.py) proves byte-identical extraction;
real historical material — the reference's actual domain (its fixtures are
degraded scans, e.g. tests/resources/bw.png) — adds noise the clean pages
never exercise. This module applies four classic degradations, all seeded
(PCG64), so robustness behavior can be PINNED across seeds
(tests/test_degraded.py) instead of eyeballed:

- slight skew: a vertical shear (each column shifted by round(s*x),
  |s| <= ~0.7 deg) — the small rotations sheet-fed scanners introduce;
  applied identically to the golden ink/baselines so seg-F1 stays
  measurable against exact geometry.
- low contrast: dynamic-range compression toward mid-gray (faded ink /
  yellowed paper), stressing nlbin's adaptive normalization.
- bleed-through: a faint MIRRORED copy of the page's own ink added to the
  background (recto-verso show-through in double-sided scans), the classic
  false-ink source.
- salt & pepper: isolated sensor/dust pixels at full black/white.

Severity grades: 'light' and 'heavy' (both deterministic)."""

from __future__ import annotations

import numpy as np

from . import render

GRADES = ("light", "heavy")


def _shear_columns(arr: np.ndarray, dy_per_col: np.ndarray, fill) -> np.ndarray:
    """Shift every column x down by dy_per_col[x] (vectorized per distinct
    shift value; the slope is small so there are only a handful)."""
    h, w = arr.shape[:2]
    out = np.full_like(arr, fill)
    for dy in np.unique(dy_per_col):
        cols = dy_per_col == dy
        if dy == 0:
            out[:, cols] = arr[:, cols]
        elif dy > 0:
            out[dy:, cols] = arr[: h - dy, cols]
        else:
            out[:dy, cols] = arr[-dy:, cols]
    return out


def degrade(
    img: np.ndarray, ink: np.ndarray, rng: np.random.Generator, grade: str = "light"
) -> tuple[np.ndarray, np.ndarray, float]:
    """Degrade a rendered page; returns (degraded_img, sheared_ink, slope).

    The ink mask is sheared with the image (geometry ground truth stays
    exact); the photometric degradations touch only the image."""
    heavy = grade == "heavy"
    h, w = img.shape
    # 1. skew (vertical shear)
    slope = float(rng.uniform(0.004, 0.012) * (1 if rng.random() < 0.5 else -1))
    if heavy:
        slope *= 1.6
    dy = np.round(slope * np.arange(w)).astype(np.int64)
    page = _shear_columns(img.astype(np.float32), dy, 225.0)
    ink_sh = _shear_columns(ink.astype(np.uint8), dy, 0)
    # 2. bleed-through: faint horizontally-mirrored ink
    bleed = ink_sh[:, ::-1].astype(bool)
    strength = rng.uniform(28.0, 40.0) * (1.6 if heavy else 1.0)
    page = np.where(bleed & (ink_sh == 0), page - strength, page)
    # 3. low contrast
    alpha = rng.uniform(0.55, 0.7) - (0.15 if heavy else 0.0)
    page = 128.0 + (page - 128.0) * alpha
    # 4. salt & pepper
    frac = 0.001 * (3.0 if heavy else 1.0)
    n = int(h * w * frac)
    sy = rng.integers(0, h, n)
    sx = rng.integers(0, w, n)
    page[sy, sx] = np.where(rng.random(n) < 0.5, 0.0, 255.0)
    return np.clip(page, 0, 255).astype(np.uint8), ink_sh, slope


def degraded_document(seed: int, doc_idx: int, grade: str = "light") -> dict:
    """render_document + deterministic degradation; the golden lines'
    baselines/bboxes are sheared to match (2-point straight baselines stay
    exact under the linear shear)."""
    d = render.render_document(seed, doc_idx)
    rng = render.doc_rng(seed ^ 0xDE6, doc_idx)
    img, ink_sh, slope = degrade(d["img"], d["ink"], rng, grade)
    lines = []
    for l in d["lines"]:
        nl = dict(l)
        nl["baseline"] = [
            [x, y + int(round(slope * x))] for x, y in l["baseline"]
        ]
        x0, y0, x1, y1 = l["bbox"]
        dy0 = int(round(slope * x0))
        dy1 = int(round(slope * (x1 - 1)))
        nl["bbox"] = [x0, y0 + min(dy0, dy1), x1, y1 + max(dy0, dy1)]
        lines.append(nl)
    out = dict(d)
    out["img"] = img
    out["ink"] = ink_sh
    out["lines"] = lines
    out["slope"] = slope
    out["grade"] = grade
    return out
