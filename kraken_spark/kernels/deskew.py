"""Projection-profile deskew (pure numpy).

Classic document skew estimation (Baird-style): for candidate slopes s,
un-shear the ink coordinates (row - s*col), build the horizontal
projection histogram, and keep the slope maximizing the sum of squared
row counts — text lines align into sharp peaks exactly at the true slope.
Coarse-to-fine over a subsample, refined on all ink pixels, so the whole
estimate costs a few ms per page.

The reference itself assumes deskewed input (its legacy segmenter's
clean-page contract, /root/reference/kraken/pageseg.py; binarization
/root/reference/kraken/binarization.py normalizes illumination but not
skew) — this stage extends the engine for the degraded-scan corpus
(kernels/degrade.py) where slight scanner skew is part of the model.
"""

from __future__ import annotations

import numpy as np


def _profile_score(ys: np.ndarray, xs: np.ndarray, s: float, h: int) -> float:
    yy = np.round(ys - s * xs).astype(np.int64)
    hist = np.bincount(yy - yy.min())
    v = hist.astype(np.float64)
    return float((v * v).sum())


def estimate_skew(
    mask: np.ndarray, max_slope: float = 0.025, fine_step: float = 1e-4
) -> float:
    """Estimate the vertical-shear slope (px down per px right) of a
    binarized page. Returns 0.0 for empty pages."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return 0.0
    sub = slice(None, None, max(len(ys) // 20000, 1))
    ys_s, xs_s = ys[sub], xs[sub]
    h = mask.shape[0]
    coarse = np.arange(-max_slope, max_slope + 1e-9, 2e-3)
    s0 = max(coarse, key=lambda s: _profile_score(ys_s, xs_s, s, h))
    fine = np.arange(s0 - 2.2e-3, s0 + 2.2e-3, fine_step)
    s1 = max(fine, key=lambda s: _profile_score(ys_s, xs_s, s, h))
    # final refinement on ALL ink pixels in a tight window: the un-shear is
    # applied with integer rounding, so landing in the true slope's
    # rounding-equivalence class is what matters
    final = np.arange(s1 - 3 * fine_step, s1 + 3.5 * fine_step, fine_step / 2)
    return float(max(final, key=lambda s: _profile_score(ys, xs, s, h)))


def unshear(mask: np.ndarray, slope: float, fill=0) -> np.ndarray:
    """Invert a vertical shear: shift column x up by round(slope * x)."""
    from .degrade import _shear_columns

    w = mask.shape[1]
    dy = -np.round(slope * np.arange(w)).astype(np.int64)
    return _shear_columns(mask, dy, fill)


def robust_preprocess(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Degraded-scan cleanup chain used by the blla_robust extraction path
    (and x_seg_quality's degraded rows): bleed-through intensity gate
    (Otsu over nlbin's foreground — nlbin normalizes locally, so faint
    mirrored show-through wins in text-free neighborhoods; a clearly
    bimodal foreground keeps only its dark mode) -> despeckle (8-connected
    <= 3 px; glyph strokes are >= 4 px) -> projection-profile deskew."""
    from .binarize import otsu_threshold
    from .morph import despeckle

    fg = img[mask.astype(bool)]
    if fg.size:
        t = otsu_threshold(fg)
        dark = fg[fg <= t]
        lite = fg[fg > t]
        if (
            dark.size
            and lite.size
            and lite.mean() - dark.mean() > 25
            and lite.size < 0.6 * fg.size
        ):
            mask = (mask.astype(bool) & (img <= t)).astype(mask.dtype)
    mask = despeckle(mask, max_px=3)
    slope = estimate_skew(mask)
    if abs(slope) >= 5e-4:
        mask = unshear(mask, slope, fill=0)
    # salt specks MERGED into a glyph survive the 8-connected despeckle
    # (they share its component); most touch only diagonally, so a
    # 4-connected pass detaches and removes them — measured max CER on
    # the degraded sweep drops 0.092 -> 0.010 (heavy) with light's
    # byte-exact page count up and clean pages still untouched
    return despeckle(mask, max_px=3, connectivity=1)
