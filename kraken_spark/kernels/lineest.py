"""Centerline estimation + dewarping for curved text lines.

Reimplements the semantics of the reference's CenterNormalizer
(/root/reference/kraken/lib/lineest.py:26-65, dewarp :68-87): estimate a
smoothed vertical center per column from the ink mass, crop a band of
radius r = 1 + range * MAD(center deviations) around the centerline, and
rescale the band to a fixed target height. The reference uses this for
legacy 1-channel recognizers (lib/dataset/utils.py:98-104); the engine
exposes it as a standalone kernel for curved-line inputs.

Pure numpy; the gaussian smooth is the O(n) box cascade from filters.py.
"""

from __future__ import annotations

import numpy as np

from .filters import gaussian_filter


def estimate_centerline(strip: np.ndarray, smooth: float = 8.0) -> np.ndarray:
    """Per-column ink center of mass, gaussian-smoothed along x; columns
    without ink inherit the global center. strip: (h, w) 0/1 or grayscale
    ink-positive. Returns float32 (w,)."""
    h, w = strip.shape
    ink = strip.astype(np.float32)
    colsum = ink.sum(axis=0)
    ys = np.arange(h, dtype=np.float32)[:, None]
    center = np.where(colsum > 0, (ink * ys).sum(axis=0) / np.maximum(colsum, 1e-6), np.nan)
    if np.isnan(center).all():
        center = np.full(w, h / 2.0, dtype=np.float32)
    else:
        global_c = float(np.nanmean(center))
        center = np.where(np.isnan(center), global_c, center)
    return gaussian_filter(center[None, :], smooth)[0]


def dewarp(
    strip: np.ndarray, target_height: int = 48, range_: float = 4.0, smooth: float = 8.0
) -> np.ndarray:
    """Straighten a curved line strip to target_height (lineest.py:68-87).

    Band radius follows the reference: r = 1 + range * MAD of the ink's
    vertical deviation from the centerline; each column's band is shifted
    to the centerline and linearly rescaled to target_height."""
    h, w = strip.shape
    if h == 0 or w == 0:
        return np.zeros((target_height, 0), dtype=strip.dtype)
    center = estimate_centerline(strip, smooth=smooth)
    ys, xs = np.nonzero(strip)
    if len(ys) == 0:
        return np.zeros((target_height, w), dtype=strip.dtype)
    dev = np.abs(ys - center[xs])
    mad = float(np.median(dev))
    r = int(np.ceil(1.0 + range_ * max(mad, 1.0)))
    # gather the band around the centerline per column (edge-clamped rows)
    band_rows = np.arange(-r, r + 1, dtype=np.float32)[:, None] + center[None, :]
    band_idx = np.clip(np.round(band_rows).astype(np.int64), 0, h - 1)
    band = strip[band_idx, np.arange(w)[None, :]]  # (2r+1, w)
    # linear rescale band height -> target_height (nearest row; exact for
    # the bitonal masks this engine feeds it)
    src = np.clip(
        np.round(np.linspace(0, band.shape[0] - 1, target_height)).astype(np.int64),
        0,
        band.shape[0] - 1,
    )
    return band[src]
