"""nlbin-style adaptive binarization in pure numpy.

Reimplements the semantics of the reference's non-linear binarizer
(/root/reference/kraken/binarization.py:44-127): normalize -> local
background estimation -> flatten -> text-region percentile rescale ->
threshold. Differences (deliberate, for 100 TB-scale linearity; the container
also has no scipy):

  * background estimation uses a grid-percentile + bilinear upsample
    (filters.grid_percentile_background) instead of zoom + sliding
    percentile_filter — same estimator class, O(n) vs O(n*w^2);
  * gaussian blurs are 3-pass box cascades (O(n), <3% kernel error).

Bitonal inputs skip the whole pipeline, like the reference
(/root/reference/kraken/binarization.py:75-77, lib/util.py:57-71).
"""

from __future__ import annotations

import numpy as np

from .filters import (
    binary_dilation_sep,
    gaussian_filter,
    grid_percentile,
    percentile_nearest,
    threshold_against_background,
    upsample_bilinear,
)


def is_bitonal(img: np.ndarray) -> bool:
    """True if the image contains at most two distinct values
    (cf. /root/reference/kraken/lib/util.py:57-71)."""
    v = np.unique(img[::16, ::16])
    if len(v) > 2:
        return False
    return len(np.unique(img)) <= 2


def nlbin(
    img: np.ndarray,
    threshold: float = 0.5,
    tile: int = 32,
    perc: float = 80.0,
    escale: float = 1.0,
    low: float = 5.0,
    high: float = 90.0,
) -> np.ndarray:
    """Binarize a HxW uint8 grayscale page. Returns uint8 ink mask (1=ink).

    Parameter names mirror the reference CLI surface
    (/root/reference/kraken/kraken.py:436-465).
    """
    if img.ndim != 2:
        raise ValueError("nlbin expects grayscale HxW")
    if img.size == 0:
        raise ValueError("empty image")
    if is_bitonal(img):
        return (img < 128).astype(np.uint8)
    if int(img.max()) == int(img.min()):
        raise ValueError("flat image cannot be binarized")

    # local background estimate as a coarse tile grid (0..255 units); the
    # full-resolution map is never materialized (threshold kernel below)
    grid = grid_percentile(img, tile=tile, perc=perc)

    # estimate lo/hi contrast bounds from high-variance (text) regions on a
    # 4x-decimated flattened copy (16x less work — the reference does the
    # analogous thing by zooming before its percentile filters,
    # binarization.py:78-82). flat = clip(img/255 - bg/255 + 1, 0, 1) is only
    # ever materialized at the decimated size.
    dec = 4
    h, w = img.shape
    bg_dec = upsample_bilinear(grid, -(-h // dec), -(-w // dec), tile, stride=dec)
    sub = np.clip(
        img[::dec, ::dec].astype(np.float32) / 255.0 - bg_dec / 255.0 + 1.0,
        0.0,
        1.0,
    )
    if escale > 0:
        sigma = escale * 10.0 / dec
        v = sub - gaussian_filter(sub, sigma)
        v = np.sqrt(np.maximum(gaussian_filter(v * v, sigma), 0.0))
        vmax = float(v.max())
        mask = v > 0.3 * vmax if vmax > 0 else np.ones_like(v, dtype=bool)
        k = max(1, int(escale * 50) // dec)
        mask = binary_dilation_sep(mask, k, 1)
        mask = binary_dilation_sep(mask, 1, k)
        est = sub[mask]
        if est.size == 0:
            est = sub.ravel()
    else:
        est = sub.ravel()
    lo = float(percentile_nearest(est, low))
    hi = float(percentile_nearest(est, high))
    if hi <= lo:
        hi = lo + 1e-6
    # fused flatten+rescale+threshold: clip((flat - lo)/(hi - lo)) < t
    # <=> img/255 - bg/255 + 1 < lo + t*(hi - lo)   (clips cannot flip the
    # inequality since 0 < t < 1 bounds both clip ranges)
    # <=> img < bg + 255*(lo + t*(hi - lo) - 1)  — one chunked full-res pass
    c = 255.0 * (lo + threshold * (hi - lo) - 1.0)
    return threshold_against_background(img, grid, tile, c)


def otsu_threshold(values: np.ndarray) -> float:
    """Classic Otsu threshold over a 1-D sample (maximize between-class
    variance on the 256-bin histogram) — used by the robust extraction
    path to separate true ink from faint bleed-through among the pixels
    nlbin marked as foreground (nlbin normalizes LOCALLY, so isolated
    faint structures can win their neighborhood; a global intensity gate
    removes them)."""
    hist = np.bincount(np.clip(values.astype(np.int64), 0, 255), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 255.0
    w = np.cumsum(hist)
    m = np.cumsum(hist * np.arange(256))
    mt = m[-1]
    w0 = w
    w1 = total - w
    valid = (w0 > 0) & (w1 > 0)
    mu0 = np.where(valid, m / np.maximum(w0, 1), 0)
    mu1 = np.where(valid, (mt - m) / np.maximum(w1, 1), 0)
    between = np.where(valid, w0 * w1 * (mu0 - mu1) ** 2, -1)
    return float(np.argmax(between))
