"""Line-image extraction — the "join" between segmentation and recognition.

Mirrors /root/reference/kraken/lib/segmentation.py:1424-1643: the fast path
for straight (2-point) baselines is an axis-aligned crop of the boundary
polygon's bbox; arbitrary polygon boundaries are masked via scanline polygon
rasterization (background outside the boundary), which subsumes the
reference's mask-and-rotate path for horizontal text. (The curved-baseline
piecewise mesh warp is out of scope: the corpus contract guarantees straight
baselines; the hook stays here for parity of the API.)
"""

from __future__ import annotations

import numpy as np


def polygon_mask(boundary: list[list[int]], h: int, w: int) -> np.ndarray:
    """Rasterize a closed polygon to a HxW bool mask (even-odd scanline)."""
    ys = np.arange(h, dtype=np.float64) + 0.5
    mask = np.zeros((h, w), dtype=bool)
    pts = np.asarray(boundary, dtype=np.float64)
    n = len(pts)
    xs_at = [[] for _ in range(h)]
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        ylo, yhi = (y1, y2) if y1 < y2 else (y2, y1)
        rows = np.nonzero((ys >= ylo) & (ys < yhi))[0]
        if len(rows) == 0:
            continue
        xint = x1 + (ys[rows] - y1) * (x2 - x1) / (y2 - y1)
        for r, xv in zip(rows, xint):
            xs_at[r].append(xv)
    for r in range(h):
        xs = sorted(xs_at[r])
        for k in range(0, len(xs) - 1, 2):
            a = max(0, int(np.ceil(xs[k] - 0.5)))
            b = min(w, int(np.ceil(xs[k + 1] - 0.5)))
            if b > a:
                mask[r, a:b] = True
    return mask


def extract_line(
    ink: np.ndarray, line: dict, pad: int = 0
) -> tuple[np.ndarray, tuple[int, int]]:
    """Extract a line strip from the page ink mask.

    Returns (strip uint8 (h,w), (x0, y0) page offset of the strip origin).
    Straight-baseline rectangular boundaries take the crop fast path
    (segmentation.py:1551-1628); other boundaries are masked crops.
    """
    h, w = ink.shape
    x0, y0, x1, y1 = line["bbox"]
    x0, y0 = max(0, x0 - pad), max(0, y0)
    x1, y1 = min(w, x1 + pad), min(h, y1)
    if x1 <= x0 or y1 <= y0:
        return np.zeros((0, 0), dtype=np.uint8), (x0, y0)
    strip = ink[y0:y1, x0:x1]
    boundary = line.get("boundary")
    if boundary is not None and not _is_rect(boundary, line["bbox"]):
        m = polygon_mask([[px - x0, py - y0] for px, py in boundary], y1 - y0, x1 - x0)
        strip = np.where(m, strip, 0)
    return strip.astype(np.uint8), (x0, y0)


def _is_rect(boundary: list[list[int]], bbox: list[int]) -> bool:
    if len(boundary) != 4:
        return False
    xs = {p[0] for p in boundary}
    ys = {p[1] for p in boundary}
    return xs == {bbox[0], bbox[2]} and ys == {bbox[1], bbox[3]}


def extract_line_dewarped(
    ink: np.ndarray, line: dict, cell_w: int = 32, target_h: int = 14
) -> tuple[np.ndarray, tuple[int, int]]:
    """Extract a CURVED line as a straightened strip: the bbox crop is
    split into glyph-cell columns (the corpus cell pitch), each cell is
    shifted vertically so its ink bottom lands on row target_h - 1, and
    the strip is cropped to target_h rows.

    The piecewise-translation analog of the reference's bevelled mesh warp
    (extract_polygons, /root/reference/kraken/lib/segmentation.py:1424-1643):
    the warp is piecewise per quad there, piecewise per cell here, and both
    resample the source band onto a straight strip. Exact for the corpus
    because glyphs are drawn with per-cell integer offsets.

    The crop is padded UPWARD beyond the envelope bbox: the per-cell
    bottom-snap keeps exactly target_h rows above each cell's ink bottom,
    so extra top rows (including any previous-line ink) are discarded per
    cell — this protects against envelopes that under-estimate the curve's
    upward excursion.
    """
    bbox = list(line["bbox"])
    padded = dict(line, bbox=[bbox[0], max(bbox[1] - target_h, 0), bbox[2], bbox[3]])
    padded.pop("boundary", None)
    strip, (x0, y0) = extract_line(ink, padded)
    h, w = strip.shape
    if h == 0 or w == 0:
        return strip, (x0, y0)
    # pass 1: per-cell ink bottom; cells whose glyph does not touch the
    # baseline (dashes, apostrophes) yield a too-high bottom, detected in
    # pass 2 as outliers vs their smooth neighbors and re-interpolated
    n_cells = -(-w // cell_w)
    bots = np.full(n_cells, -1, dtype=np.int64)
    for k in range(n_cells):
        cell = strip[:, k * cell_w : min((k + 1) * cell_w, w)]
        rows = np.nonzero(cell.any(axis=1))[0]
        if len(rows):
            bots[k] = int(rows[-1])
    have = np.nonzero(bots >= 0)[0]
    if len(have) == 0:
        return np.zeros((target_h, w), dtype=np.uint8), (x0, y0)
    # the true band bottom is the upper envelope of neighboring bottoms:
    # a floating glyph sits strictly above its neighbors' smooth curve
    ref = np.interp(np.arange(n_cells), have, bots[have])
    for _ in range(2):  # two refinement sweeps
        good = np.nonzero((bots >= 0) & (bots >= ref - 2))[0]
        if len(good) == 0:
            break
        ref = np.interp(np.arange(n_cells), good, bots[good])
    bot_final = np.round(ref).astype(np.int64)
    out = np.zeros((target_h, w), dtype=np.uint8)
    for k in range(n_cells):
        c0, c1 = k * cell_w, min((k + 1) * cell_w, w)
        if bots[k] < 0:
            continue
        bot = int(bot_final[k])
        top = max(bot + 1 - target_h, 0)
        block = strip[top : bot + 1, c0:c1]
        out[target_h - block.shape[0] :, c0:c1] = block
    return out, (x0, y0)
