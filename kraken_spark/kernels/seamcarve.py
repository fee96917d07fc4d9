"""Seam-carve polygonal line environments.

Re-expresses the reference's polygonizer — `calculate_polygonal_environment`
and its per-side `_calc_seam` dynamic program
(/root/reference/kraken/lib/segmentation.py:560-635,747-842) — for the
binary-ink regime: for every baseline a minimum-energy seam is carved
through the inter-line gap above and below it (column-wise DP with
3-neighbor transitions, the same fold the reference builds with
stride tricks at :604-618), where energy is ink occupancy plus a small
distance bias pulling the seam toward the line (the reference's
`dist_bias`, :573-587). The two seams close into the line's boundary
polygon.

Pure numpy, zero Spark imports. The line's ink-exact bbox (kernels/blla.py
polygonize_line) is kept as the recognition crop window; the seam polygon
wraps it, so polygon-masked extraction (kernels/lineextract.py) stays
byte-identical by construction while the boundary geometry carries the
reference's tight polygonal environment.
"""

from __future__ import annotations

import numpy as np

_INK_WEIGHT = np.float32(1000.0)
_DIST_WEIGHT = np.float32(0.01)
_INF = np.float32(1e9)


def column_seam(energy: np.ndarray) -> np.ndarray:
    """Min-energy left-to-right seam through an (h, w) energy map: DP with
    {-1, 0, +1} row transitions per column and backtrack — the numpy form
    of the reference's strided seam fold (_calc_seam, :604-625). Returns
    the seam row index per column."""
    h, w = energy.shape
    e = energy.astype(np.float32, copy=False)
    dp = e[:, 0].copy()
    back = np.zeros((w, h), dtype=np.int8)
    rows = np.arange(h)
    for x in range(1, w):
        up = np.concatenate(([_INF], dp[:-1]))
        down = np.concatenate((dp[1:], [_INF]))
        stack = np.stack([up, dp, down])
        arg = np.argmin(stack, axis=0)
        back[x] = arg.astype(np.int8) - 1  # -1 came-from-above, 0 stay, +1 below
        dp = stack[arg, rows] + e[:, x]
    ys = np.empty(w, dtype=np.int32)
    j = int(np.argmin(dp))
    for x in range(w - 1, 0, -1):
        ys[x] = j
        j += int(back[x, j])
    ys[0] = j
    return ys


def _gap_seam(ink: np.ndarray, y0: int, y1: int, x0: int, x1: int, hug: str) -> np.ndarray:
    """Seam through the band rows [y0, y1) over columns [x0, x1): energy =
    ink occupancy + distance bias toward the band edge named by `hug`
    ('bottom' for a top seam hugging the line below it, 'top' for a bottom
    seam hugging the line above it)."""
    raw = ink[y0:y1, x0:x1]
    if not raw.any():
        # blank gap: the bias-optimal seam is the constant row at the hugged
        # edge — skips the DP entirely (the overwhelmingly common case)
        const = y1 - 1 if hug == "bottom" else y0
        return np.full(x1 - x0, const, dtype=np.int32)
    band = raw.astype(np.float32)
    h = band.shape[0]
    dist = np.arange(h, dtype=np.float32)
    if hug == "bottom":
        dist = dist[::-1]
    energy = band * _INK_WEIGHT + dist[:, None] * _DIST_WEIGHT
    return column_seam(energy) + y0


def polygonal_environment(
    ink: np.ndarray,
    lines: list[dict],
    pad_y: int = 20,
) -> list[list[list[int]]]:
    """Closed boundary polygon per line (reading-order `lines` with
    ink-exact bbox + baseline, the segment_blla contract): the top seam is
    carved in the gap up to the previous line's bbox bottom, the bottom
    seam down to the next line's bbox top (page edge / pad_y at the
    extremes), both over the line's ink x-extent. Column order follows
    reading order per x-band, so the neighbor scan uses bbox overlap."""
    h, w = ink.shape
    out: list[list[list[int]]] = []
    boxes = [l["bbox"] for l in lines]
    for i, l in enumerate(lines):
        x0, ly0, x1, ly1 = (int(v) for v in l["bbox"])
        # nearest vertically-adjacent neighbors sharing >= half the x-range
        above = 0
        below = h
        for j, (u0, v0, u1, v1) in enumerate(boxes):
            if j == i:
                continue
            overlap = min(x1, u1) - max(x0, u0)
            if overlap < 0.5 * (x1 - x0):
                continue
            if v1 <= ly0:
                above = max(above, v1)
            elif v0 >= ly1:
                below = min(below, v0)
        top_lo = max(above, ly0 - pad_y)
        bot_hi = min(below, ly1 + pad_y)
        if top_lo >= ly0:  # touching bands: fall back to the bbox edge
            top = np.full(x1 - x0, ly0, dtype=np.int32)
        else:
            top = _gap_seam(ink, top_lo, ly0, x0, x1, hug="bottom")
        if bot_hi <= ly1:
            bot = np.full(x1 - x0, ly1, dtype=np.int32)
        else:
            bot = _gap_seam(ink, ly1, bot_hi, x0, x1, hug="top")
        # polygon x runs to the EXCLUSIVE x1 (rasterization treats the right
        # edge as exclusive, mirroring polygonize_line's bbox convention)
        xs = np.append(np.arange(x0, x1, dtype=np.int32), np.int32(x1))
        top = np.append(top, top[-1])
        bot = np.append(bot, bot[-1])
        poly = (
            [[int(x), int(y)] for x, y in zip(xs, top)]
            + [[int(x), int(y)] for x, y in zip(xs[::-1], bot[::-1])]
        )
        out.append(_simplify_closed(poly))
    return out


def _simplify_closed(poly: list[list[int]], tolerance: float = 1.0) -> list[list[int]]:
    """Douglas-Peucker each seam run separately so the closed ring stays
    simple (the reference simplifies region polygons the same way,
    vectorize_regions, lib/segmentation.py:448)."""
    from .blla import approximate_polygon

    n = len(poly) // 2
    top = approximate_polygon(np.asarray(poly[:n], dtype=np.float64), tolerance)
    bot = approximate_polygon(np.asarray(poly[n:], dtype=np.float64), tolerance)
    ring = np.concatenate([top, bot]).astype(np.int64)
    return [[int(x), int(y)] for x, y in ring]
