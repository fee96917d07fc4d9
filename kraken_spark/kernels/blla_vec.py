"""Reference-faithful BLLA baseline/region vectorization chain, pure numpy.

Ports the structure of the reference's vectorize_lines / vectorize_regions
(/root/reference/kraken/lib/segmentation.py:316-419,422-449) and their
helpers (_extend_boundaries :250-290, boundary_tracing :189-247, LineMCP
:293-313) without scipy/skimage/shapely (none ship in this environment):

1. Sato multi-scale Hessian ridge filter over the baseline heatmap
   (skimage.filters.sato(black_ridges=False, mode='constant'), called at
   lib/segmentation.py:346) — `sato_ridge`.  2-D response per Sato et
   al. 1998: sigma^2 * max(-lambda_min(H_sigma), 0), maxed over
   sigmas (1, 3, 5, 7, 9), with Gaussian-derivative Hessians.
2. threshold 0.17 -> skeletonize (Zhang-Suen thinning, the 2-D default of
   skimage.morphology.skeletonize used at :348) — `skeletonize`.
3. endpoint detection via the 3x3 [1,1,1;1,10,1;1,1,1] convolution == 11
   (:350-352), with the reference's 400-endpoint budget / 10-per-component
   filter (:353-381) — inside `vectorize_lines_ref`.
4. minimum-cost-path joins between endpoints (skimage.graph.MCP_Connect
   subclass LineMCP over cost array ~skeleton, :293-313,388-391):
   wavefronts flood zero-cost skeleton pixels from every endpoint; any
   step onto a nonzero-cost pixel is frozen (goal_reached returns 2 for
   float_cumcost > 0), so fronts only meet along the skeleton (or across a
   single off-skeleton pixel); the best meeting per endpoint pair is kept
   and the two tracebacks concatenated — `_mcp_connect`.
5. approximate_polygon(line, 3) Douglas-Peucker simplification (:392,
   reusing kernels/blla.approximate_polygon).
6. baseline extension to the binarized ridge-blob boundary
   (_extend_boundaries :250-290): Moore boundary tracing of each blob,
   then each baseline whose endpoints fall inside its containing blob
   polygon is extended along its end tangent to the polygon boundary
   (exactly one ray intersection -> that point, else nearest boundary
   point) — `_extend_boundaries_np` with `boundary_tracing`,
   `_poly_contains`, `_seg_poly_intersections`, `_nearest_on_poly`.
7. orientation by start/end separator maps under a 20x20 maximum filter
   (:397-419), defaulting to left-to-right (horizontal) / top-to-bottom
   (vertical) when marker confidence is insufficient — the constructed
   segmenter has no separator channels, so the default branch is the live
   one (documented divergence: a trained model's separator heads can flip
   RTL lines; the constructed net cannot).

Divergences from the reference (all forced by the no-scipy/skimage/shapely
environment, asserted in tests/test_blla_vec.py):
- sato_ridge implements the published 2-D Sato formula; skimage's exact
  per-version modulation constants may differ in magnitude (the 0.17
  threshold was validated against this implementation's response scale).
- shapely's simplify(0.01).buffer(0) on blob boundaries is Douglas-Peucker
  at the same tolerance without the buffer(0) self-intersection repair.
- unary_union of region polygons is skipped: boundaries of distinct
  connected components of one binary map are disjoint by construction, so
  the union is the identity on them.
"""

from __future__ import annotations

import heapq

import numpy as np

from .blla import approximate_polygon
from .morph import label

# ------------------------------------------------------------------ sato


def _gauss_deriv_kernel(sigma: float, order: int, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d kernel for derivative `order`:
    Hermite-polynomial modulated Gaussian (scipy's exact recurrence)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    s2 = sigma * sigma
    phi = np.exp(-0.5 * x * x / s2)
    phi /= phi.sum()
    if order == 0:
        return phi
    # q(x) satisfies d^n/dx^n phi = q(x) phi; q_{n+1} = q_n' - (x/s2) q_n
    q = np.zeros(order + 1)
    q[0] = 1.0
    for _ in range(order):
        qd = np.polyder(np.poly1d(q[::-1])).coeffs[::-1] if len(q) > 1 else np.array([0.0])
        nq = np.zeros(len(q) + 1)
        nq[: len(qd)] += qd
        nq[1:] -= q / s2
        q = nq
    return np.polyval(q[::-1], x) * phi


def _correlate1d(a: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    """1-D correlation with zero ('constant') padding — the mode the
    reference passes to sato (lib/segmentation.py:346). One BLAS matvec
    over a sliding-window view (large sigmas would cost ~70 full-array
    passes as a tap loop)."""
    r = (len(k) - 1) // 2
    pad = [(0, 0)] * a.ndim
    pad[axis] = (r, r)
    ap = np.pad(a, pad)
    win = np.lib.stride_tricks.sliding_window_view(ap, len(k), axis=axis)
    return win @ k


def _gaussian_deriv(img: np.ndarray, sigma: float, orders: tuple[int, int]) -> np.ndarray:
    out = _correlate1d(img, _gauss_deriv_kernel(sigma, orders[0]), 0)
    return _correlate1d(out, _gauss_deriv_kernel(sigma, orders[1]), 1)


def sato_ridge(bl_map: np.ndarray, sigmas=(1, 3, 5, 7, 9)) -> np.ndarray:
    """Multi-scale bright-ridge response (skimage.filters.sato analog,
    black_ridges=False, mode='constant'): for each sigma the
    Gaussian-derivative Hessian eigenvalues are computed and the response
    is sigma^2 * clip(-lambda_min, 0); scales are max-combined."""
    img = np.asarray(bl_map, dtype=np.float64)
    out = np.zeros_like(img)
    for s in sigmas:
        hrr = _gaussian_deriv(img, s, (2, 0))
        hcc = _gaussian_deriv(img, s, (0, 2))
        hrc = _gaussian_deriv(img, s, (1, 1))
        half_tr = 0.5 * (hrr + hcc)
        disc = np.sqrt(np.maximum(0.25 * (hrr - hcc) ** 2 + hrc * hrc, 0.0))
        lmin = half_tr - disc
        np.maximum(out, (s * s) * np.clip(-lmin, 0.0, None), out=out)
    return out


# ------------------------------------------------------------ skeletonize

# Zhang-Suen lookup: for each of the 256 neighborhoods (P2..P9 clockwise
# from north), whether the pixel is deletable in subiteration 1 / 2.
_ZS_LUT1 = np.zeros(256, dtype=bool)
_ZS_LUT2 = np.zeros(256, dtype=bool)
for _code in range(256):
    _p = [(_code >> _i) & 1 for _i in range(8)]  # P2..P9
    _b = sum(_p)
    _a = sum(1 for _i in range(8) if _p[_i] == 0 and _p[(_i + 1) % 8] == 1)
    if 2 <= _b <= 6 and _a == 1:
        p2, p3, p4, p5, p6, p7, p8, p9 = _p
        if p2 * p4 * p6 == 0 and p4 * p6 * p8 == 0:
            _ZS_LUT1[_code] = True
        if p2 * p4 * p8 == 0 and p2 * p6 * p8 == 0:
            _ZS_LUT2[_code] = True


def _neighbor_code(img: np.ndarray) -> np.ndarray:
    """Bit-packed P2..P9 neighborhood (N, NE, E, SE, S, SW, W, NW) for the
    interior of a zero-padded image."""
    c = img[1:-1, 1:-1]
    code = np.zeros(c.shape, dtype=np.uint8)
    shifts = [
        (0, 1),  # P2 N
        (0, 2),  # P3 NE
        (1, 2),  # P4 E
        (2, 2),  # P5 SE
        (2, 1),  # P6 S
        (2, 0),  # P7 SW
        (1, 0),  # P8 W
        (0, 0),  # P9 NW
    ]
    h, w = c.shape
    for bit, (dy, dx) in enumerate(shifts):
        code |= (img[dy : dy + h, dx : dx + w] << bit).astype(np.uint8)
    return code


def skeletonize(mask: np.ndarray) -> np.ndarray:
    """Zhang-Suen thinning (the 2-D default of
    skimage.morphology.skeletonize, lib/segmentation.py:348)."""
    img = np.pad(np.asarray(mask, dtype=np.uint8), 1)
    while True:
        changed = False
        for lut in (_ZS_LUT1, _ZS_LUT2):
            code = _neighbor_code(img)
            rem = lut[code] & (img[1:-1, 1:-1] == 1)
            if rem.any():
                img[1:-1, 1:-1][rem] = 0
                changed = True
        if not changed:
            break
    return img[1:-1, 1:-1].astype(bool)


# ------------------------------------------------------------ MCP connect


_OFFS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _mcp_connect(skel: np.ndarray, seeds: np.ndarray) -> list[np.ndarray]:
    """LineMCP analog (lib/segmentation.py:293-313): multi-seed Dijkstra
    over cost array (~skel) where skeleton pixels cost 0 and off-skeleton
    pixels cost 1; off-skeleton pixels are frozen on entry (goal_reached
    -> 2), so fronts flood the skeleton only. When a front examines a
    pixel owned by a different front, a connection is recorded; the lowest
    combined-cost meeting per seed pair wins and its two predecessor
    tracebacks are concatenated into the path."""
    h, w = skel.shape
    owner = np.full((h, w), -1, dtype=np.int32)
    pred = np.full((h, w), -1, dtype=np.int64)  # flat predecessor index
    cum = np.full((h, w), np.inf)
    frozen = np.zeros((h, w), dtype=bool)
    heap: list[tuple[float, int, int, int]] = []
    tick = 0
    for i, (r, c) in enumerate(seeds):
        r, c = int(r), int(c)
        cum[r, c] = 0.0
        owner[r, c] = i
        heapq.heappush(heap, (0.0, tick, r, c))
        tick += 1
    best: dict[tuple[int, int], tuple[float, tuple[int, int], tuple[int, int]]] = {}
    done = np.zeros((h, w), dtype=bool)
    while heap:
        cost, _, r, c = heapq.heappop(heap)
        if done[r, c] or cost > cum[r, c]:
            continue
        done[r, c] = True
        for dr, dc in _OFFS8:
            nr, nc = r + dr, c + dc
            if nr < 0 or nr >= h or nc < 0 or nc >= w:
                continue
            o = owner[nr, nc]
            if o >= 0 and o != owner[r, c]:
                k = (min(owner[r, c], o), max(owner[r, c], o))
                s = cum[r, c] + cum[nr, nc]
                if k not in best or best[k][0] > s:
                    best[k] = (s, (r, c), (nr, nc))
                continue
            if o >= 0:
                continue
            step = 0.0 if skel[nr, nc] else 1.0
            ncost = cost + step
            if ncost < cum[nr, nc]:
                cum[nr, nc] = ncost
                owner[nr, nc] = owner[r, c]
                pred[nr, nc] = r * w + c
                if step > 0.0:
                    frozen[nr, nc] = True  # goal_reached == 2: no expansion
                else:
                    heapq.heappush(heap, (ncost, tick, nr, nc))
                    tick += 1

    def traceback(pos: tuple[int, int]) -> list[tuple[int, int]]:
        path = [pos]
        r, c = pos
        while pred[r, c] >= 0:
            p = int(pred[r, c])
            r, c = p // w, p % w
            path.append((r, c))
        return path[::-1]

    out = []
    for (_, __), (s, p1, p2) in sorted(best.items(), key=lambda kv: kv[0]):
        out.append(np.array(traceback(p1) + traceback(p2)[::-1], dtype=np.float64))
    return out


# ------------------------------------------------- boundary tracing (Moore)


def boundary_tracing(sub_mask: np.ndarray, origin: tuple[int, int]) -> np.ndarray:
    """Moore-neighborhood boundary tracing with Jacob's stopping criterion
    over one connected component (the role of boundary_tracing,
    lib/segmentation.py:189-247). sub_mask is a component-tight boolean
    array; origin is its (row, col) offset in the full map. Returns the
    closed boundary as (N, 2) (row, col) coordinates in full-map space."""
    binary = np.pad(sub_mask.astype(np.uint8), 1)
    ys, xs = np.nonzero(binary)
    if len(ys) == 0:
        return np.zeros((0, 2))
    # start: first foreground pixel in scan order that is not isolated
    order = np.lexsort((xs, ys))
    start = None
    for i in order:
        r, c = int(ys[i]), int(xs[i])
        if binary[r - 1 : r + 2, c - 1 : c + 2].sum() > 1:
            start = (r, c)
            break
    if start is None:  # single isolated pixel
        r, c = int(ys[order[0]]), int(xs[order[0]])
        return np.array([[r - 1 + origin[0], c - 1 + origin[1]]], dtype=np.float64)
    r, c = start
    if binary[r + 1, c] == 0 and binary[r + 1, c - 1] == 0:
        backtrack_start = (r + 1, c)
    else:
        backtrack_start = (r, c - 1)
    # clockwise Moore neighborhood starting from the backtrack pixel
    moore = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]
    current, backtrack = start, backtrack_start
    boundary = []
    guard = 4 * binary.size
    while guard > 0:
        guard -= 1
        dr, dc = backtrack[0] - current[0], backtrack[1] - current[1]
        k = moore.index((dr, dc))
        ring = [moore[(k + j) % 8] for j in range(8)]
        hit = 0
        for j, (or_, oc) in enumerate(ring):
            if binary[current[0] + or_, current[1] + oc]:
                hit = j
                break
        boundary.append(current)
        backtrack = (current[0] + ring[hit - 1][0], current[1] + ring[hit - 1][1])
        current = (current[0] + ring[hit][0], current[1] + ring[hit][1])
        if current == start and backtrack == backtrack_start:
            break
    b = np.array(boundary, dtype=np.float64)
    b[:, 0] += origin[0] - 1
    b[:, 1] += origin[1] - 1
    return b


# ------------------------------------------------------ polygon geometry


def _poly_contains(poly: np.ndarray, pt: np.ndarray) -> bool:
    """Ray-casting point-in-polygon (strict interior is not distinguished
    from boundary — shapely's contains() excludes the boundary, but the
    blob polygons here enclose their baselines with >= 1 px margin)."""
    x, y = pt[1], pt[0]
    n = len(poly)
    inside = False
    j = n - 1
    for i in range(n):
        yi, xi = poly[i]
        yj, xj = poly[j]
        if (yi > y) != (yj > y):
            xint = xj + (y - yj) / (yi - yj) * (xi - xj)
            if x < xint:
                inside = not inside
        j = i
    return inside


def _seg_poly_intersections(p: np.ndarray, q: np.ndarray, poly: np.ndarray) -> list[np.ndarray]:
    """All intersection points of segment p->q with the polygon boundary."""
    out = []
    d = q - p
    n = len(poly)
    for i in range(n):
        a = poly[i]
        b = poly[(i + 1) % n]
        e = b - a
        denom = d[0] * e[1] - d[1] * e[0]
        if denom == 0:
            continue
        w = a - p
        t = (w[0] * e[1] - w[1] * e[0]) / denom
        u = (w[0] * d[1] - w[1] * d[0]) / denom
        if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
            out.append(p + t * d)
    # dedup nearly-identical points (shared polygon vertices)
    ded: list[np.ndarray] = []
    for pt in out:
        if not any(np.hypot(*(pt - o)) < 1e-9 for o in ded):
            ded.append(pt)
    return ded


def _nearest_on_poly(pt: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Closest point on the polygon boundary to pt (shapely
    nearest_points analog)."""
    best = None
    bd = np.inf
    n = len(poly)
    for i in range(n):
        a = poly[i]
        b = poly[(i + 1) % n]
        e = b - a
        ee = float(e @ e)
        t = 0.0 if ee == 0 else float(np.clip((pt - a) @ e / ee, 0.0, 1.0))
        c = a + t * e
        dist = float(np.hypot(*(pt - c)))
        if dist < bd:
            bd = dist
            best = c
    return best


def _extend_boundaries_np(
    baselines: list[list[list[float]]], bin_bl_map: np.ndarray
) -> list[list[list[float]]]:
    """_extend_boundaries (lib/segmentation.py:250-290): trace each
    binarized ridge blob's boundary polygon, then push each baseline
    endpoint that lies inside its containing blob outward along the end
    tangent to the blob boundary."""
    labelled, n = label(bin_bl_map, connectivity=2)
    polys = []
    for li in range(1, n + 1):
        m = labelled == li
        if m.sum() < 6:  # reference skips very small blobs
            continue
        ys, xs = np.nonzero(m)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        b = boundary_tracing(m[y0:y1, x0:x1], (int(y0), int(x0)))
        if len(b) > 3:
            polys.append(approximate_polygon(b, 0.01))
    for bl in baselines:
        if len(bl) < 2:
            continue
        pts = np.asarray(bl, dtype=np.float64)
        pol = next((p for p in polys if all(_poly_contains(p, v) for v in pts)), None)
        if pol is None:
            continue
        for end, nxt, idx in ((pts[0], pts[1], 0), (pts[-1], pts[-2], len(bl) - 1)):
            if not _poly_contains(pol, end):
                continue
            far = end - 10.0 * (nxt - end)
            hits = _seg_poly_intersections(far, end, pol)
            new = hits[0] if len(hits) == 1 else _nearest_on_poly(end, pol)
            bl[idx] = [int(new[0]), int(new[1])]  # reference casts to int
    return baselines


# --------------------------------------------------------- max filter


def _max_filter(a: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.maximum_filter(size=...) separable analog: window
    [i - size//2, i + size - size//2 - 1], reflect padding."""
    out = np.asarray(a, dtype=np.float64)
    lo, hi = size // 2, size - size // 2 - 1
    for ax in (0, 1):
        moved = np.moveaxis(out, ax, 0)
        padded = np.pad(moved, [(lo, hi)] + [(0, 0)] * (moved.ndim - 1), mode="symmetric")
        win = np.lib.stride_tricks.sliding_window_view(padded, size, axis=0)
        out = np.moveaxis(win.max(axis=-1), 0, ax)
    return out


# ------------------------------------------------------ main chain


def vectorize_lines_ref(
    im: np.ndarray,
    threshold: float = 0.17,
    min_length: int = 5,
    text_direction: str = "horizontal",
    max_endpoints: int = 400,
) -> list[list[list[int]]]:
    """vectorize_lines (lib/segmentation.py:316-419): im is (3, H, W) =
    (start_separators, end_separators, baseline) probability maps. Returns
    baselines as lists of (x, y) points in heatmap coordinates."""
    if text_direction not in ("horizontal", "vertical"):
        raise ValueError(f'Invalid text direction "{text_direction}"')
    st_map, end_map, bl_map = im[0], im[1], im[2]
    ridge = sato_ridge(bl_map)
    bin_bl_map = ridge > threshold
    line_skel = skeletonize(bin_bl_map)
    # endpoints: skeleton pixels with exactly one skeleton neighbor
    padded = np.pad(line_skel.astype(np.uint8), 1)
    h, w = line_skel.shape
    nsum = np.zeros((h, w), dtype=np.int32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            nsum += padded[dy : dy + h, dx : dx + w]
    extrema = np.transpose(np.nonzero((nsum == 1) & line_skel))

    if len(extrema) > max_endpoints:
        _MAX_EP_PER_CC = 10
        skel_labels, n_cc = label(line_skel, connectivity=2)
        ep_cc = skel_labels[extrema[:, 0], extrema[:, 1]]
        cc_ids, cc_counts = np.unique(ep_cc, return_counts=True)
        ep_count = dict(zip(cc_ids.tolist(), cc_counts.tolist()))
        valid = {cid for cid, cnt in ep_count.items() if cnt <= _MAX_EP_PER_CC}
        remaining = sum(ep_count[c] for c in valid)
        if remaining > max_endpoints:
            cc_sizes = np.bincount(skel_labels.ravel())
            budget_ccs: set[int] = set()
            budget = 0
            for cid in sorted(valid, key=lambda c: cc_sizes[c], reverse=True):
                if budget + ep_count[cid] > max_endpoints:
                    break
                budget_ccs.add(cid)
                budget += ep_count[cid]
            valid = budget_ccs
        extrema = extrema[np.isin(ep_cc, list(valid))]

    if len(extrema) < 2:
        return []

    paths = _mcp_connect(line_skel, extrema)
    lines = [approximate_polygon(p, 3).tolist() for p in paths]
    lines = _extend_boundaries_np(lines, bin_bl_map)

    f_st = _max_filter(st_map, 20) if np.any(st_map) else None
    f_end = _max_filter(end_map, 20) if np.any(end_map) else None

    oriented = []
    for bl in lines:
        if f_st is not None and f_end is not None:
            l_end = (int(bl[0][0]), int(bl[0][1]))
            r_end = (int(bl[-1][0]), int(bl[-1][1]))
            dl = f_st[l_end] - f_end[l_end]
            dr = f_st[r_end] - f_end[r_end]
        else:
            dl = dr = 0.0
        if dl > 0.2 and dr < -0.2:
            pass
        elif dl < -0.2 and dr > 0.2:
            bl = bl[::-1]
        else:
            if text_direction == "horizontal":
                if bl[0][1] > bl[-1][1]:
                    bl = bl[::-1]
            else:
                if bl[0][0] > bl[-1][0]:
                    bl = bl[::-1]
        length = sum(
            float(np.hypot(bl[i + 1][0] - bl[i][0], bl[i + 1][1] - bl[i][1]))
            for i in range(len(bl) - 1)
        )
        if length >= min_length:
            oriented.append([[int(round(x)), int(round(y))] for y, x in bl])
    return oriented


def vectorize_regions_ref(im: np.ndarray, threshold: float = 0.5) -> list[list[list[int]]]:
    """vectorize_regions (lib/segmentation.py:422-449): binarize, trace
    each component boundary, simplify with tolerance 10. unary_union is
    the identity here (distinct components are disjoint)."""
    binary = im > threshold
    labelled, n = label(binary, connectivity=2)
    out = []
    for li in range(1, n + 1):
        m = labelled == li
        ys, xs = np.nonzero(m)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        b = boundary_tracing(m[y0:y1, x0:x1], (int(y0), int(x0)))
        if len(b) <= 2:
            continue
        closed = np.vstack([b, b[:1]])
        simp = approximate_polygon(closed, 10.0)
        out.append([[int(x), int(y)] for y, x in simp[:-1]])
    return out
