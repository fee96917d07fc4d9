"""Per-code-point OCR record containers with polygon-section geometry.

Pure numpy/stdlib re-implementation of the reference's record slicing
semantics (reference: kraken/containers.py:357-760) and the baseline
polygon-section geometry it relies on
(reference: kraken/lib/segmentation.py:1087-1330 —
``_test_intersect`` / ``compute_polygon_section`` /
``precompute_polygon_sections``).

Semantics preserved exactly (pinned byte-for-byte against the reference's
own pickled fixtures in tests/test_record_slicing.py):

* slicing a record returns ONE polygon section of the line boundary
  spanning first..last sliced code point (not per-char boxes), built from
  the two orthogonal cuts through the baseline at the min/max cut offsets;
* the cut ray picks the intersection at the FIRST polygon edge index with
  a non-negative ray parameter (an ordering quirk of the reference, kept
  for parity — it is NOT the nearest intersection);
* baseline endpoints strictly inside the boundary polygon are extrapolated
  outward to the boundary before distances are measured;
* ``display_order()`` / ``logical_order()`` toggle through the UAX#9
  reorder (kernels/bidi.get_display), permuting cuts/confidences with the
  text.

No Spark imports; used driver-side by serializer word/glyph geometry and
in parity tests against /root/reference/tests/resources/*.pkl.
"""

from __future__ import annotations

import pickle
import numpy as np

from .bidi import get_display

_EPS = float(np.finfo(float).eps)


# ---------------------------------------------------------------------------
# low-level geometry
# ---------------------------------------------------------------------------

def point_strictly_inside(pt, poly) -> bool:
    """Ray-casting point-in-polygon; points on an edge count as OUTSIDE
    (parity with the reference's shapely ``contains`` emulation,
    lib/segmentation.py:1105-1130)."""
    px, py = float(pt[0]), float(pt[1])
    inside = False
    prev = poly[-1]
    for cur in poly:
        ax, ay = float(prev[0]), float(prev[1])
        bx, by = float(cur[0]), float(cur[1])
        if min(ay, by) <= py <= max(ay, by) and min(ax, bx) <= px <= max(ax, bx):
            if abs((ax - bx) * (py - by) - (ay - by) * (px - bx)) < 1e-10:
                return False  # on the boundary
        if (ay > py) != (by > py) and px < (ax - bx) * (py - by) / (ay - by) + bx:
            inside = not inside
        prev = cur
    return inside


def ray_exit_point(origin, direction, poly):
    """Closest intersection of the ray origin+t*direction (t>=0) with the
    polygon's edges, or None (lib/segmentation.py:1133-1158)."""
    arr = np.asarray(poly, dtype=float)
    origin = np.asarray(origin, dtype=float)
    direction = np.asarray(direction, dtype=float)
    hit_t = np.inf
    hit = None
    n = len(arr)
    for i in range(n):
        a = arr[i]
        e = arr[(i + 1) % n] - a
        den = direction[0] * e[1] - direction[1] * e[0]
        if abs(den) < _EPS:
            continue
        rel = a - origin
        t = (rel[0] * e[1] - rel[1] * e[0]) / den
        u = (rel[0] * direction[1] - rel[1] * direction[0]) / den
        if t >= 0 and 0 <= u <= 1 and t < hit_t:
            hit_t = t
            hit = origin + t * direction
    return hit


def nearest_boundary_point(pt, poly):
    """Nearest point on the polygon's boundary to ``pt`` (numpy stand-in for
    the reference's shapely ``nearest_points`` fallback)."""
    arr = np.asarray(poly, dtype=float)
    p = np.asarray(pt, dtype=float)
    seg_a = arr
    seg_b = np.roll(arr, -1, axis=0)
    d = seg_b - seg_a
    ln2 = np.einsum("ij,ij->i", d, d)
    t = np.einsum("ij,ij->i", p - seg_a, d) / np.where(ln2 == 0, 1.0, ln2)
    t = np.clip(t, 0.0, 1.0)
    proj = seg_a + t[:, None] * d
    dist = np.einsum("ij,ij->i", proj - p, proj - p)
    return proj[int(np.argmin(dist))]


def cut_ray_points(origin, axis, poly):
    """Intersections of the two opposite cut rays from ``origin`` with the
    boundary polygon, as a flat (4,) array [x+,y+,x-,y-], or None when a
    side finds no candidate edge.

    ``axis`` is the swapped baseline unit vector (uy, ux) — the caller
    passes ``unit[::-1]`` exactly like the reference
    (lib/segmentation.py:1087-1103, ``_test_intersect``). For each side the
    candidate kept is the one at the lowest polygon-edge INDEX with a
    non-negative ray parameter — the reference's ordering quirk, preserved
    byte-for-byte."""
    bs = np.asarray(poly)
    origin = np.asarray(origin, dtype=float)
    prev = np.roll(bs, 2)          # flat roll by 2 == previous vertex row
    edges = bs - prev
    rel = origin - prev
    out = []
    for sign in ((1, -1), (-1, 1)):
        w = (axis * sign * (1, -1))[::-1]
        den = np.dot(edges, w) + _EPS
        along_ray = (edges[:, 0] * rel[:, 1] - edges[:, 1] * rel[:, 0]) / den
        along_edge = np.dot(rel, w) / den
        cand = along_ray[np.logical_and(along_edge >= 0.0, along_edge <= 1.0)]
        first_nonneg = np.flatnonzero(cand >= 0)
        if first_nonneg.size == 0:
            return None
        out.extend(origin + cand[first_nonneg.min()] * (axis * sign))
    return np.array(out)


def _extended_baseline(baseline, boundary) -> np.ndarray:
    """Baseline with endpoints strictly inside the boundary extrapolated out
    to it (lib/segmentation.py:1190-1210)."""
    bl = np.array(baseline)
    for end, nxt in ((0, 1), (-1, -2)):
        if point_strictly_inside(bl[end], boundary):
            direction = bl[end].astype(float) - bl[nxt].astype(float)
            hit = ray_exit_point(bl[end].astype(float), direction, boundary)
            if hit is None:
                hit = nearest_boundary_point(bl[end], boundary)
            bl[end] = np.array(hit, "int")
    return bl


def _quad_of(p_lo, p_hi):
    """Assemble the 4-point section polygon from two flat cut-intersection
    arrays; the second pair is rolled so the winding closes."""
    quad = np.int_(p_lo).reshape(-1, 2).tolist()
    quad.extend(np.int_(np.roll(p_hi, 2)).reshape(-1, 2).tolist())
    return tuple(quad)


def polygon_section(baseline, boundary, dist1, dist2):
    """Section of ``boundary`` between the orthogonal cuts at baseline
    offsets ``dist1``/``dist2`` (lib/segmentation.py:1161-1233)."""
    dist1 = _EPS if dist1 == 0 else dist1
    dist2 = _EPS if dist2 == 0 else dist2
    bl = _extended_baseline(baseline, boundary)
    dists = np.cumsum(np.insert(np.linalg.norm(np.diff(bl, axis=0), axis=1), 0, 0))
    total = dists[-1]
    dist1 = min(total - _EPS, dist1)
    dist2 = min(total - _EPS, dist2)
    seg_idx = np.searchsorted(dists, [dist1, dist2])
    starts = bl[seg_idx - 1]
    ends = bl[seg_idx]
    span = ends - starts
    span_len = np.sqrt(np.sum(span ** 2, axis=1))
    unit = span / np.tile(span_len, (2, 1)).T
    offsets = (dist1, dist2) - dists[seg_idx - 1]
    pts = starts + (offsets * unit.T).T
    bounds = np.array(boundary)
    hits = []
    for pt, uv in zip(pts, unit):
        h = cut_ray_points(pt, uv[::-1], bounds)
        if h is None:
            return pts.astype("int").tolist()
        hits.append(h.round())
    return _quad_of(hits[0], hits[1])


def precompute_sections(baseline, boundary, cut_pairs):
    """Batch version over all per-character (dist1, dist2) pairs.

    Returns (char_polygons, cache, bl_length) where ``cache`` maps each
    clamped distance to its raw cut-ray array (or None on failure), exactly
    as the reference's ``precompute_polygon_sections``
    (lib/segmentation.py:1236-1330) so that slice lookups byte-match."""
    if not cut_pairs:
        return [], {}, 0.0
    bl = _extended_baseline(baseline, boundary)
    dists = np.cumsum(np.insert(np.linalg.norm(np.diff(bl, axis=0), axis=1), 0, 0))
    total = float(dists[-1])
    bounds = np.array(boundary)

    def clamp(d):
        return min(total - _EPS, _EPS if d == 0 else d)

    cache = {}
    for d in {clamp(v) for pair in cut_pairs for v in pair}:
        idx = int(np.searchsorted(dists, d))
        start = bl[idx - 1].astype(float)
        span = bl[idx].astype(float) - start
        ln = np.linalg.norm(span)
        unit = span if ln < _EPS else span / ln
        pt = start + (d - dists[idx - 1]) * unit
        hit = cut_ray_points(pt, unit[::-1], bounds)
        cache[d] = None if hit is None else hit.round()

    polys = []
    for d1, d2 in cut_pairs:
        lo, hi = cache[clamp(d1)], cache[clamp(d2)]
        if lo is not None and hi is not None:
            polys.append(_quad_of(lo, hi))
        else:
            polys.append(polygon_section(baseline, boundary, d1, d2))
    return polys, cache, total


# ---------------------------------------------------------------------------
# record containers
# ---------------------------------------------------------------------------

_LINE_KEYS = ("id", "text", "base_dir", "imagename", "tags", "split",
              "regions", "language")


class _Record:
    """Shared slicing/reorder machinery (reference containers.py:357-428).

    ``line`` is a plain dict payload (the reference uses dataclass
    inheritance; the fields are mirrored as attributes here so pickled
    reference fixtures restore transparently via ``__setstate__``)."""

    kind = None  # 'baselines' | 'bbox'

    def __init__(self, prediction, cuts, confidences, line,
                 base_dir=None, display_order=True):
        line = dict(line)
        if line.get("type") != self.kind:
            raise TypeError(f"line payload is not of type {self.kind!r}")
        for k, v in line.items():
            if k != "type":
                setattr(self, k, v)
        self._line_base_dir = line.get("base_dir")
        self.base_dir = base_dir
        self._prediction = prediction
        self._cuts = cuts
        self._confidences = confidences
        self._display_order = display_order

    # -- pickle interop with reference fixtures --
    def __setstate__(self, state):
        self.__dict__.update(state)

    def _line_payload(self) -> dict:
        d = {k: getattr(self, k, None) for k in _LINE_KEYS}
        d["type"] = self.kind
        return d

    def __len__(self) -> int:
        return len(self._prediction)

    def __str__(self) -> str:
        return self._prediction

    @property
    def prediction(self) -> str:
        return self._prediction

    @property
    def confidences(self) -> list:
        return self._confidences

    @property
    def cuts(self):
        return self._cuts

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __eq__(self, other):
        """Value equality over prediction/cuts/confidences and the line
        payload. The display-order flag is deliberately excluded — the
        reference's equality is the dataclass field comparison of the
        underlying line (containers.py BaselineLine/BBoxLine), so an
        identity-permutation reorder compares equal."""
        if other is self:
            return True
        if not isinstance(other, _Record):
            return NotImplemented
        return (self.kind == other.kind
                and self._prediction == other._prediction
                and list(map(list, self._cuts)) == list(map(list, other._cuts))
                and self._confidences == other._confidences
                and self._line_payload() == other._line_payload())

    def _raw(self, key: int):
        if key < 0:
            key += len(self)
        if key >= len(self):
            raise IndexError(f"index {key} out of range")
        return (self._prediction[key], self._cuts[key], self._confidences[key])

    def display_order(self, base_dir=None):
        return self if self._display_order else self._reorder(base_dir)

    def logical_order(self, base_dir=None):
        return self._reorder(base_dir) if self._display_order else self

    def _reorder(self, base_dir=None):
        pred, order = get_display(
            self._prediction, base_dir if base_dir in ("L", "R") else None)
        return type(self)(
            prediction=pred,
            cuts=[self._cuts[i] for i in order],
            confidences=[self._confidences[i] for i in order],
            line=self._line_payload(),
            base_dir=base_dir,
            display_order=not self._display_order)


class BaselineOCRRecord(_Record):
    """Baseline-format record; cuts are (dist1, dist2) offsets along the
    baseline, exposed to the user as boundary polygon sections
    (reference containers.py:430-606)."""

    kind = "baselines"

    def __init__(self, prediction, cuts, confidences, line,
                 base_dir=None, display_order=True, **_ignored):
        super().__init__(prediction, cuts, confidences, line,
                         base_dir, display_order)
        if getattr(self, "baseline", None) and getattr(self, "boundary", None) \
                and self._cuts:
            (self._polygon_cuts, self._intersection_cache,
             self._bl_length) = precompute_sections(
                self.baseline, self.boundary, self._cuts)
        else:
            self._polygon_cuts, self._intersection_cache, self._bl_length = [], {}, 0.0

    @property
    def cuts(self):
        return tuple(self._polygon_cuts)

    def _line_payload(self) -> dict:
        d = super()._line_payload()
        d["baseline"] = self.baseline
        d["boundary"] = self.boundary
        return d

    def __getitem__(self, key):
        if isinstance(key, int):
            ch, _, conf = self._raw(key)
            return (ch, self._polygon_cuts[key if key >= 0 else key + len(self)],
                    conf)
        if not isinstance(key, slice):
            raise TypeError("record indices must be int or slice")
        picked = [self._raw(i) for i in range(*key.indices(len(self)))]
        pred = "".join(p[0] for p in picked)
        flat = sum((tuple(p[1]) for p in picked), ())
        lo_d, hi_d = min(flat), max(flat)
        clamp = lambda d: min(self._bl_length - _EPS, _EPS if d == 0 else d)
        p_lo = self._intersection_cache.get(clamp(lo_d))
        p_hi = self._intersection_cache.get(clamp(hi_d))
        if p_lo is not None and p_hi is not None:
            cut = _quad_of(p_lo, p_hi)
        else:
            cut = polygon_section(self.baseline, self.boundary, lo_d, hi_d)
        return (pred, cut, np.mean([p[2] for p in picked]))


class BBoxOCRRecord(_Record):
    """BBox-format record; cuts are 4-point boxes per code point; slices
    aggregate to the enclosing axis-aligned box
    (reference containers.py:608-760)."""

    kind = "bbox"

    def __init__(self, prediction, cuts, confidences, line,
                 base_dir=None, display_order=True, **_ignored):
        super().__init__(prediction, cuts, confidences, line,
                         base_dir, display_order)

    def _line_payload(self) -> dict:
        d = super()._line_payload()
        d["bbox"] = getattr(self, "bbox", None)
        return d

    def __getitem__(self, key):
        if isinstance(key, int):
            return self._raw(key)
        if not isinstance(key, slice):
            raise TypeError("record indices must be int or slice")
        picked = [self._raw(i) for i in range(*key.indices(len(self)))]
        pred = "".join(p[0] for p in picked)
        xs = [x for p in picked for pt in p[1] for x in (pt[0],)]
        ys = [y for p in picked for pt in p[1] for y in (pt[1],)]
        lo_x, hi_x, lo_y, hi_y = min(xs), max(xs), min(ys), max(ys)
        cut = ((lo_x, lo_y), (hi_x, lo_y), (hi_x, hi_y), (lo_x, hi_y))
        return (pred, cut, np.mean([p[2] for p in picked]))


# ---------------------------------------------------------------------------
# reference-fixture loader
# ---------------------------------------------------------------------------

class _Namespace:
    """Attribute bag for reference container classes we don't model."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _RefUnpickler(pickle.Unpickler):
    """Maps reference ``kraken.containers`` classes onto this module's
    records (or plain namespaces) so the reference's pickled test fixtures
    load without the reference package installed."""

    _MAP = {"BaselineOCRRecord": BaselineOCRRecord,
            "BBoxOCRRecord": BBoxOCRRecord}

    def find_class(self, module, name):
        if module.startswith("kraken"):
            cls = self._MAP.get(name)
            if cls is None:
                cls = type(name, (_Namespace,), {"__module__": module})
                self._MAP[name] = cls
            return cls
        return super().find_class(module, name)


def load_reference_pickle(path):
    """Load one of the reference's pickled record fixtures."""
    with open(path, "rb") as fp:
        return _RefUnpickler(fp).load()
