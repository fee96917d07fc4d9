"""Line/segmentation format conversions: baselines <-> bounding boxes.

Dict-based re-expression of the reference's container casting methods
(reference: kraken/containers.py:111-149 ``BaselineLine.to_bbox``,
:169-228 ``BBoxLine.to_baseline``, :305-355 ``Segmentation.to_bbox`` /
``to_baselines``), matching its arithmetic exactly (floor-divided quadrant
insets, closed 5-point boundary, reading-direction endpoint order,
identity casts as deep copies). Lines/segmentations are plain dicts in the
engine's schema shape; behavior pinned against the reference's own
test_container.py expectations in tests/test_containers.py.
"""

from __future__ import annotations

import copy

_SHARED = ("id", "text", "base_dir", "imagename", "tags", "split",
           "regions", "language")


def _carry(line: dict) -> dict:
    return {k: copy.deepcopy(line.get(k)) for k in _SHARED}


def baseline_to_bbox(line: dict,
                     text_direction: str = "horizontal-lr") -> dict:
    """Cast a baselines line to an axis-aligned bbox line. The box is the
    min/max extent of ``boundary``, falling back to the ``baseline``
    polyline when the boundary is absent or empty."""
    pts = line.get("boundary") or line.get("baseline")
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    out = _carry(line)
    out["type"] = "bbox"
    out["bbox"] = (min(xs), min(ys), max(xs), max(ys))
    out["text_direction"] = text_direction
    return out


def bbox_to_baseline(line: dict, topline: bool | None = False) -> dict:
    """Cast a bbox line to a baselines line: boundary is the closed
    5-point rectangle; the synthesized baseline is a two-point segment
    along the reading axis, inset a quarter of the perpendicular extent
    into the quadrant selected by ``topline`` (False = standard baseline,
    True = hanging/topline, None = centerline)."""
    x0, y0, x1, y1 = line["bbox"]
    w, h = x1 - x0, y1 - y0
    td = line.get("text_direction", "horizontal-lr")
    if td.startswith("horizontal"):
        if topline is None:
            y = y0 + h // 2
        elif topline:
            y = y0 + h // 4
        else:
            y = y0 + (3 * h) // 4
        baseline = [(x0, y), (x1, y)] if td == "horizontal-lr" else [(x1, y), (x0, y)]
    else:
        if topline is None:
            x = x0 + w // 2
        elif topline:
            x = x0 + (3 * w) // 4 if td == "vertical-lr" else x0 + w // 4
        else:
            x = x0 + w // 4 if td == "vertical-lr" else x0 + (3 * w) // 4
        baseline = [(x, y0), (x, y1)]
    out = _carry(line)
    out["type"] = "baselines"
    out["baseline"] = baseline
    out["boundary"] = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    return out


def seg_to_bbox(seg: dict) -> dict:
    """Cast a segmentation dict to type 'bbox'; an already-bbox input is
    deep-copied. Lines inherit the segmentation's text_direction; all
    other fields pass through deep-copied."""
    if seg.get("type") == "bbox":
        return copy.deepcopy(seg)
    out = copy.deepcopy({k: v for k, v in seg.items() if k != "lines"})
    out["type"] = "bbox"
    out["lines"] = [baseline_to_bbox(ln, seg.get("text_direction",
                                                 "horizontal-lr"))
                    for ln in (seg.get("lines") or [])]
    return out


def seg_to_baselines(seg: dict, topline: bool | None = False) -> dict:
    """Cast a segmentation dict to type 'baselines'; an already-baselines
    input is deep-copied."""
    if seg.get("type") == "baselines":
        return copy.deepcopy(seg)
    out = copy.deepcopy({k: v for k, v in seg.items() if k != "lines"})
    out["type"] = "baselines"
    out["lines"] = [bbox_to_baseline(ln, topline=topline)
                    for ln in (seg.get("lines") or [])]
    return out
