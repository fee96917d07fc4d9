"""Baselines <-> bbox casting parity, mirroring the reference's own
test_container.py expectations (extents, fallbacks, quadrant placement per
(text_direction, topline), closed boundaries, shared-field carry-over,
deep-copy identity casts, degenerate boxes, vertical directions)."""

import pytest

from kraken_spark.kernels.containers import (baseline_to_bbox,
                                             bbox_to_baseline, seg_to_bbox,
                                             seg_to_baselines)

SHARED = dict(id="line-1", text="hello", base_dir="L", imagename="page.png",
              tags={"type": [{"tag": "default"}]}, split="train",
              regions=["r1"], language=["eng"])
SHARED_FIELDS = tuple(SHARED)


def test_boundary_extents_and_fallbacks():
    bl = dict(SHARED, type="baselines", baseline=[(20, 40), (90, 42)],
              boundary=[(10, 30), (100, 30), (100, 55), (10, 55), (10, 30)])
    assert baseline_to_bbox(bl)["bbox"] == (10, 30, 100, 55)
    # None boundary -> baseline extents
    bl2 = dict(SHARED, type="baselines",
               baseline=[(5, 8), (60, 12), (90, 7)], boundary=None)
    assert baseline_to_bbox(bl2)["bbox"] == (5, 7, 90, 12)
    # empty boundary -> baseline extents
    bl3 = dict(SHARED, type="baselines", baseline=[(5, 8), (60, 12)],
               boundary=[])
    assert baseline_to_bbox(bl3)["bbox"] == (5, 8, 60, 12)


def test_to_bbox_shared_fields_direction_and_no_mutation():
    baseline = [(0, 0), (10, 10)]
    boundary = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    bl = dict(SHARED, type="baselines", baseline=list(baseline),
              boundary=list(boundary))
    for td in ("horizontal-lr", "horizontal-rl", "vertical-lr", "vertical-rl"):
        out = baseline_to_bbox(bl, text_direction=td)
        assert out["text_direction"] == td and out["type"] == "bbox"
    out = baseline_to_bbox(bl)
    for f in SHARED_FIELDS:
        assert out[f] == bl[f]
    assert bl["baseline"] == baseline and bl["boundary"] == boundary
    # carried fields are deep copies
    out["tags"]["type"][0]["tag"] = "mut"
    assert bl["tags"]["type"][0]["tag"] == "default"


BBOX = (10, 20, 110, 70)
CLOSED = [(10, 20), (110, 20), (110, 70), (10, 70), (10, 20)]
# (text_direction, topline) -> expected baseline (reference
# test_container.py:102-118)
CASES = [
    ("horizontal-lr", False, [(10, 57), (110, 57)]),
    ("horizontal-lr", True, [(10, 32), (110, 32)]),
    ("horizontal-lr", None, [(10, 45), (110, 45)]),
    ("horizontal-rl", False, [(110, 57), (10, 57)]),
    ("horizontal-rl", True, [(110, 32), (10, 32)]),
    ("horizontal-rl", None, [(110, 45), (10, 45)]),
    ("vertical-lr", False, [(35, 20), (35, 70)]),
    ("vertical-lr", True, [(85, 20), (85, 70)]),
    ("vertical-lr", None, [(60, 20), (60, 70)]),
    ("vertical-rl", False, [(85, 20), (85, 70)]),
    ("vertical-rl", True, [(35, 20), (35, 70)]),
    ("vertical-rl", None, [(60, 20), (60, 70)]),
]


@pytest.mark.parametrize("td,topline,expected", CASES)
def test_to_baseline_placement(td, topline, expected):
    bx = dict(SHARED, type="bbox", bbox=BBOX, text_direction=td)
    out = bbox_to_baseline(bx, topline=topline)
    assert out["baseline"] == expected
    assert out["boundary"] == CLOSED
    assert out["type"] == "baselines"


def test_to_baseline_shared_degenerate_no_mutation():
    bx = dict(SHARED, type="bbox", bbox=BBOX, text_direction="horizontal-lr")
    out = bbox_to_baseline(bx)
    for f in SHARED_FIELDS:
        assert out[f] == bx[f]
    deg = bbox_to_baseline(dict(id="x", bbox=(5, 5, 5, 5),
                                text_direction="horizontal-lr"))
    assert deg["baseline"] == [(5, 5), (5, 5)]
    assert deg["boundary"] == [(5, 5)] * 5
    assert bx["bbox"] == BBOX and bx["text_direction"] == "horizontal-lr"


def _baselines_seg():
    return {
        "type": "baselines", "imagename": "page.png",
        "text_direction": "horizontal-lr", "script_detection": True,
        "lines": [
            dict(id="l1", type="baselines", baseline=[(10, 50), (100, 50)],
                 boundary=[(10, 30), (100, 30), (100, 70), (10, 70), (10, 30)],
                 text="foo"),
            dict(id="l2", type="baselines", baseline=[(10, 150), (100, 150)],
                 boundary=[(10, 130), (100, 130), (100, 170), (10, 170), (10, 130)],
                 text="bar"),
        ],
        "regions": {"text": [{"id": "r1",
                              "boundary": [(0, 0), (200, 0), (200, 200),
                                           (0, 200), (0, 0)]}]},
        "line_orders": [[0, 1]], "language": ["eng"],
    }


def _bbox_seg():
    return {
        "type": "bbox", "imagename": "page.png",
        "text_direction": "horizontal-rl", "script_detection": False,
        "lines": [
            dict(id="l1", type="bbox", bbox=(10, 30, 100, 70),
                 text_direction="horizontal-rl", text="foo"),
            dict(id="l2", type="bbox", bbox=(10, 130, 100, 170),
                 text_direction="horizontal-rl", text="bar"),
        ],
        "regions": {"text": [{"id": "r1",
                              "boundary": [(0, 0), (200, 0), (200, 200),
                                           (0, 200), (0, 0)]}]},
        "line_orders": [[0, 1]], "language": ["eng"],
    }


def test_seg_baselines_to_bbox():
    seg = _baselines_seg()
    out = seg_to_bbox(seg)
    assert out["type"] == "bbox" and len(out["lines"]) == 2
    assert all(l["text_direction"] == seg["text_direction"]
               for l in out["lines"])
    assert out["lines"][0]["bbox"] == (10, 30, 100, 70)
    assert out["lines"][1]["bbox"] == (10, 130, 100, 170)
    # passthrough fields
    for k in ("imagename", "text_direction", "script_detection",
              "line_orders", "language"):
        assert out[k] == seg[k]
    assert out["regions"]["text"][0]["id"] == "r1"


def test_seg_bbox_to_baselines_and_toplines():
    seg = _bbox_seg()
    out = seg_to_baselines(seg)
    assert out["type"] == "baselines" and len(out["lines"]) == 2
    assert all(l["boundary"][0] == l["boundary"][-1] for l in out["lines"])
    # topline=True: h=40, y = 30 + 10 = 40; rl order reversed
    assert seg_to_baselines(seg, topline=True)["lines"][0]["baseline"] == \
        [(100, 40), (10, 40)]
    assert seg_to_baselines(seg, topline=None)["lines"][0]["baseline"] == \
        [(100, 50), (10, 50)]


def test_seg_identity_casts_are_deep_copies():
    seg = _baselines_seg()
    out = seg_to_baselines(seg)
    assert out is not seg and out["lines"] is not seg["lines"]
    for a, b in zip(seg["lines"], out["lines"]):
        assert a is not b and a["baseline"] == b["baseline"]
    assert out["regions"] is not seg["regions"]
    assert out["regions"]["text"][0] is not seg["regions"]["text"][0]
    assert out["line_orders"] == seg["line_orders"]
    assert out["line_orders"] is not seg["line_orders"]
    seg2 = _bbox_seg()
    out2 = seg_to_bbox(seg2)
    assert out2 is not seg2
    for a, b in zip(seg2["lines"], out2["lines"]):
        assert a is not b and a["bbox"] == b["bbox"]


def test_seg_cross_type_independent_and_empty():
    seg = _baselines_seg()
    out = seg_to_bbox(seg)
    assert out["lines"] is not seg["lines"]
    assert out["regions"] is not seg["regions"]
    empty = {"type": "baselines", "imagename": "p", "lines": [],
             "text_direction": "horizontal-lr", "script_detection": False}
    assert seg_to_bbox(empty)["lines"] == []


def test_seg_vertical_rl():
    seg = {"type": "bbox", "imagename": "p", "text_direction": "vertical-rl",
           "script_detection": False,
           "lines": [dict(id="l1", type="bbox", bbox=(10, 20, 110, 70),
                          text_direction="vertical-rl")]}
    out = seg_to_baselines(seg, topline=False)
    assert out["lines"][0]["baseline"] == [(85, 20), (85, 70)]
