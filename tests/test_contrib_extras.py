"""Remaining contrib analogs: the hOCR word spreader
(kernels/hocr_spread.py vs contrib/print_word_spreader.py), the
recognition character-box overlay (kernels/overlay.py vs
contrib/recognition_boxes.py), and the offline Scripts.txt -> json
generator (kernels/scripts_gen.py vs contrib/generate_scripts.py)."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from kraken_spark.kernels import hocr_spread, overlay, scripts_gen

NS = {"h": hocr_spread.XHTML_NS}


def _hocr(words, page_bbox="bbox 0 0 1000 800", line_bbox="bbox 10 10 900 60"):
    """kraken-style hOCR: word spans (optionally single-space 'words'
    between them, like the reference's hocr template emits)."""
    spans = "".join(
        f'<span class="ocrx_word" id="w{i}" title="{t}">{txt}</span>'
        for i, (txt, t) in enumerate(words)
    )
    return (
        "<html><head><meta name='ocr-system' content='kraken'/></head><body>"
        f"<div class='ocr_page' id='p0' title='{page_bbox}'>"
        f"<span class='ocr_line' title='{line_bbox}'>{spans}</span>"
        "</div></body></html>"
    )


WORDS = [
    ("foo", "bbox 10 10 100 60; x_confs 0.9 0.8 0.95"),
    (" ", "bbox 100 10 160 60"),
    ("bar", "bbox 160 10 300 60; x_confs 0.7 0.99 0.8"),
]


def _words(root):
    return [
        el for el in root.iter(f"{{{hocr_spread.XHTML_NS}}}span")
        if el.get("class") == "ocrx_word"
    ]


def test_share_space_spans_strict_quirk_removes_without_fudge():
    """Executed reference semantics (print_word_spreader.py:114 — lxml
    truthiness = has-children, text-only spans are falsy): space spans
    are removed, neighbor bboxes untouched."""
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(WORDS)))
    removed = hocr_spread.share_space_spans(root, strict_quirks=True)
    assert removed == 1
    words = _words(root)
    assert [w.text for w in words] == ["foo", "bar"]
    assert hocr_spread.get_bbox_val(words[0], 2) == 100  # unchanged
    assert hocr_spread.get_bbox_val(words[1], 0) == 160  # unchanged


def test_share_space_spans_intent_mode_spreads_with_fudge():
    """Documented-intent mode: prev right edge += min(gap/3, 5), next
    left edge -= min(gap/3, 7) (print_word_spreader.py:96-130). Gap here
    is 160-100=60, third=20 -> fudges capped at 5 and 7."""
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(WORDS)))
    hocr_spread.share_space_spans(root, strict_quirks=False)
    words = _words(root)
    assert hocr_spread.get_bbox_val(words[0], 2) == 105
    assert hocr_spread.get_bbox_val(words[1], 0) == 153


def test_share_space_spans_small_gap_uses_third():
    # gap 6 -> third=2 -> both fudges 2
    words = [
        ("a", "bbox 0 0 50 20"),
        (" ", "bbox 50 0 56 20"),
        ("b", "bbox 56 0 90 20"),
    ]
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(words)))
    hocr_spread.share_space_spans(root, strict_quirks=False)
    got = _words(root)
    assert hocr_spread.get_bbox_val(got[0], 2) == 52
    assert hocr_spread.get_bbox_val(got[1], 0) == 54


def test_confidence_summary_attributes_and_title_cut():
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(WORDS)))
    hocr_spread.confidence_summary(root)
    words = _words(root)
    w0 = words[0]
    assert w0.get("data-min-confidence") == "0.8"
    assert w0.get("data-average-confidence") == str(round((0.9 + 0.8 + 0.95) / 3, 2))
    assert w0.get("title") == "bbox 10 10 100 60"
    # the space span has no x_confs tail: left untouched (bare-except path)
    assert words[1].get("title") == "bbox 100 10 160 60"


def test_fix_word_span_area_strict_quirk_takes_parent_title():
    """area > page_area/6 with text-only siblings: the lxml truthiness
    quirk makes both neighbor branches falsy, so the PARENT (line) title
    wins (print_word_spreader.py:190-195)."""
    words = [
        ("huge", "bbox 0 0 900 700; x_confs 0.5"),
        ("ok", "bbox 0 0 10 10"),
    ]
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(words)))
    fixed = hocr_spread.fix_word_span_area(root, strict_quirks=True)
    assert fixed == 1
    assert _words(root)[0].get("title") == "bbox 10 10 900 60"  # line bbox


def test_fix_word_span_area_intent_mode_takes_next_title():
    words = [
        ("huge", "bbox 0 0 900 700; x_confs 0.5"),
        ("ok", "bbox 0 0 10 10"),
    ]
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(words)))
    hocr_spread.fix_word_span_area(root, strict_quirks=False)
    assert _words(root)[0].get("title") == "bbox 0 0 10 10"


def test_page_title_clean_and_rewrite():
    root = hocr_spread._to_xhtml(ET.fromstring(_hocr(WORDS)))
    hocr_spread.clean_ocr_page_title(root, "scan_0042.html")
    page = next(
        el for el in root.iter(f"{{{hocr_spread.XHTML_NS}}}div")
        if el.get("class") == "ocr_page"
    )
    assert page.get("title") == "image scan_0042.png; bbox 0 0 1000 800"
    hocr_spread.rewrite_ocr_page_title(root, "scan_0042.html", 640, 480)
    assert page.get("title") == "bbox 0 0 640 480;image scan_0042.png"


def test_spread_hocr_driver_with_missing_page_bbox_falls_back():
    """fix_big_words on a page without a bbox raises BboxError; with an
    image_size the title is rebuilt and the fix retried
    (print_word_spreader.py:272-292)."""
    doc = _hocr(WORDS, page_bbox="rot 0")
    with pytest.raises(hocr_spread.BboxError):
        hocr_spread.spread_hocr(doc, "f.html", fix_big_words=True)
    out = hocr_spread.spread_hocr(
        doc, "f.html", fix_big_words=True, image_size=(1000, 800)
    )
    # output is namespaced XHTML, space span gone, page title cleaned
    root = ET.fromstring(out)
    assert root.tag == f"{{{hocr_spread.XHTML_NS}}}html"
    texts = [w.text for w in _words(root)]
    assert " " not in texts
    page = next(
        el for el in root.iter(f"{{{hocr_spread.XHTML_NS}}}div")
        if el.get("class") == "ocr_page"
    )
    assert page.get("title").startswith("image f.png; bbox 0 0 1000 800")


def test_spread_hocr_own_serializer_output_parses():
    """Our to_hocr sink output goes through the spreader unchanged in
    text (we emit no space-words, so only the page-title cleanup and
    namespacing apply)."""
    from kraken_spark.kernels.serialize import to_hocr

    row = {
        "url": "http://x/p1", "width": 200, "height": 100,
        "lines": [{
            "id": "l0", "rank": 0, "bbox": [5, 5, 150, 30],
            "baseline": [[5, 25], [150, 25]],
            "boundary": [[5, 5], [150, 5], [150, 30], [5, 30]],
            "region_ids": [], "prediction": "ab cd",
            "cuts": [[5, 10], [12, 20], [30, 40], [42, 55], [60, 70]],
            "confidences": [0.9, 0.8, 0.7, 0.6, 0.5],
            "display_order": False,
        }],
        "regions": [],
    }
    out = hocr_spread.spread_hocr(to_hocr(row), "p1.html")
    root = ET.fromstring(out)
    words = _words(root)
    assert [w.text for w in words] == ["ab", "cd"]


def test_spread_hocr_words_spark_face():
    from kraken_spark.operators.serialization import spread_hocr_words
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-hocr-spread", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [("http://x/a.html", _hocr(WORDS)), ("http://x/b.html", "<notxml")],
        "url string, document string",
    )
    rows = {r.url: r for r in spread_hocr_words(df).collect()}
    assert rows["http://x/a.html"].n_space_removed == 1
    assert "ocr_page" in rows["http://x/a.html"].document
    # unparseable page: emitted unchanged, flagged -1 (reference prints
    # the exception and moves on)
    assert rows["http://x/b.html"].n_space_removed == -1
    assert rows["http://x/b.html"].document == "<notxml"


# -- recognition boxes ------------------------------------------------------

def test_overlay_recognition_boxes_cycles_across_lines():
    img = np.full((40, 100), 255, dtype=np.uint8)
    lines = [
        {"bbox": [0, 0, 50, 10], "cuts": [[2, 6], [10, 14]]},
        {"bbox": [0, 20, 50, 30], "cuts": [[2, 6]]},
    ]
    out = overlay.overlay_recognition_boxes(img, lines)
    assert out.shape == (40, 100, 3) and out.dtype == np.uint8
    # alpha-127 src-over of color c over white: 255 + (c-255)*127/255
    def expected(c):
        return tuple(round(255 + (v - 255) * (127 / 255)) for v in c)

    assert tuple(out[5, 4]) == expected(overlay.RECOGNITION_CMAP[0])
    assert tuple(out[5, 12]) == expected(overlay.RECOGNITION_CMAP[1])
    # third box continues the global cycle (reference's cycle() iterator
    # spans lines), not restarting at color 0
    assert tuple(out[25, 4]) == expected(overlay.RECOGNITION_CMAP[2])
    # untouched pixel stays white
    assert (out[39, 99] == 255).all()


# -- scripts generator ------------------------------------------------------

SCRIPTS_TXT = """\
# Scripts-16.0.0.txt
# Date: 2024
0000..001F    ; Common # Cc  [32] <control-0000>..<control-001F>
0020          ; Common # Zs       SPACE
0041..005A    ; Latin # L&  [26] LATIN CAPITAL LETTER A..Z
005B          ; Latin # Sm
0061          ; Latin # L&
0062          ; Latin # L&
0391..03A1    ; Greek # L&
"""


def test_parse_scripts_merging_and_none_end():
    d = scripts_gen.parse_scripts_txt(SCRIPTS_TXT)
    # 0020 merges into 0000..001F; 005B into 0041..005A; 0061 stands
    # alone (end=None), then 0062 merges via the prev-START branch of the
    # reference's condition (generate_scripts.py:28-32)
    assert d == [
        (0x0000, 0x0020, "Common"),
        (0x0041, 0x005B, "Latin"),
        (0x0061, 0x0062, "Latin"),
        (0x0391, 0x03A1, "Greek"),
    ]


def test_scripts_json_and_file_driver(tmp_path):
    src = tmp_path / "Scripts.txt"
    src.write_text(SCRIPTS_TXT)
    out = tmp_path / "scripts.json"
    n = scripts_gen.generate_scripts(str(src), str(out))
    assert n == 4
    data = json.loads(out.read_text())
    assert data[0] == [0, 0x20, "Common"]
    assert json.loads(scripts_gen.scripts_json(SCRIPTS_TXT)) == data


def test_script_of_lookup():
    table = scripts_gen.parse_scripts_txt(SCRIPTS_TXT)
    assert scripts_gen.script_of(ord("A"), table) == "Latin"
    assert scripts_gen.script_of(0x3A0, table) == "Greek"
    assert scripts_gen.script_of(0x2000, table) is None
    # single-point entry (end=None) matches exactly its own code point
    assert scripts_gen.script_of(
        0x61, [(0x61, None, "Latin")]) == "Latin"
    assert scripts_gen.script_of(
        0x62, [(0x61, None, "Latin")]) is None


def test_spread_hocr_removes_our_own_record_derived_space_words():
    """Our record-derived hOCR emits whitespace segments as ocrx_word
    spans exactly like the reference's template (segments_for_record
    keeps words AND whitespace runs) — the spreader's share_space_spans
    has real work on OUR output, not just on kraken's."""
    from kraken_spark.kernels.serialize import to_hocr

    row = {
        "url": "http://x/r1", "width": 300, "height": 100,
        "lines": [{
            "id": "l0", "rank": 0, "bbox": [0, 0, 200, 30],
            "baseline": [[0, 25], [200, 25]],
            "boundary": [[0, 0], [200, 0], [200, 30], [0, 30]],
            "region_ids": [], "prediction": "ab cd",
            "cuts": [[[0, 0], [10, 0], [10, 30], [0, 30]]] * 5,
            "confidences": [0.9] * 5,
            "display_order": False,
            "segments": [
                {"text": "ab", "is_space": False, "index": 0,
                 "bbox": [0, 0, 40, 30], "confidences": [0.9, 0.9]},
                {"text": " ", "is_space": True, "index": 1,
                 "bbox": [40, 0, 60, 30], "confidences": [0.9]},
                {"text": "cd", "is_space": False, "index": 2,
                 "bbox": [60, 0, 100, 30], "confidences": [0.9, 0.9]},
            ],
        }],
        "regions": [],
    }
    doc = to_hocr(row)
    assert "> </span>" in doc or '> </span>' in doc  # space word present
    out = hocr_spread.spread_hocr(doc, "r1.html", strict_quirks=False)
    root = ET.fromstring(out)
    words = _words(root)
    assert [w.text for w in words] == ["ab", "cd"]
    # gap 60-40=20 -> third=6 -> fudges capped at 5 (left) and 6 (right)
    assert hocr_spread.get_bbox_val(words[0], 2) == 45
    assert hocr_spread.get_bbox_val(words[1], 0) == 54
