"""Serialization / XML-ingest queries for the driver contract.

Spark side of kernels/serialize.py + kernels/xmlparse.py: the extraction
DataFrame's nested line/region structs are rendered to ALTO/PageXML/hOCR
strings inside an Arrow-batched UDF (the reference's serialize() sink,
/root/reference/kraken/serialization.py:80-269), and XML pages are parsed
back into segmentation rows (the reference's XML input path,
/root/reference/kraken/kraken.py:200-207 via lib/xml). The round-trip query
re-parses our own serializer output and checks text/baseline equality —
mirroring the reference's serialize->XMLPage round-trip test
(/root/reference/tests/test_serialization.py roundtrip).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .extraction import _extraction, _ordered

_SER_DDL = "url string, fmt string, n_bytes int, document string"
_SER_ALL_DDL = "url string, fmt string, n_bytes int, xsd_valid boolean, document string"


def _serialize_map(fmt: str, subline: bool = True):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels.serialize import serialize

        for batch in batches:
            rows = batch.to_pylist()
            out = []
            for r in rows:
                doc = serialize(r, fmt, subline=subline)
                out.append(
                    {
                        "url": r["url"],
                        "fmt": fmt,
                        "n_bytes": len(doc.encode("utf-8")),
                        "document": doc,
                    }
                )
            yield pa.RecordBatch.from_pylist(
                out,
                schema=pa.schema(
                    [
                        pa.field("url", pa.string()),
                        pa.field("fmt", pa.string()),
                        pa.field("n_bytes", pa.int32()),
                        pa.field("document", pa.string()),
                    ]
                ),
            )

    return fn


def serialize_extractions(ext: DataFrame, fmt: str,
                          subline: bool = True) -> DataFrame:
    """subline=False is the reference's --no-subline-segmentation: line
    text only, no word/char geometry in the markup."""
    return ext.mapInArrow(_serialize_map(fmt, subline), schema=_SER_DDL)


def x_serialize_all(spark: SparkSession, sf: str) -> DataFrame:
    """All four markup sinks in one pass (driver-window consolidation of
    x_serialize_{alto,pagexml,hocr,abbyy}): each extraction row is rendered
    to ALTO, PageXML, hOCR and ABBYY FineReader XML inside ONE Arrow batch
    (the reference's serialize() sink over every supported template,
    /root/reference/kraken/serialization.py:80-269), emitting a (url, fmt)
    row per format. ALTO and PageXML rows carry xsd_valid: validated
    against the official schemas the reference tests with
    (tests/test_serialization.py:51-73, alto-4-3.xsd / pagecontent.xsd)
    by the pure-stdlib subset validator in kernels/xsdcheck.py (null for
    hOCR/ABBYY, which have no XSD). Byte-level golden/round-trip checks
    per format live in tests/test_serialization.py."""
    from ..refassets import resource

    fmts = ("alto", "pagexml", "hocr", "abbyyxml")
    xsd_for = {
        "alto": resource("alto-4-3.xsd"),
        "pagexml": resource("pagecontent.xsd"),
    }

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os

        from ..kernels.serialize import (row_with_polygon_sections,
                                         serialize)
        from ..kernels.xsdcheck import validate_xml

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("fmt", pa.string()),
                pa.field("n_bytes", pa.int32()),
                pa.field("xsd_valid", pa.bool_()),
                pa.field("document", pa.string()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                for fmt in fmts + ("alto_sections",):
                    # alto_sections: the same row upgraded to full
                    # polygon-section String/SP/Glyph Shape geometry
                    # (kernels/serialize.row_with_polygon_sections)
                    if fmt == "alto_sections":
                        doc = serialize(row_with_polygon_sections(r), "alto")
                        xsd = xsd_for["alto"]
                    else:
                        doc = serialize(r, fmt)
                        xsd = xsd_for.get(fmt)
                    valid = (
                        not validate_xml(doc, xsd)
                        if xsd and os.path.exists(xsd)
                        else None
                    )
                    out.append(
                        {
                            "url": r["url"],
                            "fmt": fmt,
                            "n_bytes": len(doc.encode("utf-8")),
                            "xsd_valid": valid,
                            "document": doc,
                        }
                    )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    ext = _extraction(spark, sf)
    return _ordered(ext.mapInArrow(fn, schema=_SER_ALL_DDL), "url", "fmt")


def x_roundtrip_xml(spark: SparkSession, sf: str) -> DataFrame:
    """extraction -> ALTO+PageXML serialize -> re-parse -> equality flags.

    Self-validating: text_match and baseline_match must be true for every
    (url, fmt) — the driver's rows-only check records the row count, and
    tests assert the flags (test_serialization.py roundtrip pattern)."""

    def roundtrip(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels.serialize import serialize
        from ..kernels.xmlparse import parse_segmentation

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("fmt", pa.string()),
                pa.field("n_lines", pa.int32()),
                pa.field("text_match", pa.bool_()),
                pa.field("baseline_match", pa.bool_()),
                pa.field("tags_match", pa.bool_()),
                pa.field("language_match", pa.bool_()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                for fmt in ("alto", "pagexml"):
                    doc = serialize(r, fmt)
                    seg = parse_segmentation(doc.encode("utf-8"))
                    orig_lines = r["lines"] or []
                    got_lines = seg["lines"]
                    text_match = [l["text"] for l in got_lines] == [
                        l["prediction"] for l in orig_lines
                    ]
                    bl_match = [l["baseline"] for l in got_lines] == [
                        [list(p) for p in l["baseline"]] for l in orig_lines
                    ]
                    tags_match = [l["tags"] for l in got_lines] == [
                        l["tags"] for l in orig_lines
                    ]
                    # the PAGE parser normalises languages to ISO 639-3
                    # like the reference (page.py:30-61); ALTO keeps raw
                    # codes — compare against the matching expectation
                    from ..kernels.xmlparse import iso639_3

                    norm = iso639_3 if fmt == "pagexml" else (lambda v: v)
                    lang_match = [l["language"] for l in got_lines] == [
                        [norm(v) for v in (l["language"] or [])]
                        for l in orig_lines
                    ]
                    out.append(
                        {
                            "url": r["url"],
                            "fmt": fmt,
                            "n_lines": len(got_lines),
                            "text_match": text_match,
                            "baseline_match": bl_match,
                            "tags_match": tags_match,
                            "language_match": lang_match,
                        }
                    )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    ext = _extraction(spark, sf)
    return _ordered(
        ext.mapInArrow(
            roundtrip,
            schema="url string, fmt string, n_lines int, text_match boolean, "
            "baseline_match boolean, tags_match boolean, language_match boolean",
        ),
        "url",
        "fmt",
    )


def repolygonize_xml(pages: DataFrame) -> DataFrame:
    """contrib/repolygonize.py as a Spark operator: re-parse serialized
    ALTO/PageXML, recompute every line's boundary polygon from the SOURCE
    page ink (decode -> nlbin -> polygonize_line, the role the reference
    delegates to calculate_polygonal_environment;
    /root/reference/kraken/contrib/repolygonize.py), and re-serialize in
    the same format.

    Input: (url, document string, html binary). Output: (url, fmt,
    n_lines, n_changed, document) with the repolygonized markup. Map-only
    Arrow batches — one task per page bundle, no shuffle."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import binarize, imgio, png
        from ..kernels.blla import polygonize_line
        from ..kernels.serialize import serialize
        from ..kernels.xmlparse import parse_segmentation

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("fmt", pa.string()),
                pa.field("n_lines", pa.int32()),
                pa.field("n_changed", pa.int32()),
                pa.field("document", pa.string()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                doc = r["document"]
                fmt = "alto" if "<alto" in doc[:200] else "pagexml"
                seg = parse_segmentation(doc.encode("utf-8"))
                img = png.to_grayscale(imgio.decode_image(r["html"]))
                mask = binarize.nlbin(img)
                lines, changed = [], 0
                for ln in seg["lines"]:
                    nb = polygonize_line(ln["baseline"], mask)
                    if nb is not None and nb != ln.get("boundary"):
                        changed += 1
                    boundary = nb or ln.get("boundary") or []
                    # plain (non-record) lines carry their geometry as the
                    # HPOS/VPOS bbox in ALTO — derive it from the polygon
                    xs = [p[0] for p in boundary] or [0]
                    ys = [p[1] for p in boundary] or [0]
                    lines.append(
                        {
                            "id": ln.get("id", ""),
                            "bbox": [min(xs), min(ys), max(xs), max(ys)],
                            "baseline": ln["baseline"],
                            "boundary": boundary,
                            "prediction": ln.get("text", "") or "",
                            "tags": ln.get("tags", "") or "",
                            "language": ln.get("language") or [],
                            "region_ids": ln.get("region_ids") or [],
                        }
                    )
                row = {
                    "url": r["url"],
                    "width": seg.get("width", img.shape[1]),
                    "height": seg.get("height", img.shape[0]),
                    "lines": lines,
                    "regions": seg.get("regions") or [],
                }
                doc2 = serialize(row, fmt)
                out.append(
                    {
                        "url": r["url"],
                        "fmt": fmt,
                        "n_lines": len(lines),
                        "n_changed": changed,
                        "document": doc2,
                    }
                )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    return pages.select("url", "document", "html").mapInArrow(
        fn, schema="url string, fmt string, n_lines int, n_changed int, document string"
    )


QUERIES = {
    "x_serialize_all": (x_serialize_all, None),
    "x_roundtrip_xml": (x_roundtrip_xml, None),
}


def overlay_extractions(documents: DataFrame, extractions: DataFrame,
                        kind: str = "segmentation",
                        alpha: float = 0.4) -> DataFrame:
    """Debug/QA overlay renderer — the reference's contrib visualization
    scripts as a Spark sink (contrib/segmentation_overlay.py,
    heatmap_overlay.py, forced_alignment_overlay.py via
    kernels/overlay.py): join pages with their extraction geometry and
    render one RGB PNG per url. kind: 'segmentation' (regions green,
    boundaries blue, baselines red), 'heatmap' (the blla baseline-class
    heatmap alpha-composited), 'alignment' (per-char cut spans in cycling
    colors), or 'recognition' (contrib/recognition_boxes.py: per-char
    boxes in the 7-color cycle at alpha 127, cycling across lines).
    Map-only after one url-equi join; one task per partition,
    Arrow-batched."""
    if kind not in ("segmentation", "heatmap", "alignment", "recognition"):
        raise ValueError(f"unknown overlay kind {kind!r}")
    joined = extractions.join(
        documents.select("url", "html"), "url")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import overlay, png
        from ..kernels.imgio import decode_image

        schema = pa.schema([
            pa.field("url", pa.string()), pa.field("kind", pa.string()),
            pa.field("n_bytes", pa.int32()), pa.field("png", pa.binary()),
        ])
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                try:
                    img = png.to_grayscale(decode_image(r["html"]))
                except Exception:
                    continue
                if kind == "segmentation":
                    out = overlay.overlay_segmentation(img, r, alpha=alpha)
                elif kind == "heatmap":
                    from ..kernels import binarize, blla

                    mask = binarize.nlbin(img)
                    W = blla.learned_weights()
                    if W is not None:
                        maps = blla.compute_segmentation_map_learned(mask, W)
                    else:
                        maps = blla.compute_segmentation_map(
                            mask, blla.build_segmenter_ref())
                    out = overlay.overlay_heatmap(img, maps[0], alpha=alpha)
                elif kind == "recognition":
                    out = overlay.overlay_recognition_boxes(
                        img, r.get("lines") or [])
                else:
                    out = img if img.ndim == 3 else np.repeat(
                        img[:, :, None], 3, axis=2)
                    for l in (r.get("lines") or []):
                        out = overlay.overlay_alignment(out, l, alpha=alpha)
                blob = png.encode_png(np.ascontiguousarray(out, np.uint8))
                rows.append({"url": r["url"], "kind": kind,
                             "n_bytes": len(blob), "png": blob})
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=schema)

    return joined.mapInArrow(
        gen, "url string, kind string, n_bytes int, png binary")


def spread_hocr_words(pages: DataFrame,
                      share_space: bool = True,
                      confidence: bool = False,
                      fix_big_words: bool = False,
                      strict_quirks: bool = True) -> DataFrame:
    """contrib/print_word_spreader.py as a Spark operator: normalize hOCR
    word geometry page-by-page (kernels/hocr_spread.spread_hocr — space-
    word removal with fudge-gap spreading, confidence summaries, big-box
    fixes, namespaced-XHTML output; quirk notes in the kernel docstring).

    Input: (url, document string[, width int, height int]) — width/height,
    when present, play the reference's --imageDir role for rebuilding a
    missing page bbox. Output: (url, n_space_removed, document). The
    reference walks a directory sequentially (print_word_spreader.py:262-
    299); here each page is one row in a map-only Arrow stage — no
    shuffle, one task per partition at any corpus size."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels.hocr_spread import spread_hocr

        schema = pa.schema([
            pa.field("url", pa.string()),
            pa.field("n_space_removed", pa.int32()),
            pa.field("document", pa.string()),
        ])
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                name = (r["url"] or "page").rsplit("/", 1)[-1]
                size = None
                if r.get("width") and r.get("height"):
                    size = (int(r["width"]), int(r["height"]))
                try:
                    doc, removed = spread_hocr(
                        r["document"], name, share_space=share_space,
                        confidence=confidence, fix_big_words=fix_big_words,
                        image_size=size, strict_quirks=strict_quirks,
                        return_count=True)
                except Exception:
                    # the reference prints and skips failing files
                    # (print_word_spreader.py:300-302); emit the original
                    removed, doc = -1, r["document"]
                rows.append({"url": r["url"], "n_space_removed": removed,
                             "document": doc})
            yield pa.RecordBatch.from_pylist(rows, schema=schema)

    cols = ["url", "document"] + [
        c for c in ("width", "height") if c in pages.columns]
    return pages.select(*cols).mapInArrow(
        fn, "url string, n_space_removed int, document string")
