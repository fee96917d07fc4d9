"""Serialization sinks: extraction rows -> ALTO 4 / PageXML / hOCR /
abbyyXML / JSON.

Re-expresses the reference's Jinja2 template serializer
(/root/reference/kraken/serialization.py:80-269 and
/root/reference/kraken/templates/{alto,pagexml,hocr,abbyyxml}) as pure string
builders over the engine's extraction row dicts. Determinism fixes vs the
reference (SURVEY.md §7.5): element ids are already deterministic
(pageseg.det_id replaces uuid4, cf. /root/reference/kraken/blla.py:362) and
the processing timestamp is pinned via the `created` parameter instead of
datetime.now() (/root/reference/kraken/serialization.py:124).

Word geometry follows the reference's whitespace-split word segmentation
(/root/reference/kraken/serialization.py:205): a word's extent is the union
of its member character cuts; WC/GC confidences are means over member
characters (cf. templates/alto String/Glyph WC/GC attributes).
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

PINNED_CREATED = "2026-01-01T00:00:00"


def _row_get(row, key, default=None):
    v = row.get(key) if isinstance(row, dict) else getattr(row, key, None)
    return default if v is None else v


def _line_fields(line: dict) -> dict:
    bbox = list(_row_get(line, "bbox", [0, 0, 0, 0]))
    cuts = [list(c) for c in _row_get(line, "cuts", [])]
    confs = list(_row_get(line, "confidences", []))
    return {
        "id": _row_get(line, "id", ""),
        "bbox": bbox,
        "baseline": [list(p) for p in _row_get(line, "baseline", [])],
        "boundary": [list(p) for p in _row_get(line, "boundary", [])],
        "prediction": _row_get(line, "prediction", "") or "",
        "cuts": cuts,
        "confidences": confs,
        "region_ids": list(_row_get(line, "region_ids", [])),
        "tags": _row_get(line, "tags", "") or "",
        "language": list(_row_get(line, "language", []) or []),
        # present only on record-derived lines (line_dict_from_record):
        # precomputed sub-line segments with polygon geometry
        "segments": _row_get(line, "segments", None),
    }


def _max_bbox(polys) -> list[int]:
    """Minimal box over an iterable of point polygons
    (reference serialization.py:60-78, max_bbox)."""
    xs = [p[0] for poly in polys for p in poly]
    ys = [p[1] for poly in polys for p in poly]
    return [int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))]


def segments_for_record(rec, seg_idx0: int = 0, char_idx0: int = 0):
    """Whitespace-split sub-line segments with full polygon geometry from a
    per-code-point OCR record (reference serialization.py:203-236): each
    segment (words AND whitespace runs) carries the union bbox of its
    member character cuts, the per-character glyph boxes/polygons with
    confidences, and — for baseline records — the aggregated
    polygon-section boundary from record slicing."""
    import re as _re

    segs = []
    cuts = list(rec.cuts)
    seg_idx, char_idx, off = seg_idx0, char_idx0, 0
    for piece in _re.split(r"(\s+)", rec.prediction):
        if not piece:
            continue
        lo, hi = off, off + len(piece)
        seg_cuts = cuts[lo:hi]
        # records with fewer cuts/confidences than code points (no length
        # validation upstream, matching the reference containers) degrade
        # to a zero box instead of crashing the serialization batch
        seg = {
            "text": piece,
            "is_space": piece.isspace(),
            "index": seg_idx,
            "bbox": _max_bbox(seg_cuts) if seg_cuts else [0, 0, 0, 0],
            "confidences": list(rec.confidences[lo:hi]),
            "glyphs": [
                {"text": ch, "bbox": _max_bbox([cut]),
                 "boundary": [list(p) for p in cut],
                 "confidence": conf, "index": cid}
                for ch, cut, conf, cid in zip(
                    piece, seg_cuts, rec.confidences[lo:hi],
                    range(char_idx, char_idx + len(piece)))
            ],
        }
        if rec.kind == "baselines" and seg_cuts:
            seg["boundary"] = [list(p) for p in rec[lo:hi][1]]
        segs.append(seg)
        seg_idx += 1
        char_idx += len(piece)
        off = hi
    return segs, seg_idx, char_idx


def line_dict_from_record(rec, seg_idx0: int = 0, char_idx0: int = 0):
    """Serializer line dict from a records.BaselineOCRRecord /
    BBoxOCRRecord, with the reference's sub-line segmentation precomputed
    under the ``segments`` key (reference serialization.py:176-236). Also
    returns the advanced (seg_idx, char_idx) counters so IDs stay unique
    page-wide."""
    if rec.kind == "baselines":
        boundary = [list(p) for p in rec.boundary]
        bbox = _max_bbox([boundary])
        baseline = [list(p) for p in rec.baseline]
    else:
        x0, y0, x1, y1 = rec.bbox
        bbox = [int(x0), int(y0), int(x1), int(y1)]
        boundary = [[bbox[0], bbox[1]], [bbox[2], bbox[1]],
                    [bbox[2], bbox[3]], [bbox[0], bbox[3]]]
        baseline = []
    segments, seg_idx, char_idx = segments_for_record(rec, seg_idx0, char_idx0)
    return {
        "id": getattr(rec, "id", "") or "",
        "bbox": bbox,
        "baseline": baseline,
        "boundary": boundary,
        "prediction": rec.prediction,
        "cuts": [[list(p) for p in c] for c in rec.cuts],
        "confidences": list(rec.confidences),
        "region_ids": list(getattr(rec, "regions", []) or []),
        "tags": "",
        "language": [],
        "segments": segments,
    }, seg_idx, char_idx


def _type_of_tags(tags_json: str, default: str = "default") -> str:
    """Primary type label from the JSON-encoded tags column
    (containers.py:88 shape)."""
    import json as _json

    try:
        tags = _json.loads(tags_json) if tags_json else {}
        return (tags.get("type") or [{}])[0].get("type", default) or default
    except (ValueError, AttributeError, IndexError):
        return default


def words_of(line: dict) -> list[dict]:
    """Whitespace word split with per-word geometry from character cuts
    (the reference's word segmentation, serialization.py:205)."""
    f = _line_fields(line) if "prediction" not in line else line
    text = f["prediction"]
    cuts, confs, bbox = f["cuts"], f["confidences"], f["bbox"]
    words = []
    i = 0
    n = len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace():
            j += 1
        have_geom = len(cuts) >= j and len(confs) >= j
        if have_geom:
            x0 = min(c[0] for c in cuts[i:j])
            x1 = max(c[1] for c in cuts[i:j])
            wc = sum(confs[i:j]) / (j - i)
        else:
            x0, x1, wc = bbox[0], bbox[2], 0.0
        words.append(
            {
                "text": text[i:j],
                "bbox": [int(x0), bbox[1], int(x1), bbox[3]],
                "conf": float(wc),
                "start": i,
                "end": j,
            }
        )
        i = j
    return words


def _points(pts: list[list[int]]) -> str:
    return " ".join(f"{int(x)},{int(y)}" for x, y in pts)


def _wh(bbox: list[int]) -> tuple[int, int, int, int]:
    x0, y0, x1, y1 = (int(v) for v in bbox)
    return x0, y0, max(x1 - x0, 0), max(y1 - y0, 0)


def _group_lines_by_region(row) -> list[tuple[dict | None, list[dict]]]:
    """Regions in rank order, each with its member lines in reading order;
    lines without a region go to a trailing None group (the reference's
    free-line splice, /root/reference/kraken/serialization.py:148-173)."""
    regions = [dict(
        id=_row_get(r, "id", ""),
        region_type=_row_get(r, "region_type", "text"),
        boundary=[list(p) for p in _row_get(r, "boundary", [])],
        rank=int(_row_get(r, "rank", 0)),
        tags=_row_get(r, "tags", "") or "",
        language=list(_row_get(r, "language", []) or []),
    ) for r in (_row_get(row, "regions", []) or [])]
    regions.sort(key=lambda r: r["rank"])
    lines = [_line_fields(l) for l in (_row_get(row, "lines", []) or [])]
    by_region: dict[str, list[dict]] = {r["id"]: [] for r in regions}
    free: list[dict] = []
    for l in lines:
        rid = l["region_ids"][0] if l["region_ids"] else None
        if rid in by_region:
            by_region[rid].append(l)
        else:
            free.append(l)
    out: list[tuple[dict | None, list[dict]]] = [(r, by_region[r["id"]]) for r in regions]
    if free:
        out.append((None, free))
    return out


def to_alto(row, created: str = PINNED_CREATED, subline: bool = True) -> str:
    """ALTO 4.2 document (cf. /root/reference/kraken/templates/alto).

    subline=False is the reference's --no-subline-segmentation: each
    TextLine keeps its Shape but carries ONE bare <String CONTENT=.../>
    with the whole line text — no word/glyph geometry (template line 17;
    we quoteattr the content where the template leaves it unescaped, to
    keep the XSD-validity invariant)."""
    url = _row_get(row, "url", "")
    w, h = int(_row_get(row, "width", 0)), int(_row_get(row, "height", 0))
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v4#" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://www.loc.gov/standards/alto/ns-v4# '
        'http://www.loc.gov/standards/alto/v4/alto-4-3.xsd">\n'
        "\t<Description>\n\t\t<MeasurementUnit>pixel</MeasurementUnit>\n"
        "\t\t<sourceImageInformation>\n"
        f"\t\t\t<fileName>{escape(url)}</fileName>\n"
        "\t\t</sourceImageInformation>\n"
        '\t\t<Processing ID="OCR_1">\n'
        f"\t\t\t<processingDateTime>{escape(created)}</processingDateTime>\n"
        "\t\t\t<processingSoftware>\n"
        "\t\t\t\t<softwareName>kraken_spark</softwareName>\n"
        "\t\t\t</processingSoftware>\n"
        "\t\t</Processing>\n"
        "\t</Description>\n"
    ]
    # Tags block: one OtherTag per distinct line/region type label, referenced
    # by TAGREFS (the ALTO tag model the parser reads back, alto.py:133-170)
    groups = _group_lines_by_region(row)
    labels: list[str] = []
    for region, lines in groups:
        for lab in [_type_of_tags(region["tags"], region["region_type"])] if region else []:
            if lab not in labels:
                labels.append(lab)
        for l in lines:
            lab = _type_of_tags(l["tags"])
            if lab not in labels:
                labels.append(lab)
    tag_ids = {lab: f"TAG_{k}" for k, lab in enumerate(labels)}
    if tag_ids:
        parts.append("\t<Tags>\n")
        for lab, tid in tag_ids.items():
            parts.append(f'\t\t<OtherTag ID={quoteattr(tid)} TYPE="type" LABEL={quoteattr(lab)}/>\n')
        parts.append("\t</Tags>\n")
    parts += [
        "\t<Layout>\n"
        f'\t\t<Page WIDTH="{w}" HEIGHT="{h}" PHYSICAL_IMG_NR="0" ID="page_0">\n'
        "\t\t\t<PrintSpace "
        f'HPOS="0" VPOS="0" WIDTH="{w}" HEIGHT="{h}">\n'
    ]
    for region, lines in _group_lines_by_region(row):
        rid = region["id"] if region else "region_free"
        if region and region["boundary"]:
            rx, ry, rw, rh = _wh(
                [
                    min(p[0] for p in region["boundary"]),
                    min(p[1] for p in region["boundary"]),
                    max(p[0] for p in region["boundary"]),
                    max(p[1] for p in region["boundary"]),
                ]
            )
        else:
            rx = ry = 0
            rw, rh = w, h
        reg_attrs = ""
        if region:
            rlab = _type_of_tags(region["tags"], region["region_type"])
            reg_attrs = f" TAGREFS={quoteattr(tag_ids[rlab])}"
            if region["language"]:
                reg_attrs += f" LANG={quoteattr(region['language'][0])}"
        parts.append(
            f'\t\t\t\t<TextBlock ID={quoteattr(rid)} HPOS="{rx}" VPOS="{ry}" '
            f'WIDTH="{rw}" HEIGHT="{rh}"{reg_attrs}>\n'
        )
        for l in lines:
            x, y, lw, lh = _wh(l["bbox"])
            bl = " ".join(f"{int(px)},{int(py)}" for px, py in l["baseline"])
            line_attrs = f" TAGREFS={quoteattr(tag_ids[_type_of_tags(l['tags'])])}"
            if l["language"]:
                line_attrs += f" LANG={quoteattr(l['language'][0])}"
            parts.append(
                f'\t\t\t\t\t<TextLine ID={quoteattr(l["id"])} HPOS="{x}" VPOS="{y}" '
                f'WIDTH="{lw}" HEIGHT="{lh}" BASELINE={quoteattr(bl)}{line_attrs}>\n'
            )
            if not subline:
                if l.get("boundary"):
                    parts.append(
                        "\t\t\t\t\t\t<Shape>\n"
                        f'\t\t\t\t\t\t\t<Polygon POINTS={quoteattr(_points(l["boundary"]))}/>\n'
                        "\t\t\t\t\t\t</Shape>\n"
                    )
                parts.append(
                    f'\t\t\t\t\t\t<String CONTENT={quoteattr(l.get("prediction", ""))}/>\n'
                    "\t\t\t\t\t</TextLine>\n"
                )
                continue
            if l.get("segments") is not None:
                # record-derived path: reference-template semantics
                # (templates/alto render_line) — line Shape, SP elements
                # for interior whitespace runs with their own cut-derived
                # geometry, String WC + Shape polygon section, Glyph GC +
                # per-char Shape
                if l["boundary"]:
                    parts.append(
                        "\t\t\t\t\t\t<Shape>\n"
                        f'\t\t\t\t\t\t\t<Polygon POINTS={quoteattr(_points(l["boundary"]))}/>\n'
                        "\t\t\t\t\t\t</Shape>\n"
                    )
                for si, seg in enumerate(l["segments"]):
                    sx, sy, sw, sh = _wh(seg["bbox"])
                    if seg["is_space"] and si > 0:
                        parts.append(
                            f'\t\t\t\t\t\t<SP ID="segment_{seg["index"]}" HPOS="{sx}" '
                            f'VPOS="{sy}" WIDTH="{sw}" HEIGHT="{sh}"/>\n'
                        )
                        continue
                    wc = (round(sum(seg["confidences"])
                                / len(seg["confidences"]), 4)
                          if seg["confidences"] else 0.0)
                    parts.append(
                        f'\t\t\t\t\t\t<String ID="segment_{seg["index"]}" '
                        f'CONTENT={quoteattr(seg["text"])} HPOS="{sx}" VPOS="{sy}" '
                        f'WIDTH="{sw}" HEIGHT="{sh}" WC="{wc}">\n'
                    )
                    if seg.get("boundary"):
                        parts.append(
                            "\t\t\t\t\t\t\t<Shape>\n"
                            f'\t\t\t\t\t\t\t\t<Polygon POINTS={quoteattr(_points(seg["boundary"]))}/>\n'
                            "\t\t\t\t\t\t\t</Shape>\n"
                        )
                    for g in seg["glyphs"]:
                        gx, gy, gw, gh = _wh(g["bbox"])
                        parts.append(
                            f'\t\t\t\t\t\t\t<Glyph ID="char_{g["index"]}" '
                            f'CONTENT={quoteattr(g["text"])} HPOS="{gx}" VPOS="{gy}" '
                            f'WIDTH="{gw}" HEIGHT="{gh}" GC="{round(g["confidence"], 4)}">\n'
                            "\t\t\t\t\t\t\t\t<Shape>\n"
                            f'\t\t\t\t\t\t\t\t\t<Polygon POINTS={quoteattr(_points(g["boundary"]))}/>\n'
                            "\t\t\t\t\t\t\t\t</Shape>\n"
                            "\t\t\t\t\t\t\t</Glyph>\n"
                        )
                    parts.append("\t\t\t\t\t\t</String>\n")
                parts.append("\t\t\t\t\t</TextLine>\n")
                continue
            ws = words_of(l)
            have_glyphs = len(l["cuts"]) >= len(l["prediction"]) and len(
                l["confidences"]
            ) >= len(l["prediction"])
            for k, wd in enumerate(ws):
                wx, wy, ww, wh2 = _wh(wd["bbox"])
                parts.append(
                    f'\t\t\t\t\t\t<String CONTENT={quoteattr(wd["text"])} '
                    f'HPOS="{wx}" VPOS="{wy}" WIDTH="{ww}" HEIGHT="{wh2}" '
                    f'WC="{wd["conf"]:.4f}"'
                )
                if have_glyphs:
                    parts.append(">\n")
                    # per-codepoint Glyph children with GC confidences
                    # (templates/alto Glyph elements; cuts give the x-span)
                    for ci in range(wd["start"], wd["end"]):
                        gx0, gx1 = l["cuts"][ci]
                        parts.append(
                            f'\t\t\t\t\t\t\t<Glyph CONTENT={quoteattr(l["prediction"][ci])} '
                            f'HPOS="{int(gx0)}" VPOS="{wy}" WIDTH="{int(gx1 - gx0)}" '
                            f'HEIGHT="{wh2}" GC="{l["confidences"][ci]:.4f}"/>\n'
                        )
                    parts.append("\t\t\t\t\t\t</String>\n")
                else:
                    parts.append("/>\n")
                if k < len(ws) - 1:
                    gap_x = wx + ww
                    parts.append(f'\t\t\t\t\t\t<SP HPOS="{gap_x}" VPOS="{wy}"/>\n')
            parts.append("\t\t\t\t\t</TextLine>\n")
        parts.append("\t\t\t\t</TextBlock>\n")
    parts.append("\t\t\t</PrintSpace>\n\t\t</Page>\n\t</Layout>\n</alto>\n")
    return "".join(parts)


def to_pagexml(row, created: str = PINNED_CREATED, subline: bool = True) -> str:
    """PageXML 2019-07-15 document (cf. /root/reference/kraken/templates/pagexml).

    subline=True emits the reference template's Word/Glyph nesting for
    record-derived lines (templates/pagexml:26-42: Word Coords from the
    segment boundary else the bbox rectangle in the template's corner
    order, Glyph Coords + per-char TextEquiv conf, word TextEquiv with the
    mean segment confidence) followed by the line-level TextEquiv;
    subline=False (the --no-subline-segmentation flag) emits the
    line-level TextEquiv only."""
    url = _row_get(row, "url", "")
    w, h = int(_row_get(row, "width", 0)), int(_row_get(row, "height", 0))
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15 '
        'http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15/pagecontent.xsd">\n'
        "\t<Metadata>\n\t\t<Creator>kraken_spark</Creator>\n"
        f"\t\t<Created>{escape(created)}</Created>\n"
        f"\t\t<LastChange>{escape(created)}</LastChange>\n\t</Metadata>\n"
        f"\t<Page imageFilename={quoteattr(url)} imageWidth=\"{w}\" imageHeight=\"{h}\">\n"
    ]
    groups = _group_lines_by_region(row)
    ordered_rids = [r["id"] for r, _ in groups if r is not None]
    if ordered_rids:
        # explicit region reading order (PageXML ReadingOrder element; the
        # parser expands it back to line_orders)
        parts.append('\t\t<ReadingOrder>\n\t\t\t<OrderedGroup id="ro_0" caption="Region reading order">\n')
        for k, rid in enumerate(ordered_rids):
            parts.append(
                f'\t\t\t\t<RegionRefIndexed index="{k}" regionRef={quoteattr(rid)}/>\n'
            )
        parts.append("\t\t\t</OrderedGroup>\n\t\t</ReadingOrder>\n")
    for region, lines in groups:
        rid = region["id"] if region else "region_free"
        boundary = (
            region["boundary"]
            if region and region["boundary"]
            else [[0, 0], [w, 0], [w, h], [0, h]]
        )
        rtype = region["region_type"] if region else "text"
        # language goes into the Transkribus custom string like the
        # reference's pagexml template (templates/pagexml:3): the PAGE
        # XSD's primaryLanguage is an ENUM of full language names
        # ("English"), so ISO codes there are schema-invalid
        rcustom = "structure {type:" + rtype + ";}"
        if region and region["language"]:
            rcustom += " language {type:" + region["language"][0] + ";}"
        parts.append(
            f"\t\t<TextRegion id={quoteattr(rid)} custom={quoteattr(rcustom)}>\n"
            f"\t\t\t<Coords points={quoteattr(_points(boundary))}/>\n"
        )
        for l in lines:
            boundary_pts = l["boundary"] or [
                [l["bbox"][0], l["bbox"][1]],
                [l["bbox"][2], l["bbox"][1]],
                [l["bbox"][2], l["bbox"][3]],
                [l["bbox"][0], l["bbox"][3]],
            ]
            mean_conf = (
                sum(l["confidences"]) / len(l["confidences"]) if l["confidences"] else 0.0
            )
            ltype = _type_of_tags(l["tags"])
            lcustom = "structure {type:" + ltype + ";}"
            if l["language"]:
                lcustom += " language {type:" + l["language"][0] + ";}"
            lattrs = f" custom={quoteattr(lcustom)}"
            parts.append(
                f"\t\t\t<TextLine id={quoteattr(l['id'])}{lattrs}>\n"
                f"\t\t\t\t<Coords points={quoteattr(_points(boundary_pts))}/>\n"
                f"\t\t\t\t<Baseline points={quoteattr(_points(l['baseline']))}/>\n"
            )
            if subline and l.get("segments") is not None:
                for seg in l["segments"]:
                    if seg["is_space"]:
                        continue
                    if seg.get("boundary"):
                        wpts = _points(seg["boundary"])
                    else:
                        bx0, by0, bx1, by1 = seg["bbox"]
                        wpts = (f"{bx0},{by0} {bx0},{by1} "
                                f"{bx1},{by1} {bx1},{by0}")
                    wc = (sum(seg["confidences"]) / len(seg["confidences"])
                          if seg["confidences"] else 0.0)
                    parts.append(
                        f'\t\t\t\t<Word id="segment_{seg["index"]}">\n'
                        f"\t\t\t\t\t<Coords points={quoteattr(wpts)}/>\n"
                    )
                    for g in seg["glyphs"]:
                        parts.append(
                            f'\t\t\t\t\t<Glyph id="char_{g["index"]}">\n'
                            f"\t\t\t\t\t\t<Coords points="
                            f"{quoteattr(_points(g['boundary']))}/>\n"
                            f'\t\t\t\t\t\t<TextEquiv conf="{round(g["confidence"], 4)}">'
                            f"<Unicode>{escape(g['text'])}</Unicode></TextEquiv>\n"
                            "\t\t\t\t\t</Glyph>\n"
                        )
                    parts.append(
                        f'\t\t\t\t\t<TextEquiv conf="{round(wc, 4)}">'
                        f"<Unicode>{escape(seg['text'])}</Unicode></TextEquiv>\n"
                        "\t\t\t\t</Word>\n"
                    )
            parts.append(
                f'\t\t\t\t<TextEquiv conf="{mean_conf:.4f}">'
                f"<Unicode>{escape(l['prediction'])}</Unicode></TextEquiv>\n"
                "\t\t\t</TextLine>\n"
            )
        region_text = "\n".join(l["prediction"] for l in lines)
        parts.append(
            f"\t\t\t<TextEquiv><Unicode>{escape(region_text)}</Unicode></TextEquiv>\n"
            "\t\t</TextRegion>\n"
        )
    parts.append("\t</Page>\n</PcGts>\n")
    return "".join(parts)


def to_hocr(row, created: str = PINNED_CREATED, subline: bool = True) -> str:
    """hOCR 1.1 document (cf. /root/reference/kraken/templates/hocr)."""
    url = _row_get(row, "url", "")
    w, h = int(_row_get(row, "width", 0)), int(_row_get(row, "height", 0))
    parts = [
        "<!DOCTYPE html>\n"
        '<html xmlns="http://www.w3.org/1999/xhtml">\n<head>\n'
        '\t<meta charset="utf-8"/>\n'
        f"\t<title>{escape(url)}</title>\n"
        '\t<meta name="ocr-system" content="kraken_spark"/>\n'
        '\t<meta name="ocr-capabilities" content="ocr_page ocr_carea ocr_line ocrx_word"/>\n'
        "</head>\n<body>\n"
        f"\t<div class=\"ocr_page\" id=\"page_0\" "
        f"title={quoteattr(f'bbox 0 0 {w} {h}; image {url}')}>\n"
    ]
    for region, lines in _group_lines_by_region(row):
        rid = region["id"] if region else "region_free"
        if region and region["boundary"]:
            bx0 = min(p[0] for p in region["boundary"])
            by0 = min(p[1] for p in region["boundary"])
            bx1 = max(p[0] for p in region["boundary"])
            by1 = max(p[1] for p in region["boundary"])
        else:
            bx0 = by0 = 0
            bx1, by1 = w, h
        parts.append(
            f"\t\t<div class=\"ocr_carea\" id={quoteattr(rid)} "
            f"title={quoteattr(f'bbox {bx0} {by0} {bx1} {by1}')}>\n"
        )
        for l in lines:
            x0, y0, x1, y1 = (int(v) for v in l["bbox"])
            bl = "; baseline " + " ".join(
                f"{int(px)},{int(py)}" for px, py in l["baseline"]
            ) if l["baseline"] else ""
            if not subline:
                # --no-subline-segmentation: line span with the bare text,
                # no ocrx_word children (the template renders an empty
                # segment loop; we keep the text so the line isn't lost)
                parts.append(
                    f"\t\t\t<span class=\"ocr_line\" id={quoteattr(l['id'])} "
                    f"title={quoteattr(f'bbox {x0} {y0} {x1} {y1}{bl}')}>"
                    f"{escape(l.get('prediction', ''))}</span>\n"
                )
                continue
            if l.get("segments") is not None:
                # record-derived path (reference templates/hocr render_line):
                # x_bboxes = flattened per-char cut polygons on the line,
                # x_confs = per-char confidences on each segment span,
                # poly = polygon-section boundary
                xbb = " ".join(f"{int(p[0])} {int(p[1])}"
                               for cut in l["cuts"] for p in cut)
                lpoly = " ".join(f"{int(p[0])} {int(p[1])}" for p in l["boundary"])
                title = f"bbox {x0} {y0} {x1} {y1}; x_bboxes {xbb}; poly {lpoly}"
                parts.append(
                    f"\t\t\t<span class=\"ocr_line\" id={quoteattr(l['id'])} "
                    f"title={quoteattr(title)}>"
                )
                sp = []
                for seg in l["segments"]:
                    sx0, sy0, sx1, sy1 = seg["bbox"]
                    st = (f"bbox {sx0} {sy0} {sx1} {sy1}; x_confs "
                          + " ".join(str(c) for c in seg["confidences"]))
                    if seg.get("boundary"):
                        st += "; poly " + " ".join(
                            f"{int(p[0])} {int(p[1])}" for p in seg["boundary"])
                    sp.append(
                        f"<span class=\"ocrx_word\" id=\"segment_{seg['index']}\" "
                        f"title={quoteattr(st)}>{escape(seg['text'])}</span>"
                    )
                parts.append("".join(sp))
                parts.append("</span>\n")
                continue
            parts.append(
                f"\t\t\t<span class=\"ocr_line\" id={quoteattr(l['id'])} "
                f"title={quoteattr(f'bbox {x0} {y0} {x1} {y1}{bl}')}>"
            )
            spans = []
            for wd in words_of(l):
                wx0, wy0, wx1, wy1 = (int(v) for v in wd["bbox"])
                wtitle = f"bbox {wx0} {wy0} {wx1} {wy1}; x_conf {wd['conf']:.4f}"
                spans.append(
                    f"<span class=\"ocrx_word\" title={quoteattr(wtitle)}>"
                    f"{escape(wd['text'])}</span>"
                )
            parts.append(" ".join(spans))
            parts.append("</span>\n")
        parts.append("\t\t</div>\n")
    parts.append("\t</div>\n</body>\n</html>\n")
    return "".join(parts)


def to_abbyy(row, created: str = PINNED_CREATED, subline: bool = True) -> str:
    """abbyyXML (FineReader 10 schema) document
    (cf. /root/reference/kraken/templates/abbyyxml): one <block> per region
    (free lines get their own block), <par> of <line> elements carrying
    baseline/l/r/t/b, and per-character <charParams> with l/r/t/b extents,
    wordStart flags at whitespace-split word starts, and charConfidence
    rescaled to 0-100 (the template's `rescale(0, 100)` filter)."""
    w, h = int(_row_get(row, "width", 0)), int(_row_get(row, "height", 0))
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<document xmlns="http://www.abbyy.com/FineReader_xml/FineReader10-schema-v1.xml" '
        'version="1.0" producer="kraken_spark">\n'
        f'\t<page width="{w}" height="{h}" resolution="0" originalCoords="1">\n'
    ]
    for region, lines in _group_lines_by_region(row):
        parts.append('\t\t<block blockType="Text">\n\t\t\t<text>\n\t\t\t\t<par>\n')
        for l in lines:
            x0, y0, x1, y1 = (int(v) for v in l["bbox"])
            baseline_y = int((y0 + y1) / 2)
            parts.append(
                f'\t\t\t\t\t<line baseline="{baseline_y}" l="{x0}" r="{x1}" '
                f't="{y0}" b="{y1}"><formatting lang="">'
            )
            text = l["prediction"]
            if not subline:
                # --no-subline-segmentation: empty formatting block (the
                # template's charParams loop over an empty recognition)
                parts.append("</formatting></line>\n")
                continue
            have_geom = len(l["cuts"]) >= len(text) and len(l["confidences"]) >= len(text)
            for wd in words_of(l):
                for ci in range(wd["start"], wd["end"]):
                    if have_geom:
                        cx0, cx1 = (int(v) for v in l["cuts"][ci])
                        conf = int(round(l["confidences"][ci] * 100))
                    else:
                        cx0, cx1, conf = x0, x1, 0
                    word_start = "1" if ci == wd["start"] else "0"
                    parts.append(
                        f'<charParams l="{cx0}" r="{cx1}" t="{y0}" b="{y1}" '
                        f'wordStart="{word_start}" charConfidence="{conf}">'
                        f"{escape(text[ci])}</charParams>"
                    )
            parts.append("</formatting></line>\n")
        parts.append("\t\t\t\t</par>\n\t\t\t</text>\n\t\t</block>\n")
    parts.append("\t</page>\n</document>\n")
    return "".join(parts)


def to_json(row) -> str:
    """JSON Segmentation round-trip form (cf. the reference's
    dataclasses.asdict JSON I/O, /root/reference/kraken/kraken.py:179-181)."""
    import json

    seg = {
        "type": "baselines",
        "imagename": _row_get(row, "url", ""),
        "text_direction": "horizontal-rl"
        if _row_get(row, "base_dir", "L") == "R"
        else "horizontal-lr",
        "script_detection": False,
        "width": int(_row_get(row, "width", 0)),
        "height": int(_row_get(row, "height", 0)),
        "lines": [_line_fields(l) for l in (_row_get(row, "lines", []) or [])],
        "regions": [
            {
                "id": _row_get(r, "id", ""),
                "region_type": _row_get(r, "region_type", "text"),
                "boundary": [list(p) for p in _row_get(r, "boundary", [])],
                "rank": int(_row_get(r, "rank", 0)),
                "tags": _row_get(r, "tags", "") or "",
                "language": list(_row_get(r, "language", []) or []),
            }
            for r in (_row_get(row, "regions", []) or [])
        ],
    }
    return json.dumps(seg, ensure_ascii=False, sort_keys=True)


def from_json(doc: str) -> dict:
    """Inverse of to_json: parse a JSON Segmentation into the same
    contract `xmlparse.parse_segmentation` returns, so JSON payloads take
    the identical pre-segmented input path (the reference's JSON
    round-trip, /root/reference/kraken/kraken.py:179-181,215-220)."""
    import json

    seg = json.loads(doc)
    lines = []
    for i, l in enumerate(seg.get("lines", []) or []):
        lines.append(
            {
                "id": l.get("id") or f"line_{i}",
                "rank": i,
                "bbox": [int(v) for v in (l.get("bbox") or [0, 0, 0, 0])],
                "baseline": [[int(x), int(y)] for x, y in (l.get("baseline") or [])],
                "boundary": [[int(x), int(y)] for x, y in (l.get("boundary") or [])],
                "region_ids": list(l.get("region_ids") or []),
                "text": l.get("prediction") or "",
                "tags": l.get("tags") or "",
                "language": list(l.get("language") or []),
            }
        )
    regions = [
        {
            "id": r.get("id") or f"region_{j}",
            "region_type": r.get("region_type") or "text",
            "boundary": [[int(x), int(y)] for x, y in (r.get("boundary") or [])],
            "rank": int(r.get("rank", j)),
            "tags": r.get("tags") or "",
            "language": list(r.get("language") or []),
        }
        for j, r in enumerate(seg.get("regions", []) or [])
    ]
    return {
        "width": int(seg.get("width", 0) or 0),
        "height": int(seg.get("height", 0) or 0),
        "text_direction": seg.get("text_direction") or "horizontal-lr",
        "lines": lines,
        "regions": regions,
    }


SERIALIZERS = {
    "alto": to_alto,
    "pagexml": to_pagexml,
    "hocr": to_hocr,
    "abbyyxml": to_abbyy,
    "json": lambda row, created=PINNED_CREATED: to_json(row),
}


def to_report(stats: dict) -> str:
    """OCR accuracy report — the reference's `report` template
    (/root/reference/kraken/templates/report), tab-separated with the same
    sections: totals, character/word accuracy (incl. case-insensitive),
    edit-operation counts, per-script (here: per-language) accuracy, and
    confusion counts.

    stats: {name, chars, errors, character_accuracy, character_CI_accuracy,
    word_accuracy, insertions, deletions, substitutions,
    scripts: [(script, count, errors, accuracy)],
    counts: [(errors, correct, generated)]}."""
    lines = [
        f"=== report {stats.get('name', '')} ===",
        "",
        f"{stats['chars']}\tCharacters",
        f"{stats['errors']}\tErrors",
        f"{stats['character_accuracy']:.2f}%\tCharacter Accuracy",
        f"{stats['character_CI_accuracy']:.2f}%\tCharacter Accuracy (Case-insensitive)",
        f"{stats['word_accuracy']:.2f}%\tWord Accuracy",
        "",
        f"{stats['insertions']}\tInsertions",
        f"{stats['deletions']}\tDeletions",
        f"{stats['substitutions']}\tSubstitutions",
        "",
        "Count\tMissed\t%Right",
    ]
    for script, count, errors, accuracy in stats.get("scripts", []):
        lines.append(f"{count}\t{errors}\t{accuracy:.2f}%\t{script}")
    lines.append("")
    lines.append("Errors\tCorrect-Generated")
    for errors, correct, generated in stats.get("counts", []):
        lines.append(f"{errors}\t{{ {correct} }} - {{ {generated} }}")
    return "\n".join(lines) + "\n"


def register_serializer(fmt: str, fn) -> None:
    """Register a custom output format ``fn(row, created=...) -> str`` —
    the reference's custom-Jinja-template hook
    (/root/reference/kraken/serialization.py:252-258), as a registry entry
    instead of a template path so executor-side dispatch stays a dict
    lookup."""
    SERIALIZERS[fmt] = fn


def row_with_polygon_sections(row) -> dict:
    """Upgrade an extraction row's lines to full polygon-section geometry
    (serialize with ``serialize(row_with_polygon_sections(row), 'alto')``
    to get the reference-template String/SP/Glyph Shape output on the
    engine's own rows).

    Engine lines carry per-char x-span cuts plus baseline+boundary; for
    lines with both, the spans become baseline-distance pairs (exact for
    the engine's horizontal baselines: distance = x - baseline_x0) and a
    records.BaselineOCRRecord computes the orthogonal polygon sections.
    Lines without geometry (or with mismatched cut counts) pass through
    unchanged on the legacy span path."""
    from .records import BaselineOCRRecord

    out = {k: _row_get(row, k) for k in
           ("url", "width", "height", "regions")}
    lines = []
    seg_i = char_i = 0
    for raw in (_row_get(row, "lines", []) or []):
        l = _line_fields(raw)
        pred = l["prediction"]
        ok = (l["baseline"] and l["boundary"] and l["cuts"]
              and len(l["cuts"]) == len(pred)
              and len(l["confidences"]) == len(pred)
              and all(len(c) == 2 and not isinstance(c[0], (list, tuple))
                      for c in l["cuts"]))
        if not ok:
            lines.append(raw)
            continue
        x0 = min(p[0] for p in l["baseline"])
        dist_cuts = [[max(a - x0, 0), max(b - x0, 0)] for a, b in l["cuts"]]
        rec = BaselineOCRRecord(
            prediction=pred, cuts=dist_cuts, confidences=l["confidences"],
            line={"type": "baselines", "id": l["id"],
                  "baseline": l["baseline"], "boundary": l["boundary"],
                  "text": None, "base_dir": None, "imagename": None,
                  "tags": None, "split": None, "regions": l["region_ids"],
                  "language": l["language"]})
        d, seg_i, char_i = line_dict_from_record(rec, seg_i, char_i)
        d["tags"] = l["tags"]
        d["language"] = l["language"]
        d["region_ids"] = l["region_ids"]
        lines.append(d)
    out["lines"] = lines
    return out


_SUBLINE_AWARE: dict = {}


def serialize(row, fmt: str, created: str = PINNED_CREATED,
              subline: bool = True) -> str:
    """Dispatch like the reference's serialize(..., template=fmt)
    (/root/reference/kraken/serialization.py:80-113). ``subline`` is the
    reference's sub_line_segmentation switch (--no-subline-segmentation:
    line text only, no word/char geometry); it is forwarded to writers
    that accept it — custom register_serializer hooks without the
    parameter keep their plain (row, created) contract."""
    try:
        fn = SERIALIZERS[fmt]
    except KeyError:
        raise ValueError(f"unknown serialization format {fmt!r}") from None
    aware = _SUBLINE_AWARE.get(fn)
    if aware is None:
        import inspect

        try:
            aware = "subline" in inspect.signature(fn).parameters
        except (TypeError, ValueError):
            aware = False
        _SUBLINE_AWARE[fn] = aware
    if aware:
        return fn(row, created=created, subline=subline)
    return fn(row, created=created)
