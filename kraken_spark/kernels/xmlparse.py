"""ALTO / PageXML input parsing: XML bytes -> segmentation dict.

Re-expresses the reference's XMLPage reader
(/root/reference/kraken/lib/xml/__init__.py:41-283, alto.py:81-331,
page.py:63-328) on stdlib ElementTree: detects the dialect from the root
element, extracts lines (id, bbox, baseline, boundary, text), regions, and
reading order. Namespace handling is by local tag name, matching the
reference's tolerance for the many ALTO/PageXML namespace versions
(lib/xml/common.py). Coordinate parsers follow
/root/reference/kraken/lib/xml/common.py:52-96.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _tags_json(tags: dict | None, default_type: str = "default") -> str:
    """Serialize the reference's tags shape dict[str, list[dict[str,str]]]
    (containers.py:88) to the columnar JSON-string form."""
    if not tags:
        tags = {"type": [{"type": default_type}]}
    return json.dumps(tags, sort_keys=True)


def parse_page_custom(s: str) -> dict[str, list[dict[str, str]]]:
    """Transkribus-style ``custom`` attribute parser:
    'structure {type:heading;} language {value:fr;}' ->
    {'structure': [{'type': 'heading'}], ...} (the reference's
    parse_page_custom, lib/xml/common.py:82-95)."""
    out: dict[str, list[dict[str, str]]] = {}
    for chunk in (s or "").split("}"):
        chunk = chunk.strip()
        if not chunk or "{" not in chunk:
            continue
        tag, _, vals = chunk.partition("{")
        kv: dict[str, str] = {}
        for val in vals.split(";"):
            val = val.strip()
            if not val:
                continue
            key, _, v = val.partition(":")
            kv[key.strip()] = v.strip()
        out.setdefault(tag.strip(), []).append(kv)
    return out


def _iter_local(el: ET.Element, name: str):
    for child in el.iter():
        if _local(child.tag) == name:
            yield child


def _parse_points(s: str) -> list[list[int]]:
    """'x0,y0 x1,y1 ...' -> [[x0,y0],...] (PageXML/ALTO points syntax,
    cf. /root/reference/kraken/lib/xml/common.py:52-96)."""
    pts = []
    for tok in (s or "").split():
        xy = tok.split(",")
        if len(xy) == 2:
            pts.append([int(float(xy[0])), int(float(xy[1]))])
    return pts


def detect_dialect(data: bytes) -> str:
    """'alto' | 'pagexml' | 'hocr' | 'unknown' from the root element."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return "unknown"
    name = _local(root.tag).lower()
    if name == "alto":
        return "alto"
    if name == "pcgts":
        return "pagexml"
    if name == "html":
        return "hocr"
    return "unknown"


def parse_alto(data: bytes) -> dict:
    """ALTO -> {lines, regions, text, width, height, imagename}
    (cf. /root/reference/kraken/lib/xml/alto.py:81-331)."""
    root = ET.fromstring(data)
    out = {"type": "baselines", "lines": [], "regions": [], "imagename": "", "width": 0, "height": 0}
    for fn in _iter_local(root, "fileName"):
        out["imagename"] = fn.text or ""
        break
    page_lang = None
    for page in _iter_local(root, "Page"):
        out["width"] = int(float(page.get("WIDTH", "0")))
        out["height"] = int(float(page.get("HEIGHT", "0")))
        page_lang = page.get("LANG")
        break
    # Tags block: StructureTag/LayoutTag/OtherTag ID -> (TYPE, LABEL),
    # referenced from TAGREFS attributes (alto.py:133-170, 227-331)
    tag_map: dict[str, tuple[str, str]] = {}
    for kind in ("StructureTag", "LayoutTag", "OtherTag"):
        for tg in _iter_local(root, kind):
            tid = tg.get("ID")
            if tid:
                tag_map[tid] = (tg.get("TYPE") or "type", tg.get("LABEL") or "")

    def tagrefs_to_tags(refs: str | None) -> dict:
        tags: dict = {}
        for ref in (refs or "").split():
            ttype, label = tag_map.get(ref, (None, None))
            if label:
                tags.setdefault(ttype or "type", []).append({"type": label})
        return tags

    for block in _iter_local(root, "TextBlock"):
        x0 = int(float(block.get("HPOS", "0")))
        y0 = int(float(block.get("VPOS", "0")))
        bw = int(float(block.get("WIDTH", "0")))
        bh = int(float(block.get("HEIGHT", "0")))
        rid = block.get("ID", "")
        block_tags = tagrefs_to_tags(block.get("TAGREFS"))
        block_type = (block_tags.get("type") or [{"type": "text"}])[0]["type"]
        block_lang = block.get("LANG") or page_lang
        out["regions"].append(
            {
                "id": rid,
                "region_type": block_type,
                "boundary": [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh], [x0, y0 + bh]],
                "rank": len(out["regions"]),
                "tags": _tags_json(block_tags, block_type),
                "language": [block_lang] if block_lang else [],
            }
        )
        for tl in _iter_local(block, "TextLine"):
            lx = int(float(tl.get("HPOS", "0")))
            ly = int(float(tl.get("VPOS", "0")))
            lw = int(float(tl.get("WIDTH", "0")))
            lh = int(float(tl.get("HEIGHT", "0")))
            baseline_attr = tl.get("BASELINE", "")
            baseline = _parse_points(baseline_attr)
            if not baseline and baseline_attr:
                # single y-value legacy form (alto.py baseline fallback)
                try:
                    yb = int(float(baseline_attr))
                    baseline = [[lx, yb], [lx + lw, yb]]
                except ValueError:
                    baseline = []
            words = []
            for st in _iter_local(tl, "String"):
                words.append(st.get("CONTENT", ""))
            line_tags = tagrefs_to_tags(tl.get("TAGREFS"))
            line_type = (line_tags.get("type") or [{"type": "default"}])[0]["type"]
            line_lang = tl.get("LANG") or block_lang
            out["lines"].append(
                {
                    "id": tl.get("ID", ""),
                    "bbox": [lx, ly, lx + lw, ly + lh],
                    "baseline": baseline,
                    "boundary": [
                        [lx, ly],
                        [lx + lw, ly],
                        [lx + lw, ly + lh],
                        [lx, ly + lh],
                    ],
                    "text": " ".join(words),
                    "region_ids": [rid],
                    "rank": len(out["lines"]),
                    "tags": _tags_json(line_tags, line_type),
                    "language": [line_lang] if line_lang else [],
                }
            )
    return out


def parse_pagexml(data: bytes) -> dict:
    """PageXML -> {lines, regions, text, width, height, imagename}
    (cf. /root/reference/kraken/lib/xml/page.py:63-328)."""
    root = ET.fromstring(data)
    out = {"type": "baselines", "lines": [], "regions": [], "imagename": "", "width": 0, "height": 0}
    page_lang = None
    for page in _iter_local(root, "Page"):
        out["imagename"] = page.get("imageFilename", "")
        out["width"] = int(float(page.get("imageWidth", "0")))
        out["height"] = int(float(page.get("imageHeight", "0")))
        page_lang = page.get("primaryLanguage")
        break
    for region in _iter_local(root, "TextRegion"):
        rid = region.get("id", "")
        boundary: list[list[int]] = []
        for child in region:
            if _local(child.tag) == "Coords":
                boundary = _parse_points(child.get("points", ""))
                break
        # Transkribus custom attribute: structure type + language
        # (page.py:124-147 via parse_page_custom)
        reg_custom = parse_page_custom(region.get("custom", ""))
        reg_type = region.get("type") or ""
        if not reg_type and "structure" in reg_custom:
            reg_type = reg_custom["structure"][0].get("type", "")
        reg_type = reg_type or "text"
        reg_lang = region.get("primaryLanguage") or page_lang
        if "language" in reg_custom and reg_custom["language"][0]:
            reg_lang = next(iter(reg_custom["language"][0].values()), reg_lang)
        out["regions"].append(
            {
                "id": rid,
                "region_type": reg_type,
                "boundary": boundary,
                "rank": len(out["regions"]),
                "tags": _tags_json({"type": [{"type": reg_type}]}),
                "language": [reg_lang] if reg_lang else [],
            }
        )
        for tl in _iter_local(region, "TextLine"):
            boundary_l: list[list[int]] = []
            baseline: list[list[int]] = []
            text = ""
            for child in tl:
                name = _local(child.tag)
                if name == "Coords":
                    boundary_l = _parse_points(child.get("points", ""))
                elif name == "Baseline":
                    baseline = _parse_points(child.get("points", ""))
                elif name == "TextEquiv":
                    for u in _iter_local(child, "Unicode"):
                        text = u.text or ""
                        break
            if boundary_l:
                xs = [p[0] for p in boundary_l]
                ys = [p[1] for p in boundary_l]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            else:
                bbox = [0, 0, 0, 0]
            line_custom = parse_page_custom(tl.get("custom", ""))
            ltype = "default"
            if "structure" in line_custom:
                ltype = line_custom["structure"][0].get("type", "default") or "default"
            line_lang = tl.get("primaryLanguage") or reg_lang
            if "language" in line_custom and line_custom["language"][0]:
                line_lang = next(iter(line_custom["language"][0].values()), line_lang)
            out["lines"].append(
                {
                    "id": tl.get("id", ""),
                    "bbox": bbox,
                    "baseline": baseline,
                    "boundary": boundary_l,
                    "text": text,
                    "region_ids": [rid],
                    "rank": len(out["lines"]),
                    "tags": _tags_json({"type": [{"type": ltype}]}),
                    "language": [line_lang] if line_lang else [],
                }
            )
    # explicit reading order: ReadingOrder/OrderedGroup/RegionRefIndexed
    # (page.py:273-316) — region-id order expanded to line indices by
    # membership, exposed as an ALTERNATIVE order (Segmentation.line_orders);
    # the lines list keeps document (implicit) order like the reference
    refs: list[str] = []
    for ro_el in _iter_local(root, "ReadingOrder"):

        def _walk(el: ET.Element) -> None:
            kids = list(el)
            indexed = []
            for i, k in enumerate(kids):
                try:
                    idx = int(k.get("index", i))
                except (TypeError, ValueError):
                    idx = i
                indexed.append((idx, i, k))
            for _, _, k in sorted(indexed, key=lambda t: (t[0], t[1])):
                if _local(k.tag) in ("OrderedGroup", "UnorderedGroup"):
                    _walk(k)
                else:
                    rr = k.get("regionRef")
                    if rr:
                        refs.append(rr)

        _walk(ro_el)
        break
    if refs:
        order = [
            i
            for rid in refs
            for i, l in enumerate(out["lines"])
            if l["region_ids"] and l["region_ids"][0] == rid
        ]
        seen = set(order)
        order += [i for i in range(len(out["lines"])) if i not in seen]
        out["line_orders"] = [order]
    return out


def parse_segmentation(data: bytes) -> dict:
    """Dialect-dispatched parse, the XMLPage(filetype='xml') behavior
    (/root/reference/kraken/lib/xml/__init__.py:41-283). Raises ValueError
    on non-XML or unknown dialect (callers map that to guard_tripped rows)."""
    dialect = detect_dialect(data)
    if dialect == "alto":
        return parse_alto(data)
    if dialect == "pagexml":
        return parse_pagexml(data)
    raise ValueError(f"unsupported XML dialect: {dialect}")
