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

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


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
    for page in _iter_local(root, "Page"):
        out["width"] = int(float(page.get("WIDTH", "0")))
        out["height"] = int(float(page.get("HEIGHT", "0")))
        break
    for block in _iter_local(root, "TextBlock"):
        x0 = int(float(block.get("HPOS", "0")))
        y0 = int(float(block.get("VPOS", "0")))
        bw = int(float(block.get("WIDTH", "0")))
        bh = int(float(block.get("HEIGHT", "0")))
        rid = block.get("ID", "")
        out["regions"].append(
            {
                "id": rid,
                "region_type": "text",
                "boundary": [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh], [x0, y0 + bh]],
                "rank": len(out["regions"]),
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
                }
            )
    return out


def parse_pagexml(data: bytes) -> dict:
    """PageXML -> {lines, regions, text, width, height, imagename}
    (cf. /root/reference/kraken/lib/xml/page.py:63-328)."""
    root = ET.fromstring(data)
    out = {"type": "baselines", "lines": [], "regions": [], "imagename": "", "width": 0, "height": 0}
    for page in _iter_local(root, "Page"):
        out["imagename"] = page.get("imageFilename", "")
        out["width"] = int(float(page.get("imageWidth", "0")))
        out["height"] = int(float(page.get("imageHeight", "0")))
        break
    for region in _iter_local(root, "TextRegion"):
        rid = region.get("id", "")
        boundary: list[list[int]] = []
        for child in region:
            if _local(child.tag) == "Coords":
                boundary = _parse_points(child.get("points", ""))
                break
        out["regions"].append(
            {
                "id": rid,
                "region_type": "text",
                "boundary": boundary,
                "rank": len(out["regions"]),
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
            out["lines"].append(
                {
                    "id": tl.get("id", ""),
                    "bbox": bbox,
                    "baseline": baseline,
                    "boundary": boundary_l,
                    "text": text,
                    "region_ids": [rid],
                    "rank": len(out["lines"]),
                }
            )
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
