"""ALTO / PageXML input parsing: XML bytes -> segmentation dict.

Re-expresses the reference's XMLPage reader
(/root/reference/kraken/lib/xml/__init__.py:41-283, alto.py:81-331,
page.py:63-328, common.py:29-200) on stdlib ElementTree: dialect
detection from the root element, region collection over the full ALTO /
PAGE region-type vocabularies with Shape->rect->excluded coordinate
fallback, per-line tags/languages/splits/base-direction with
page->region->line inheritance, String/SP text assembly, explicit
reading orders flattened to line- and region-level (String refs resolved
through their parent lines, coordinate-less regions skipped), and the
reference's hard failure modes (non-pixel measurement unit, missing
image name, unparseable dimensions, zero dimensions without a resolvable
image file) as ValueError.

PAGE language values are normalised to ISO 639-3 like the reference
(page.py:30-61 via the public iso639 tables); unknown values pass
through unchanged. The engine-facing dict keeps the columnar schema
shape (tags as JSON string with a 'default' fallback, language as list)
and additionally carries the reference-shaped raw values (``tags_raw``,
``base_dir``, ``split``, named ``orders``) for parity checks.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from itertools import groupby

_ALTO_REGIONS = {"TextBlock": "text",
                 "Illustration": "illustration",
                 "GraphicalElement": "graphic",
                 "ComposedBlock": "composed"}

_PAGE_REGIONS = {"TextRegion": "text", "ImageRegion": "image",
                 "LineDrawingRegion": "line drawing",
                 "GraphicRegion": "graphic", "TableRegion": "table",
                 "ChartRegion": "chart", "MapRegion": "map",
                 "SeparatorRegion": "separator", "MathsRegion": "maths",
                 "ChemRegion": "chem", "MusicRegion": "music",
                 "AdvertRegion": "advert", "NoiseRegion": "noise",
                 "UnknownRegion": "unknown", "CustomRegion": "custom"}

# ISO 639-1 -> 639-3 for the common two-letter codes plus English language
# names -> 639-3 (public ISO 639 tables; unknown values pass through, the
# reference's InvalidLanguageValue behavior)
_ISO1_TO_3 = {
    "aa": "aar", "ab": "abk", "af": "afr", "am": "amh", "ar": "ara",
    "az": "aze", "be": "bel", "bg": "bul", "bn": "ben", "bo": "bod",
    "br": "bre", "bs": "bos", "ca": "cat", "cs": "ces", "cy": "cym",
    "da": "dan", "de": "deu", "el": "ell", "en": "eng", "eo": "epo",
    "es": "spa", "et": "est", "eu": "eus", "fa": "fas", "fi": "fin",
    "fo": "fao", "fr": "fra", "ga": "gle", "gd": "gla", "gl": "glg",
    "gu": "guj", "he": "heb", "hi": "hin", "hr": "hrv", "hu": "hun",
    "hy": "hye", "id": "ind", "is": "isl", "it": "ita", "ja": "jpn",
    "ka": "kat", "kk": "kaz", "km": "khm", "kn": "kan", "ko": "kor",
    "ku": "kur", "ky": "kir", "la": "lat", "lb": "ltz", "lo": "lao",
    "lt": "lit", "lv": "lav", "mk": "mkd", "ml": "mal", "mn": "mon",
    "mr": "mar", "ms": "msa", "mt": "mlt", "my": "mya", "ne": "nep",
    "nl": "nld", "no": "nor", "pa": "pan", "pl": "pol", "ps": "pus",
    "pt": "por", "ro": "ron", "ru": "rus", "si": "sin", "sk": "slk",
    "sl": "slv", "sq": "sqi", "sr": "srp", "sv": "swe", "sw": "swa",
    "ta": "tam", "te": "tel", "th": "tha", "tl": "tgl", "tr": "tur",
    "uk": "ukr", "ur": "urd", "uz": "uzb", "vi": "vie", "yi": "yid",
    "zh": "zho",
}
_NAME_TO_3 = {
    "arabic": "ara", "chinese": "zho", "czech": "ces", "danish": "dan",
    "dutch": "nld", "english": "eng", "finnish": "fin", "french": "fra",
    "german": "deu", "greek": "ell", "hebrew": "heb", "hindi": "hin",
    "hungarian": "hun", "italian": "ita", "japanese": "jpn",
    "korean": "kor", "latin": "lat", "norwegian": "nor", "persian": "fas",
    "polish": "pol", "portuguese": "por", "russian": "rus",
    "spanish": "spa", "swedish": "swe", "turkish": "tur",
    "ukrainian": "ukr", "yiddish": "yid",
}


def iso639_3(value: str) -> str:
    """Normalise a language value (two-letter code or English name) to its
    ISO 639-3 code; anything unrecognised passes through unchanged."""
    if not value:
        return value
    v = value.strip()
    if len(v) == 2 and v.lower() in _ISO1_TO_3:
        return _ISO1_TO_3[v.lower()]
    return _NAME_TO_3.get(v.lower(), v)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _tags_json(tags: dict | None, default_type: str = "default") -> str:
    """Serialize the reference's tags shape dict[str, list[dict[str,str]]]
    (containers.py:88) to the columnar JSON-string form. Transkribus
    bookkeeping keys (structure/readingOrder/language) are dropped from the
    columnar form — 'type' already carries the structure label — but kept
    in the parse output's tags_raw."""
    if tags:
        tags = {k: v for k, v in tags.items()
                if k not in ("structure", "readingOrder", "language")}
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


_FLOAT_RE = re.compile(r"[-+]?(\d+(\.\d*)?|\.\d+)([eE][-+]?\d+)?")


def parse_alto_points(s: str | None) -> list[list[int]]:
    """ALTO PointsType in any of its serializations ('x,y x,y', 'x y x y',
    parenthesised) -> deduplicated point list; ValueError on a missing
    attribute or an odd coordinate count; an EMPTY string is a valid empty
    point list (common.py:52-80, parse_alto_pointstype — finditer of ''
    yields no points)."""
    try:
        coords = [int(float(m.group())) for m in _FLOAT_RE.finditer(s)]
    except (ValueError, TypeError, OverflowError):
        raise ValueError(f"invalid points sequence: {s!r}")
    if len(coords) % 2:
        raise ValueError(f"odd points sequence: {s!r}")
    pts = zip(coords[::2], coords[1::2])
    return [[x, y] for (x, y), _ in groupby(pts)]


def parse_page_points(s: str) -> list[list[int]]:
    """PAGE Coords points ('x,y x,y ...', strict integers) -> deduplicated
    point list (common.py:75-79, parse_page_coords)."""
    coords = [int(c) for tok in s.split(" ") for c in tok.split(",")]
    pts = zip(coords[::2], coords[1::2])
    return [[x, y] for (x, y), _ in groupby(pts)]


_DIR_ALTO = {"ltr": "L", "rtl": "R", "ttb": "L", "btt": "R"}
_DIR_PAGE = {"left-to-right": "L", "right-to-left": "R",
             "top-to-bottom": "L", "bottom-to-top": "R"}


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
    if name == "document" and "FineReader" in (root.tag or ""):
        return "abbyy"
    return "unknown"


# ---------------------------------------------------------------------------
# tagrefs / languages (ALTO)
# ---------------------------------------------------------------------------

def _alto_tagrefs(tag_map: dict, refs: str | None) -> dict:
    """TAGREFS -> tags dict per the reference's merge semantics
    (alto.py:27-58): labels are grouped under their tag TYPE ('type' when
    absent), same-type refs extend the list."""
    tags: dict = {}
    for ref in (refs or "").split():
        ttype, label = tag_map.get(ref, (None, None))
        if not label:
            continue
        tags.setdefault(ttype or "type", []).append({"type": label})
    return tags


def _alto_langs(el: ET.Element, tag_map: dict, default) :
    """Element languages: tagref 'language' labels + LANG attribute, else
    the inherited default (alto.py:61-78, parse_alto_langs)."""
    langs = []
    tags = _alto_tagrefs(tag_map, el.get("TAGREFS"))
    for t in tags.get("language", []):
        langs.append(t["type"])
    if (attr := el.get("LANG")) is not None:
        langs.append(attr)
    return langs if langs else default


# ---------------------------------------------------------------------------
# explicit reading-order flattening (common.py:98-200)
# ---------------------------------------------------------------------------

def _flatten_to_lines(raw, line_region, line_implicit, region_ids,
                      string_to_line, missing):
    out = []
    for ref in raw:
        if ref in line_region:
            out.append(ref)
        elif ref in region_ids:
            out.extend(lid for lid in line_implicit if line_region[lid] == ref)
        elif ref in missing:
            continue
        elif ref in string_to_line:
            parent = string_to_line[ref]
            if not out or out[-1] != parent:
                out.append(parent)
    return out


def _flatten_to_regions(raw, line_region, region_ids, string_to_line, missing):
    out = []

    def push(rid):
        if rid and (not out or out[-1] != rid):
            out.append(rid)

    for ref in raw:
        if ref in region_ids:
            push(ref)
        elif ref in missing:
            continue
        elif ref in line_region:
            push(line_region[ref])
        elif ref in string_to_line:
            push(line_region.get(string_to_line[ref]))
    return out


def _validate_clean(order, valid):
    seen = set()
    out = []
    for ref in order:
        if ref in valid and ref not in seen:
            seen.add(ref)
            out.append(ref)
    return out


def _walk_ro_groups(ro_el: ET.Element, leaf_attrs: tuple[str, ...]):
    """ReadingOrder -> [(order_id, [refs], is_total)]. A single top-level
    UnorderedGroup unwraps into multiple partial orders (alto.py:278-305,
    page.py:276-316). Indexed leaves sort by their index attribute, ties
    by document order."""
    groups = list(ro_el)
    unwrapped_partial = False
    if len(groups) == 1 and _local(groups[0].tag).startswith("UnorderedGroup"):
        groups = list(groups[0])
        unwrapped_partial = True

    def leaf_ref(el):
        for a in leaf_attrs:
            if el.get(a):
                return el.get(a)
        return None

    def walk(el):
        name = _local(el.tag)
        if name.startswith(("OrderedGroup", "UnorderedGroup")):
            kids = []
            for i, k in enumerate(list(el)):
                try:
                    idx = int(k.get("index", i))
                except (TypeError, ValueError, OverflowError):
                    idx = i
                kids.append((idx, i, k))
            refs = []
            for _, _, k in sorted(kids, key=lambda t: (t[0], t[1])):
                refs.extend(walk(k))
            return refs
        ref = leaf_ref(el)
        return [ref] if ref else []

    out = []
    for g in groups:
        gid = g.get("ID") or g.get("id")
        refs = walk(g) if _local(g.tag).startswith(("OrderedGroup",
                                                    "UnorderedGroup")) else \
            ([leaf_ref(g)] if leaf_ref(g) else [])
        out.append((gid, refs, not unwrapped_partial))
    return out


def _resolve_zero_dims(w, h, imagename, base_path):
    if w and h:
        return w, h
    if base_path and imagename:
        import os

        p = os.path.join(base_path, imagename)
        try:
            from .png import read_dimensions

            with open(p, "rb") as fp:
                return read_dimensions(fp.read())
        except (OSError, ValueError) as e:
            raise ValueError(
                f"zero page dimensions and unreadable image {p}: {e}")
    raise ValueError(f"invalid page dimensions ({w}, {h}) and no image to "
                     "read them from")


# ---------------------------------------------------------------------------
# ALTO
# ---------------------------------------------------------------------------

def parse_alto(data: bytes, linetype: str = "baselines",
               base_path: str | None = None) -> dict:
    """ALTO -> segmentation dict
    (cf. /root/reference/kraken/lib/xml/alto.py:81-331)."""
    root = ET.fromstring(data)
    for mu in _iter_local(root, "MeasurementUnit"):
        if (mu.text or "").strip() != "pixel":
            raise ValueError(
                f"measurement unit is {(mu.text or '').strip()!r}, not 'pixel'")
        break
    imagename = None
    for fn in _iter_local(root, "fileName"):
        imagename = (fn.text or "").strip()
        break
    if not imagename:
        raise ValueError("no valid image filename in ALTO document")
    page = next(_iter_local(root, "Page"), None)
    if page is None:
        raise ValueError("no Page element in ALTO document")
    try:
        w, h = int(page.get("WIDTH")), int(page.get("HEIGHT"))
    except (TypeError, ValueError) as e:
        raise ValueError(f"invalid page dimensions: {e}")
    w, h = _resolve_zero_dims(w, h, imagename, base_path)
    page_lang = page.get("LANG")

    tag_map: dict[str, tuple[str, str]] = {}
    for kind in ("StructureTag", "LayoutTag", "OtherTag"):
        for tg in _iter_local(root, kind):
            if tg.get("ID"):
                tag_map[tg.get("ID")] = (tg.get("TYPE"), tg.get("LABEL"))

    out = {"type": linetype, "lines": [], "regions": [],
           "imagename": imagename, "width": w, "height": h}
    line_region: dict[str, str] = {}      # line id -> region id ('' if none)
    line_implicit: list[str] = []
    region_implicit: list[str] = []
    missing_regions: set[str] = set()
    string_to_line: dict[str, str] = {}

    region_els = [el for el in root.findall(
        "./{*}Layout/{*}Page/{*}PrintSpace/*")
        if _local(el.tag) in _ALTO_REGIONS]
    for region in region_els:
        rid = region.get("ID") or ""
        region_dir = _DIR_ALTO.get(region.get("BASEDIRECTION"))
        boundary = None
        shape = region.find("./{*}Shape/{*}Polygon")
        if shape is not None:
            try:
                boundary = parse_alto_points(shape.get("POINTS")) or None
            except ValueError:
                boundary = None
        if boundary is None:
            try:
                x0, y0, bw, bh = (int(float(region.get(a)))
                                  for a in ("HPOS", "VPOS", "WIDTH", "HEIGHT"))
                boundary = [[x0, y0], [x0, y0 + bh], [x0 + bw, y0 + bh],
                            [x0 + bw, y0]]
            except (TypeError, ValueError, OverflowError):
                boundary = None
        has_coords = boundary is not None

        reg_tags = _alto_tagrefs(tag_map, region.get("TAGREFS"))
        tag_type = reg_tags.pop("region", None) or reg_tags.pop("type", None)
        if (attr_type := region.get("TYPE")) is not None:
            rtype = [{"type": attr_type}]
        else:
            rtype = tag_type or [{"type": _ALTO_REGIONS[_local(region.tag)]}]
        reg_tags["type"] = rtype
        reg_lang = _alto_langs(region, tag_map,
                               [page_lang] if page_lang else None)
        if has_coords:
            out["regions"].append({
                "id": rid,
                "region_type": rtype[0]["type"],
                "boundary": boundary,
                "rank": len(out["regions"]),
                "tags": _tags_json(reg_tags, rtype[0]["type"]),
                "tags_raw": reg_tags,
                "language": list(reg_lang) if reg_lang else [],
            })
            region_implicit.append(rid)
        else:
            missing_regions.add(rid)

        for tl in region.iterfind("./{*}TextLine"):
            lid = tl.get("ID") or ""
            baseline: list[list[int]] | None = None
            boundary_l: list[list[int]] | None = None
            bbox = None
            if linetype == "baselines":
                try:
                    baseline = parse_alto_points(tl.get("BASELINE"))
                except ValueError:
                    continue  # reference drops baseline-less lines
                pol = tl.find("./{*}Shape/{*}Polygon")
                if pol is not None:
                    try:
                        boundary_l = parse_alto_points(pol.get("POINTS")) or None
                    except ValueError:
                        boundary_l = None
            try:
                lx, ly, lw, lh = (int(float(tl.get(a)))
                                  for a in ("HPOS", "VPOS", "WIDTH", "HEIGHT"))
                bbox = [lx, ly, lx + lw, ly + lh]
            except (TypeError, ValueError, OverflowError):
                if linetype == "bbox":
                    continue  # reference drops box-less lines in bbox mode
            if bbox is None and boundary_l:
                xs = [p[0] for p in boundary_l]
                ys = [p[1] for p in boundary_l]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            if bbox is None and baseline:
                xs = [p[0] for p in baseline]
                ys = [p[1] for p in baseline]
                bbox = [min(xs), min(ys), max(xs), max(ys)]

            text = ""
            for el in tl.iter():
                name = _local(el.tag)
                if name in ("String", "SP"):
                    # reference alto.py:223-225: a String (or SP) without
                    # CONTENT contributes a space, not nothing
                    text += el.get("CONTENT") or " "
            for st in tl.iterfind("./{*}String"):
                if st.get("ID"):
                    string_to_line[st.get("ID")] = lid

            line_tags = _alto_tagrefs(tag_map, tl.get("TAGREFS"))
            line_langs = _alto_langs(tl, tag_map, reg_lang)
            split = None
            if (sp := line_tags.get("split")) is not None and len(sp) == 1:
                split = sp[0]["type"]
                line_tags.pop("split")
            line_dir = _DIR_ALTO.get(tl.get("BASEDIRECTION"))
            if line_dir is None and region_dir:
                line_dir = region_dir

            out["lines"].append({
                "id": lid,
                "bbox": bbox or [0, 0, 0, 0],
                "baseline": baseline or [],
                "boundary": boundary_l
                or ([[bbox[0], bbox[1]], [bbox[2], bbox[1]],
                     [bbox[2], bbox[3]], [bbox[0], bbox[3]]] if bbox else []),
                "text": text,
                "region_ids": [rid] if has_coords else [],
                "rank": len(out["lines"]),
                "tags": _tags_json(line_tags),
                "tags_raw": line_tags if line_tags else None,
                "language": list(line_langs) if line_langs else [],
                "base_dir": line_dir,
                "split": split,
            })
            line_region[lid] = rid if has_coords else ""
            line_implicit.append(lid)

    _attach_orders(out, root, ("REF",), line_region, line_implicit,
                   region_implicit, missing_regions, string_to_line)
    return out


# ---------------------------------------------------------------------------
# PAGE
# ---------------------------------------------------------------------------

def parse_pagexml(data: bytes, linetype: str = "baselines",
                  base_path: str | None = None) -> dict:
    """PageXML -> segmentation dict
    (cf. /root/reference/kraken/lib/xml/page.py:63-328)."""
    root = ET.fromstring(data)
    page = next(_iter_local(root, "Page"), None)
    if page is None or not page.get("imageFilename"):
        raise ValueError("no valid image filename in PageXML document")
    imagename = page.get("imageFilename")
    try:
        w, h = int(page.get("imageWidth")), int(page.get("imageHeight"))
    except (TypeError, ValueError) as e:
        raise ValueError(f"invalid page dimensions: {e}")
    w, h = _resolve_zero_dims(w, h, imagename, base_path)
    page_dir = _DIR_PAGE.get(page.get("readingDirection"))
    page_lang = _page_langs(page, None)

    out = {"type": linetype, "lines": [], "regions": [],
           "imagename": imagename, "width": w, "height": h}
    line_region: dict[str, str] = {}
    line_implicit: list[str] = []
    region_implicit: list[str] = []
    missing_regions: set[str] = set()
    tr_region_order: list[tuple[str, int]] = []
    tr_line_order: dict[int, list[tuple[int, str]]] = {}

    for region in page:
        if _local(region.tag) not in _PAGE_REGIONS:
            continue
        rid = region.get("id") or ""
        coords_el = region.find("./{*}Coords")
        boundary = None
        try:
            boundary = parse_page_points(coords_el.get("points"))
        except Exception:
            boundary = None
        has_coords = boundary is not None
        reg_lang = _page_langs(region, page_lang)
        reg_tags: dict = {}
        rtype = region.get("type")
        reg_custom = parse_page_custom(region.get("custom") or "")
        if not rtype and "structure" in reg_custom:
            rtype = reg_custom["structure"][0].get("type")
        if (reg_ro := reg_custom.get("readingOrder")) is not None and \
                (ro_idx := reg_ro[0].get("index")) is not None and has_coords:
            tr_region_order.append((rid, int(ro_idx)))
        reg_tags.update(reg_custom)
        rtype = rtype or _PAGE_REGIONS[_local(region.tag)]
        reg_tags["type"] = [{"type": rtype}]
        reg_dir = _DIR_PAGE.get(region.get("readingDirection"))
        if has_coords:
            out["regions"].append({
                "id": rid,
                "region_type": rtype,
                "boundary": boundary,
                "rank": len(out["regions"]),
                "tags": _tags_json(reg_tags, rtype),
                "tags_raw": reg_tags,
                "language": list(reg_lang) if reg_lang else [],
            })
            region_implicit.append(rid)
        else:
            missing_regions.add(rid)

        for tl in region.iterfind("./{*}TextLine"):
            lid = tl.get("id") or ""
            baseline = None
            try:
                baseline = parse_page_points(
                    tl.find("./{*}Baseline").get("points"))
            except Exception:
                if linetype == "baselines":
                    continue
            boundary_l = None
            try:
                boundary_l = parse_page_points(
                    tl.find("./{*}Coords").get("points"))
            except Exception:
                if linetype == "bbox":
                    continue
            if boundary_l:
                xs = [p[0] for p in boundary_l]
                ys = [p[1] for p in boundary_l]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            elif baseline:
                xs = [p[0] for p in baseline]
                ys = [p[1] for p in baseline]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            else:
                bbox = [0, 0, 0, 0]

            # line-level TextEquiv wins; fall back to any Unicode below
            text = ""
            te = tl.find("./{*}TextEquiv")
            scope = te if te is not None else tl
            for u in _iter_local(scope, "Unicode"):
                if u.text:
                    text += u.text

            line_tags: dict = {}
            line_custom = parse_page_custom(tl.get("custom") or "")
            if (st := line_custom.get("structure")) is not None and \
                    st[0].get("type"):
                line_tags["type"] = [{"type": st[0]["type"]}]
            if (line_ro := line_custom.get("readingOrder")) is not None and \
                    (l_idx := line_ro[0].get("index")) is not None:
                if (reg_ro := reg_custom.get("readingOrder")) is not None and \
                        (r_idx := reg_ro[0].get("index")) is not None and \
                        has_coords:
                    tr_line_order.setdefault(int(r_idx), []).append(
                        (int(l_idx), lid))
            line_tags.update(line_custom)

            line_dir = _DIR_PAGE.get(tl.get("readingDirection"))
            if line_dir is None and reg_dir:
                line_dir = reg_dir
            elif line_dir is None and page_dir:
                line_dir = page_dir
            line_langs = _page_langs(tl, reg_lang)
            split = None
            if (sp := line_tags.get("split")) is not None and len(sp) == 1:
                split = sp[0]["type"]
                line_tags.pop("split")

            out["lines"].append({
                "id": lid,
                "bbox": bbox,
                "baseline": baseline or [],
                "boundary": boundary_l or [],
                "text": text,
                "region_ids": [rid] if has_coords else [],
                "rank": len(out["lines"]),
                "tags": _tags_json(line_tags),
                "tags_raw": line_tags if line_tags else None,
                "language": list(line_langs) if line_langs else [],
                "base_dir": line_dir,
                "split": split,
            })
            line_region[lid] = rid if has_coords else ""
            line_implicit.append(lid)

    _attach_orders(out, root, ("regionRef",), line_region, line_implicit,
                   region_implicit, missing_regions, {})

    # Transkribus custom-attribute orders (page.py:253-273)
    if tr_region_order:
        ordered = [r for r, _ in sorted(tr_region_order, key=lambda t: t[1])]
        out.setdefault("orders", {})["region_transkribus"] = {
            "order": ordered, "level": "region",
            "is_total": len({r for r, _ in tr_region_order})
            == len(tr_region_order)}
    if tr_line_order:
        flat = [lid for _, grp in sorted(tr_line_order.items())
                for _, lid in sorted(grp)]
        out.setdefault("orders", {})["line_transkribus"] = {
            "order": flat, "level": "line", "is_total": True}
        idx = {l["id"]: i for i, l in enumerate(out["lines"])}
        out.setdefault("line_orders", []).append(
            [idx[lid] for lid in flat if lid in idx])
    return out


def _page_langs(el: ET.Element, default):
    """Languages of a PAGE element: custom-string language values +
    primary/secondaryLanguage attributes, ISO-639-3-normalised
    (page.py:30-61, parse_page_langs)."""
    langs = []
    cs = parse_page_custom(el.get("custom") or "")
    for lv in cs.get("language", []):
        if lv.get("type"):
            langs.append(iso639_3(lv["type"]))
    for attr in ("primaryLanguage", "secondaryLanguage"):
        if el.get(attr):
            langs.append(iso639_3(el.get(attr)))
    return langs if langs else default


def _attach_orders(out: dict, root: ET.Element, leaf_attrs, line_region,
                   line_implicit, region_implicit, missing_regions,
                   string_to_line) -> None:
    """Flatten explicit ReadingOrder groups to line- and region-level
    orders; named orders land in out['orders'], line-level ones also as
    index lists in out['line_orders'] (lib/xml/__init__.py:157-187)."""
    orders = {
        "line_implicit": {"order": list(line_implicit), "level": "line",
                          "is_total": True},
        "region_implicit": {"order": list(region_implicit),
                            "level": "region", "is_total": True},
    }
    region_ids = set(region_implicit)
    idx_of = {lid: i for i, lid in enumerate(line_implicit)}
    line_orders = []
    ro_el = next(_iter_local(root, "ReadingOrder"), None)
    if ro_el is not None:
        for gid, refs, is_total in _walk_ro_groups(ro_el, leaf_attrs):
            flat_l = _validate_clean(
                _flatten_to_lines(refs, line_region, line_implicit,
                                  region_ids, string_to_line,
                                  missing_regions),
                set(line_region))
            flat_r = _validate_clean(
                _flatten_to_regions(refs, line_region, region_ids,
                                    string_to_line, missing_regions),
                region_ids)
            key = gid or f"ro_{len(orders)}"
            orders[key] = {"order": flat_l, "level": "line",
                           "is_total": is_total}
            orders[f"{key}:regions"] = {"order": flat_r, "level": "region",
                                        "is_total": is_total}
            if flat_l:
                line_orders.append([idx_of[lid] for lid in flat_l])
    out["orders"] = orders
    if line_orders:
        out["line_orders"] = line_orders


def parse_segmentation(data: bytes, linetype: str = "baselines",
                       base_path: str | None = None) -> dict:
    """Dialect-dispatched parse, the XMLPage(filetype='xml') behavior
    (/root/reference/kraken/lib/xml/__init__.py:41-283). Raises ValueError
    on non-XML or unknown dialect (callers map that to guard_tripped rows)."""
    dialect = detect_dialect(data)
    if dialect == "alto":
        return parse_alto(data, linetype=linetype, base_path=base_path)
    if dialect == "pagexml":
        return parse_pagexml(data, linetype=linetype, base_path=base_path)
    if dialect == "hocr":
        return parse_hocr(data)
    if dialect == "abbyy":
        return parse_abbyy(data)
    raise ValueError(f"unsupported XML dialect: {dialect}")


# ---------------------------------------------------------------------------
# hOCR
# ---------------------------------------------------------------------------

def _hocr_title(el) -> dict:
    """hOCR title attribute -> {prop: raw value string}."""
    out = {}
    for prop in (el.get("title") or "").split(";"):
        prop = prop.strip()
        if prop:
            key, _, val = prop.partition(" ")
            out[key] = val.strip()
    return out


def parse_hocr(data: bytes) -> dict:
    """hOCR 1.1 -> segmentation dict. The reference has no hOCR READER
    (its XMLPage handles ALTO/PAGE only, lib/xml/__init__.py:95-107) —
    this closes the engine's own serialize->reparse loop for the hOCR sink
    (kernels/serialize.to_hocr / reference templates/hocr): ocr_page dims,
    ocr_carea regions, ocr_line bbox/baseline/poly, ocrx_word text joined
    with single spaces between word spans."""
    root = ET.fromstring(data)
    out = {"type": "baselines", "lines": [], "regions": [],
           "imagename": "", "width": 0, "height": 0}

    def cls_of(el):
        return (el.get("class") or "").split()

    pages = [el for el in root.iter() if "ocr_page" in cls_of(el)]
    if not pages:
        raise ValueError("no ocr_page element in hOCR document")
    t = _hocr_title(pages[0])
    if "bbox" in t:
        _, _, w, h = (int(v) for v in t["bbox"].split())
        out["width"], out["height"] = w, h
    out["imagename"] = t.get("image", "")

    def poly_pts(raw):
        vals = [int(v) for v in raw.split()]
        if len(vals) % 2:
            raise ValueError(f"odd hOCR poly coordinate count: {raw!r}")
        return [[x, y] for x, y in zip(vals[::2], vals[1::2])]

    def handle(el, region_id):
        """Returns the (possibly updated) region id; lines consume their
        word descendants."""
        classes = cls_of(el)
        if "ocr_carea" in classes or "ocrx_block" in classes:
            region_id = el.get("id") or ""
            t = _hocr_title(el)
            boundary = []
            if "poly" in t:
                boundary = poly_pts(t["poly"])
            elif "bbox" in t:
                x0, y0, x1, y1 = (int(v) for v in t["bbox"].split())
                boundary = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            out["regions"].append({
                "id": region_id,
                "region_type": el.get("data-region-type") or "text",
                "boundary": boundary,
                "rank": len(out["regions"]),
                "tags": _tags_json(None, "text"),
                "language": [],
            })
        elif "ocr_line" in classes:
            t = _hocr_title(el)
            bbox = [0, 0, 0, 0]
            if "bbox" in t:
                bbox = [int(v) for v in t["bbox"].split()]
            baseline = []
            if "baseline" in t and "," in t["baseline"]:
                baseline = [[int(a), int(b)] for a, b in
                            (p.split(",") for p in t["baseline"].split())]
            boundary = []
            if "poly" in t:
                boundary = poly_pts(t["poly"])
            else:
                x0, y0, x1, y1 = bbox
                boundary = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            words = [("".join(wel.itertext())) for wel in el.iter()
                     if "ocrx_word" in cls_of(wel)]
            if any(w.isspace() for w in words):
                # segments-form hOCR (record-derived): whitespace runs are
                # their own spans, so concatenation restores the text
                text = "".join(words)
            elif words:
                text = " ".join(w for w in words if w)
            else:
                text = "".join(el.itertext()).strip()
            out["lines"].append({
                "id": el.get("id") or "",
                "bbox": bbox,
                "baseline": baseline,
                "boundary": boundary,
                "text": text,
                "region_ids": [region_id] if region_id else [],
                "rank": len(out["lines"]),
                "tags": _tags_json(None),
                "tags_raw": None,
                "language": [],
                "base_dir": None,
                "split": None,
            })
            return None  # words already consumed, skip descendants
        return region_id

    # iterative DFS in document order — recursion depth must not scale
    # with document nesting (ValueError-only guard contract)
    for page in pages:
        stack = [(page, "")]
        while stack:
            el, rid = stack.pop()
            new_rid = handle(el, rid)
            if new_rid is None:
                continue
            for child in reversed(list(el)):
                stack.append((child, new_rid))
    return out


# ---------------------------------------------------------------------------
# abbyyXML
# ---------------------------------------------------------------------------

def parse_abbyy(data: bytes) -> dict:
    """abbyyXML (FineReader 10 schema) -> segmentation dict. Like hOCR,
    the reference only WRITES this format (templates/abbyyxml); the reader
    closes the engine's serialize->reparse loop. charParams restore the
    full per-character geometry: text reassembles with spaces at wordStart
    boundaries, cuts come back as (l, r) spans, confidences from
    charConfidence/100."""
    root = ET.fromstring(data)
    if _local(root.tag) != "document":
        raise ValueError("not an abbyyXML document")
    out = {"type": "baselines", "lines": [], "regions": [],
           "imagename": "", "width": 0, "height": 0}
    abbyy_pages = list(_iter_local(root, "page"))
    if not abbyy_pages:
        raise ValueError("no page element in abbyyXML document")
    out["width"] = int(abbyy_pages[0].get("width") or 0)
    out["height"] = int(abbyy_pages[0].get("height") or 0)
    for page in abbyy_pages:
      for block in _iter_local(page, "block"):
        rid = f"block_{len(out['regions'])}"
        l = int(block.get("l") or 0)
        t = int(block.get("t") or 0)
        r = int(block.get("r") or out["width"])
        b = int(block.get("b") or out["height"])
        out["regions"].append({
            "id": rid,
            "region_type": (block.get("blockType") or "Text").lower(),
            "boundary": [[l, t], [r, t], [r, b], [l, b]],
            "rank": len(out["regions"]),
            "tags": _tags_json(None, "text"),
            "language": [],
        })
        for line in _iter_local(block, "line"):
            lx0 = int(line.get("l") or 0)
            ly0 = int(line.get("t") or 0)
            lx1 = int(line.get("r") or 0)
            ly1 = int(line.get("b") or 0)
            yb = int(line.get("baseline") or ly1)
            text = ""
            cuts = []
            confs = []
            langs = []
            for fmt in _iter_local(line, "formatting"):
                if fmt.get("lang"):
                    langs.append(fmt.get("lang"))
            for i, cp in enumerate(_iter_local(line, "charParams")):
                if i > 0 and cp.get("wordStart") == "1":
                    text += " "
                    cuts.append([int(cp.get("l") or 0),
                                 int(cp.get("l") or 0)])
                    confs.append(1.0)
                text += cp.text or ""
                cuts.append([int(cp.get("l") or 0), int(cp.get("r") or 0)])
                # FineReader uses charConfidence="-1" as the unknown
                # sentinel — clamp into the engine's 0..1 contract
                conf = int(cp.get("charConfidence") or 0)
                confs.append(round(min(max(conf, 0), 100) / 100.0, 2))
            out["lines"].append({
                "id": f"line_{len(out['lines'])}",
                "bbox": [lx0, ly0, lx1, ly1],
                "baseline": [[lx0, yb], [lx1, yb]],
                "boundary": [[lx0, ly0], [lx1, ly0], [lx1, ly1], [lx0, ly1]],
                "text": text,
                "cuts": cuts,
                "confidences": confs,
                "region_ids": [rid],
                "rank": len(out["lines"]),
                "tags": _tags_json(None),
                "tags_raw": None,
                "language": langs,
                "base_dir": None,
                "split": None,
            })
    return out
