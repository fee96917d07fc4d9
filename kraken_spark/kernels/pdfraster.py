"""From-scratch PDF vector-content rasterizer (pure numpy + stdlib).

The reference shells PDF pages out to pyvips at 300 dpi and feeds the
resulting PNGs into segmentation (/root/reference/kraken/kraken.py:363-405).
This container ships no pyvips/poppler, so this module implements the
document-class subset of the PDF 1.4+ imaging model needed to rasterize
vector-content pages natively:

- object layer: tokenizer for the PDF COS syntax (dicts, arrays, names,
  literal/hex strings, numbers, indirect refs), a whole-file object scan
  (no xref needed — robust against linearized/garbage xref tables), page
  tree walk with attribute inheritance, Flate stream decoding;
- content streams: full graphics-state machine (q/Q, cm, colors in
  gray/RGB/CMYK), path construction (m l c v y re h) with cubic Bezier
  flattening, path painting (f f* B B* b b* S s n) via a vectorized
  scanline winding-number fill (nonzero + even-odd), stroking as
  per-segment quads with square joins, W/W* clipping as raster masks,
  image and form XObjects (Do) under arbitrary affine placement, and the
  text operators (BT..ET, Tf/Tc/Tw/Tz/TL/Ts/Tr, Td/TD/Tm/T*, Tj/TJ/'/");
- device: grayscale uint8, white background, one array per page at a
  caller-chosen dpi (default 300, matching the reference).

Documented approximations (all irrelevant downstream of binarization):
no anti-aliasing (pixel-center coverage), round joins/caps approximated
by squares, dash patterns ignored, shading patterns ignored. Text is
rendered with the engine's deterministic procedural font
(kernels/glyphs.py) — this snapshot has no font files and PDFs using the
standard-14 fonts do not embed glyph programs, so any from-scratch
renderer must synthesize glyph shapes; using the corpus font makes the
full rasterize->segment->recognize loop exactly testable. Strings decode
as UTF-8 when valid (the convention of this engine's own writer,
sources/pdf.write_vector_pdf), else latin-1.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


# --------------------------------------------------------------------------
# COS object layer
# --------------------------------------------------------------------------


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover
        return f"Ref({self.num})"


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # '%' comment to EOL
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


def _parse_number(buf: bytes, i: int):
    j = i
    n = len(buf)
    while j < n and buf[j : j + 1] not in (b"",) and buf[j] not in _WS and buf[j] not in _DELIM:
        j += 1
    tok = buf[i:j]
    try:
        v = int(tok)
    except ValueError:
        v = float(tok)
    return v, j


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\x0c", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_lit_string(buf: bytes, i: int):
    # i points at '('
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                o = 0
                k = 0
                while k < 3 and i < n and 0x30 <= buf[i] <= 0x37:
                    o = o * 8 + (buf[i] - 0x30)
                    i += 1
                    k += 1
                out.append(o & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(buf: bytes, i: int):
    j = buf.find(b">", i)
    if j < 0:
        j = len(buf)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


def _parse_name(buf: bytes, i: int):
    j = i + 1
    n = len(buf)
    out = bytearray()
    while j < n and buf[j] not in _WS and buf[j] not in _DELIM:
        if buf[j] == 0x23 and j + 2 < n:  # #xx hex escape
            try:
                out.append(int(buf[j + 1 : j + 3], 16))
                j += 3
                continue
            except ValueError:
                pass
        out.append(buf[j])
        j += 1
    return out.decode("latin-1"), j


def parse_object(buf: bytes, i: int):
    """Parse one COS object at offset i -> (value, next_offset).

    Detects ``N G R`` indirect references (returned as Ref). Bare operator
    keywords (content streams) are returned as ("op", name) tuples.
    """
    i = _skip_ws(buf, i)
    if i >= len(buf):
        raise PdfError("eof")
    c = buf[i]
    if buf[i : i + 2] == b"<<":
        d = {}
        i += 2
        while True:
            i = _skip_ws(buf, i)
            if buf[i : i + 2] == b">>":
                return d, i + 2
            if buf[i] != 0x2F:
                raise PdfError(f"dict key at {i}")
            key, i = _parse_name(buf, i)
            val, i = parse_object(buf, i)
            d[key] = val
    if c == 0x3C:  # '<' hex string
        return _parse_hex_string(buf, i)
    if c == 0x28:  # '('
        return _parse_lit_string(buf, i)
    if c == 0x2F:  # '/'
        name, i = _parse_name(buf, i)
        return ("name", name), i
    if c == 0x5B:  # '['
        arr = []
        i += 1
        while True:
            i = _skip_ws(buf, i)
            if buf[i] == 0x5D:
                return arr, i + 1
            v, i = parse_object(buf, i)
            arr.append(v)
    if c in b"+-." or 0x30 <= c <= 0x39:
        v, j = _parse_number(buf, i)
        if isinstance(v, int) and v >= 0:
            # lookahead for "G R" (indirect ref)
            k = _skip_ws(buf, j)
            m = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])", buf[k : k + 24])
            if m:
                return Ref(v), k + m.end()
        return v, j
    # keyword
    j = i
    n = len(buf)
    while j < n and buf[j] not in _WS and buf[j] not in _DELIM:
        j += 1
    kw = buf[i:j]
    if kw == b"true":
        return True, j
    if kw == b"false":
        return False, j
    if kw == b"null":
        return None, j
    if not kw:
        raise PdfError(f"lex error at {i}")
    return ("op", kw.decode("latin-1")), j


_OBJ_HEAD = re.compile(rb"(\d+)\s+\d+\s+obj\b")


class Document:
    """Whole-file object scan (xref-free) + page-tree resolution.

    Objects packed into compressed object streams (/Type /ObjStm, PDF 1.5+
    — the default layout of modern producers like pdflatex/libreoffice)
    are expanded after the scan: the stream's First/N header gives (objnum,
    offset) pairs, the payload is plain COS syntax. Cross-reference
    streams themselves are unnecessary — the scan already finds every
    top-level object."""

    def __init__(self, data: bytes):
        self.objs: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        pending: list[tuple[int, dict, int]] = []
        for m in _OBJ_HEAD.finditer(data):
            num = int(m.group(1))
            try:
                val, j = parse_object(data, m.end())
            except (PdfError, IndexError):
                continue
            self.objs[num] = val
            sm = re.match(rb"\s*stream\r?\n", data[j : j + 16])
            if sm and isinstance(val, dict):
                pending.append((num, val, j + sm.end()))
        # slice stream payloads only AFTER the whole object table exists:
        # an indirect /Length (the pdftex convention, 'N 0 R') may point at
        # an object defined later in the file
        for num, val, start in pending:
            try:
                ln = self.resolve(val.get("Length"))
            except PdfError:
                ln = None
            if isinstance(ln, int) and data[start + ln : start + ln + 20].lstrip().startswith(
                b"endstream"
            ):
                raw = data[start : start + ln]
            else:
                end = data.find(b"endstream", start)
                raw = data[start : end if end >= 0 else len(data)]
                # the spec puts ONE EOL between stream data and the keyword
                # — strip at most that (rstrip would eat real 0x0A tail
                # bytes of a Flate stream)
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith((b"\n", b"\r")):
                    raw = raw[:-1]
            self.streams[num] = raw
        # second pass: expand /ObjStm containers (direct objects only —
        # a packed object never carries its own stream, per spec)
        for num, val in list(self.objs.items()):
            if not (isinstance(val, dict) and val.get("Type") == ("name", "ObjStm")):
                continue
            try:
                payload = self.stream_data(Ref(num))
                n = int(self.resolve(val.get("N", 0)))
                first = int(self.resolve(val.get("First", 0)))
                pairs = []
                i = 0
                for _ in range(max(0, min(n, 65536))):
                    onum, i = parse_object(payload, i)
                    off, i = parse_object(payload, i)
                    pairs.append((int(onum), int(off)))
                for onum, off in pairs:
                    if onum in self.objs:  # top-level definitions win
                        continue
                    obj, _ = parse_object(payload, first + off)
                    self.objs[onum] = obj
            except (PdfError, IndexError, ValueError, TypeError):
                continue

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            v = self.objs.get(v.num)
            seen += 1
            if seen > 32:
                raise PdfError("ref cycle")
        return v

    def stream_data(self, ref) -> bytes:
        num = ref.num if isinstance(ref, Ref) else None
        if num is None or num not in self.streams:
            return b""
        d = self.resolve(ref)
        raw = self.streams[num]
        filt = d.get("Filter") if isinstance(d, dict) else None
        filt = self.resolve(filt)
        names = []
        if isinstance(filt, tuple):
            names = [filt[1]]
        elif isinstance(filt, list):
            names = [self.resolve(f)[1] for f in filt if isinstance(self.resolve(f), tuple)]
        for name in names:
            if name == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise PdfError(f"bad Flate stream: {e}") from None
            elif name in ("ASCIIHexDecode",):
                hx = re.sub(rb"[^0-9A-Fa-f]", b"", raw.split(b">", 1)[0])
                if len(hx) % 2:
                    hx += b"0"
                raw = bytes.fromhex(hx.decode("ascii"))
            elif name == "DCTDecode":
                # terminal image filter: return the JPEG bytes verbatim —
                # _decode_image sniffs the SOI marker and runs the engine's
                # own baseline codec (kernels/jpeg.py)
                return raw
            else:
                raise PdfError(f"unsupported filter {name}")
        return raw

    def pages(self) -> list[dict]:
        """Page dicts in document order, with MediaBox/Resources inherited."""
        root = None
        for num, v in self.objs.items():
            if isinstance(v, dict) and v.get("Type") == ("name", "Catalog"):
                root = v
                break
        if root is None:
            raise PdfError("no Catalog")
        out: list[dict] = []

        def walk(node, inherited):
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            t = node.get("Type")
            if t == ("name", "Pages") or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)
            else:
                page = dict(inh)
                page.update(node)
                out.append(page)

        walk(root.get("Pages"), {})
        return out

    def content_bytes(self, page: dict) -> bytes:
        c = page.get("Contents")
        refs = c if isinstance(c, list) else [c]
        parts = []
        for r in refs:
            if isinstance(r, Ref):
                parts.append(self.stream_data(r))
        return b"\n".join(parts)


# --------------------------------------------------------------------------
# geometry helpers
# --------------------------------------------------------------------------

IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def mat_mul(m1, m2):
    """Apply m1 then m2 (PDF convention: row vectors, m = m1 x m2)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def mat_apply(m, x, y):
    a, b, c, d, e, f = m
    return a * x + c * y + e, b * x + d * y + f


def mat_inv(m):
    a, b, c, d, e, f = m
    det = a * d - b * c
    if abs(det) < 1e-12:
        raise PdfError("singular matrix")
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    return (ia, ib, ic, id_, -(e * ia + f * ic), -(e * ib + f * id_))


_BEZ_T = np.linspace(0.0, 1.0, 17)[1:]  # 16 segments per cubic


def _flatten_cubic(p0, p1, p2, p3):
    t = _BEZ_T
    mt = 1.0 - t
    xs = (
        mt**3 * p0[0] + 3 * mt**2 * t * p1[0] + 3 * mt * t**2 * p2[0] + t**3 * p3[0]
    )
    ys = (
        mt**3 * p0[1] + 3 * mt**2 * t * p1[1] + 3 * mt * t**2 * p2[1] + t**3 * p3[1]
    )
    return list(zip(xs.tolist(), ys.tolist()))


# --------------------------------------------------------------------------
# scanline winding fill
# --------------------------------------------------------------------------


def fill_mask(h: int, w: int, subpaths: list[list[tuple]], evenodd: bool = False) -> np.ndarray:
    """Rasterize closed polygons (device coords) to a boolean coverage mask.

    Pixel-center rule: pixel (i, j) is covered iff its center (j+.5, i+.5)
    is inside under the requested winding rule. One signed crossing
    accumulator per scanline + cumsum gives the winding number for every
    pixel in O(edges x spanned rows + H*W).
    """
    acc = np.zeros((h, w + 1), dtype=np.int32)
    for pts in subpaths:
        if len(pts) < 3:
            continue
        P = np.asarray(pts, dtype=np.float64)
        if not np.allclose(P[0], P[-1]):
            P = np.vstack([P, P[:1]])
        x1, y1 = P[:-1, 0], P[:-1, 1]
        x2, y2 = P[1:, 0], P[1:, 1]
        nz = y1 != y2
        if not nz.any():
            continue
        x1, y1, x2, y2 = x1[nz], y1[nz], x2[nz], y2[nz]
        dirs = np.where(y2 > y1, np.int32(1), np.int32(-1))
        ylo = np.minimum(y1, y2)
        yhi = np.maximum(y1, y2)
        i0 = np.maximum(np.ceil(ylo - 0.5), 0.0).astype(np.int64)
        i1 = np.minimum(np.ceil(yhi - 0.5) - 1.0, float(h - 1)).astype(np.int64)
        cnt = i1 - i0 + 1
        keep = cnt > 0
        if not keep.any():
            continue
        x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
        dirs, i0, cnt = dirs[keep], i0[keep], cnt[keep]
        idx = np.repeat(np.arange(len(i0)), cnt)
        # concatenated aranges: rows = i0[e] .. i0[e]+cnt[e]-1 per edge e
        offs = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        rows = i0[idx] + offs
        yc = rows + 0.5
        t = (yc - y1[idx]) / (y2[idx] - y1[idx])
        xs = x1[idx] + t * (x2[idx] - x1[idx])
        cols = np.clip(np.ceil(xs - 0.5), 0, w).astype(np.int64)
        np.add.at(acc, (rows, cols), dirs[idx])
    wind = np.cumsum(acc, axis=1)[:, :w]
    if evenodd:
        return (wind % 2) != 0
    return wind != 0


# --------------------------------------------------------------------------
# content-stream interpreter
# --------------------------------------------------------------------------


def _to_gray(ops: list) -> float:
    """Color operands -> gray level in [0,1] (luminance for RGB/CMYK)."""
    nums = [float(v) for v in ops if isinstance(v, (int, float))]
    if len(nums) >= 4:  # CMYK
        c, m, y, k = nums[-4:]
        r, g, b = (1 - min(1, c + k)), (1 - min(1, m + k)), (1 - min(1, y + k))
        return 0.299 * r + 0.587 * g + 0.114 * b
    if len(nums) == 3:
        r, g, b = nums
        return 0.299 * r + 0.587 * g + 0.114 * b
    if len(nums) == 1:
        return nums[0]
    return 0.0


class _GState:
    __slots__ = ("ctm", "fill", "stroke", "lw", "clip")

    def __init__(self, ctm, clip):
        self.ctm = ctm
        self.fill = 0.0
        self.stroke = 0.0
        self.lw = 1.0
        self.clip = clip  # bool mask or None (= whole page)

    def copy(self):
        g = _GState(self.ctm, self.clip)
        g.fill, g.stroke, g.lw = self.fill, self.stroke, self.lw
        return g


# same admission cap as the page pipeline (stages.MAX_PAGE_PX, the
# reference's Image.MAX_IMAGE_PIXELS guard, kraken/kraken.py:62): a hostile
# MediaBox must not allocate an unbounded canvas
MAX_CANVAS_PX = 20000 * 20000


class Raster:
    def __init__(self, doc: Document, page: dict, dpi: float):
        self.doc = doc
        mb = doc.resolve(page.get("MediaBox", [0, 0, 612, 792]))
        if not (isinstance(mb, list) and len(mb) == 4):
            raise PdfError("bad MediaBox")
        x0, y0, x1, y1 = (float(doc.resolve(v)) for v in mb)
        s = dpi / 72.0
        self.w = max(1, int(round((x1 - x0) * s)))
        self.h = max(1, int(round((y1 - y0) * s)))
        if self.w * self.h > MAX_CANVAS_PX:
            raise PdfError(f"page exceeds admission cap: {self.w}x{self.h}")
        self.canvas = np.full((self.h, self.w), 255, dtype=np.uint8)
        base = (s, 0.0, 0.0, -s, -x0 * s, y1 * s)
        self.gs = _GState(base, None)
        self.stack: list[_GState] = []
        self.resources = doc.resolve(page.get("Resources")) or {}
        # path state (device coords)
        self.subpaths: list[list[tuple]] = []
        self.cur: list[tuple] = []
        self.start = (0.0, 0.0)
        self.pending_clip: str | None = None
        # text state
        self.tm = IDENTITY
        self.tlm = IDENTITY
        self.tfs = 0.0
        self.tc = 0.0
        self.tw = 0.0
        self.tz = 1.0
        self.tl = 0.0
        self.ts = 0.0
        self.tr = 0

    # -- painting ----------------------------------------------------------

    def _paint(self, mask: np.ndarray, gray: float):
        if self.gs.clip is not None:
            mask = mask & self.gs.clip
        self.canvas[mask] = int(round(max(0.0, min(1.0, gray)) * 255))

    def _close_cur(self):
        if len(self.cur) >= 2:
            self.subpaths.append(self.cur)
        self.cur = []

    def _all_subpaths(self):
        sps = list(self.subpaths)
        if len(self.cur) >= 2:
            sps.append(self.cur)
        return sps

    def _fill(self, evenodd: bool):
        sps = self._all_subpaths()
        if sps:
            self._paint(fill_mask(self.h, self.w, sps, evenodd), self.gs.fill)

    def _stroke(self):
        lw_dev = self.gs.lw * np.sqrt(
            abs(self.gs.ctm[0] * self.gs.ctm[3] - self.gs.ctm[1] * self.gs.ctm[2])
        )
        hwd = max(lw_dev, 1.0) / 2.0
        quads: list[list[tuple]] = []
        for pts in self._all_subpaths():
            P = np.asarray(pts, dtype=np.float64)
            for k in range(len(P) - 1):
                (xa, ya), (xb, yb) = P[k], P[k + 1]
                dx, dy = xb - xa, yb - ya
                ln = float(np.hypot(dx, dy))
                if ln < 1e-9:
                    continue
                nx, ny = -dy / ln * hwd, dx / ln * hwd
                quads.append(
                    [(xa + nx, ya + ny), (xb + nx, yb + ny), (xb - nx, yb - ny), (xa - nx, ya - ny)]
                )
            # square joins at interior vertices (round-join approximation)
            for k in range(1, len(P) - 1):
                x, y = P[k]
                quads.append(
                    [(x - hwd, y - hwd), (x + hwd, y - hwd), (x + hwd, y + hwd), (x - hwd, y + hwd)]
                )
        if quads:
            self._paint(fill_mask(self.h, self.w, quads, evenodd=False), self.gs.stroke)

    def _end_path(self):
        if self.pending_clip is not None:
            sps = self._all_subpaths()
            m = fill_mask(self.h, self.w, sps, self.pending_clip == "W*") if sps else np.zeros(
                (self.h, self.w), bool
            )
            self.gs.clip = m if self.gs.clip is None else (self.gs.clip & m)
            self.pending_clip = None
        self.subpaths = []
        self.cur = []

    # -- images ------------------------------------------------------------

    def _decode_image(self, d: dict, data: bytes):
        w = int(self.doc.resolve(d.get("Width", 0)))
        h = int(self.doc.resolve(d.get("Height", 0)))
        if w <= 0 or h <= 0:
            return None
        if data[:2] == b"\xff\xd8":  # DCTDecode payload (JPEG SOI)
            from .jpeg import decode_jpeg

            try:
                img = decode_jpeg(data)
            except ValueError:
                return None
            if img.ndim == 3:
                img = (
                    0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
                ).astype(np.uint8)
            return img, None
        bpc = int(self.doc.resolve(d.get("BitsPerComponent", 8)))
        cs = self.doc.resolve(d.get("ColorSpace"))
        chans = 3 if cs == ("name", "DeviceRGB") else 1
        if self.doc.resolve(d.get("ImageMask")) is True:
            bpc, chans = 1, 1
        if bpc == 8:
            need = w * h * chans
            if len(data) < need:
                return None
            arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, chans)
            if chans == 3:
                arr = (
                    0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
                ).astype(np.uint8)
            else:
                arr = arr[..., 0]
            return arr, None
        if bpc == 1:
            stride = (w + 7) // 8
            if len(data) < stride * h:
                return None
            bits = np.unpackbits(
                np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride), axis=1
            )[:, :w]
            if self.doc.resolve(d.get("ImageMask")) is True:
                # 1 = masked-out by default Decode [0 1]; sample=0 paints
                dec = self.doc.resolve(d.get("Decode"))
                paint = bits.astype(bool)
                if not (isinstance(dec, list) and dec[:1] == [1]):
                    paint = ~paint
                return None, paint
            return (bits * 255).astype(np.uint8), None
        return None

    def _place_image(self, gray: np.ndarray | None, paint_mask: np.ndarray | None):
        """Map the unit square through the CTM; inverse-sample with nearest
        neighbor (image row 0 at the TOP edge, y=1, per the PDF convention)."""
        m = self.gs.ctm
        corners = [mat_apply(m, x, y) for x, y in ((0, 0), (1, 0), (0, 1), (1, 1))]
        xs = [p[0] for p in corners]
        ys = [p[1] for p in corners]
        j0 = max(0, int(np.floor(min(xs))))
        j1 = min(self.w, int(np.ceil(max(xs))))
        i0 = max(0, int(np.floor(min(ys))))
        i1 = min(self.h, int(np.ceil(max(ys))))
        if j1 <= j0 or i1 <= i0:
            return
        inv = mat_inv(m)
        jj, ii = np.meshgrid(
            np.arange(j0, j1, dtype=np.float64) + 0.5,
            np.arange(i0, i1, dtype=np.float64) + 0.5,
        )
        a, b, c, d, e, f = inv
        u = a * jj + c * ii + e
        v = b * jj + d * ii + f
        inside = (u >= 0) & (u < 1) & (v > 0) & (v <= 1)
        src = gray if gray is not None else paint_mask
        sh, sw = src.shape
        col = np.clip((u * sw).astype(np.int64), 0, sw - 1)
        row = np.clip(((1.0 - v) * sh).astype(np.int64), 0, sh - 1)
        region = self.canvas[i0:i1, j0:j1]
        if self.gs.clip is not None:
            inside = inside & self.gs.clip[i0:i1, j0:j1]
        if gray is not None:
            region[inside] = gray[row, col][inside]
        else:
            sel = inside & paint_mask[row, col]
            region[sel] = int(round(max(0.0, min(1.0, self.gs.fill)) * 255))

    def _do_xobject(self, name: str):
        xo = self.doc.resolve(self.resources.get("XObject")) or {}
        ref = xo.get(name)
        if ref is None:
            return
        d = self.doc.resolve(ref)
        if not isinstance(d, dict):
            return
        sub = d.get("Subtype")
        if sub == ("name", "Image"):
            try:
                data = self.doc.stream_data(ref)
            except PdfError:
                return
            dec = self._decode_image(d, data)
            if dec is not None:
                self._place_image(*dec)
        elif sub == ("name", "Form"):
            saved_res, saved_gs = self.resources, self.gs.copy()
            saved_stack = list(self.stack)
            if "Resources" in d:
                self.resources = self.doc.resolve(d["Resources"]) or {}
            mtx = self.doc.resolve(d.get("Matrix"))
            if isinstance(mtx, list) and len(mtx) == 6:
                self.gs.ctm = mat_mul(tuple(float(v) for v in mtx), self.gs.ctm)
            try:
                self.run(self.doc.stream_data(ref))
            finally:
                self.resources, self.gs, self.stack = saved_res, saved_gs, saved_stack

    # -- text --------------------------------------------------------------

    def _show_text(self, raw: bytes):
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.decode("latin-1")
        from . import glyphs

        for ch in text:
            cp = ord(ch)
            w_adv = (self.tfs + self.tc + (self.tw if cp == 0x20 else 0.0)) * self.tz
            if cp != 0x20 and self.tr != 3 and self.tfs > 0:
                bm = glyphs.glyph_bitmap(cp)
                gm = mat_mul(
                    (self.tfs * self.tz, 0.0, 0.0, self.tfs, 0.0, self.ts),
                    mat_mul(self.tm, self.gs.ctm),
                )
                saved = self.gs.ctm
                self.gs.ctm = gm
                self._place_image(None, bm.astype(bool))
                self.gs.ctm = saved
            self.tm = mat_mul((1.0, 0.0, 0.0, 1.0, w_adv, 0.0), self.tm)

    # -- interpreter -------------------------------------------------------

    def run(self, content: bytes):
        i = 0
        n = len(content)
        st: list = []
        while i < n:
            i = _skip_ws(content, i)
            if i >= n:
                break
            try:
                v, i = parse_object(content, i)
            except (PdfError, IndexError):
                break
            if not (isinstance(v, tuple) and len(v) == 2 and v[0] == "op"):
                st.append(v[1] if isinstance(v, tuple) and v[0] == "name" else v)
                continue
            op = v[1]
            try:
                i = self._exec(op, st, content, i)
            except (PdfError, IndexError, ValueError, ZeroDivisionError):
                pass
            st.clear()

    def _exec(self, op: str, st: list, content: bytes, i: int) -> int:
        g = self.gs
        if op == "q":
            self.stack.append(g.copy())
        elif op == "Q":
            if self.stack:
                self.gs = self.stack.pop()
        elif op == "cm" and len(st) >= 6:
            g.ctm = mat_mul(tuple(float(x) for x in st[-6:]), g.ctm)
        elif op == "w" and st:
            g.lw = float(st[-1])
        elif op in ("g", "rg", "k", "sc", "scn", "cs"):
            if op == "cs":
                pass
            else:
                g.fill = _to_gray(st)
        elif op in ("G", "RG", "K", "SC", "SCN", "CS"):
            if op != "CS":
                g.stroke = _to_gray(st)
        elif op == "m" and len(st) >= 2:
            self._close_cur()
            p = mat_apply(g.ctm, float(st[-2]), float(st[-1]))
            self.cur = [p]
            self.start = p
        elif op == "l" and len(st) >= 2:
            self.cur.append(mat_apply(g.ctm, float(st[-2]), float(st[-1])))
        elif op in ("c", "v", "y") and self.cur:
            p0 = self.cur[-1]
            if op == "c" and len(st) >= 6:
                p1 = mat_apply(g.ctm, float(st[-6]), float(st[-5]))
                p2 = mat_apply(g.ctm, float(st[-4]), float(st[-3]))
                p3 = mat_apply(g.ctm, float(st[-2]), float(st[-1]))
            elif op == "v" and len(st) >= 4:
                p1 = p0
                p2 = mat_apply(g.ctm, float(st[-4]), float(st[-3]))
                p3 = mat_apply(g.ctm, float(st[-2]), float(st[-1]))
            elif op == "y" and len(st) >= 4:
                p1 = mat_apply(g.ctm, float(st[-4]), float(st[-3]))
                p2 = mat_apply(g.ctm, float(st[-2]), float(st[-1]))
                p3 = p2
            else:
                return i
            self.cur.extend(_flatten_cubic(p0, p1, p2, p3))
        elif op == "h" and self.cur:
            self.cur.append(self.start)
        elif op == "re" and len(st) >= 4:
            x, y, rw, rh = (float(v) for v in st[-4:])
            self._close_cur()
            pts = [
                mat_apply(g.ctm, x, y),
                mat_apply(g.ctm, x + rw, y),
                mat_apply(g.ctm, x + rw, y + rh),
                mat_apply(g.ctm, x, y + rh),
            ]
            self.subpaths.append(pts + [pts[0]])
            self.start = pts[0]
        elif op in ("f", "F", "f*"):
            self._fill(op == "f*")
            self._end_path()
        elif op in ("B", "B*", "b", "b*"):
            if op in ("b", "b*") and self.cur:
                self.cur.append(self.start)
            self._fill(op in ("B*", "b*"))
            self._stroke()
            self._end_path()
        elif op in ("S", "s"):
            if op == "s" and self.cur:
                self.cur.append(self.start)
            self._stroke()
            self._end_path()
        elif op == "n":
            self._end_path()
        elif op in ("W", "W*"):
            self.pending_clip = op
        elif op == "Do" and st and isinstance(st[-1], str):
            self._do_xobject(st[-1])
        elif op == "BI":
            # inline image: skip to the EI delimiter (binary-safe-ish)
            m = re.search(rb"(?:^|[\x00\t\n\x0c\r ])EI(?=[\x00\t\n\x0c\r ]|$)", content[i:])
            return i + (m.end() if m else len(content) - i)
        elif op == "BT":
            self.tm = self.tlm = IDENTITY
        elif op == "ET":
            pass
        elif op == "Tf" and st:
            self.tfs = float(st[-1])
        elif op == "Tc" and st:
            self.tc = float(st[-1])
        elif op == "Tw" and st:
            self.tw = float(st[-1])
        elif op == "Tz" and st:
            self.tz = float(st[-1]) / 100.0
        elif op == "TL" and st:
            self.tl = float(st[-1])
        elif op == "Ts" and st:
            self.ts = float(st[-1])
        elif op == "Tr" and st:
            self.tr = int(st[-1])
        elif op == "Td" and len(st) >= 2:
            self.tlm = mat_mul((1, 0, 0, 1, float(st[-2]), float(st[-1])), self.tlm)
            self.tm = self.tlm
        elif op == "TD" and len(st) >= 2:
            self.tl = -float(st[-1])
            self.tlm = mat_mul((1, 0, 0, 1, float(st[-2]), float(st[-1])), self.tlm)
            self.tm = self.tlm
        elif op == "Tm" and len(st) >= 6:
            self.tm = self.tlm = tuple(float(x) for x in st[-6:])
        elif op == "T*":
            self.tlm = mat_mul((1, 0, 0, 1, 0.0, -self.tl), self.tlm)
            self.tm = self.tlm
        elif op == "Tj" and st and isinstance(st[-1], bytes):
            self._show_text(st[-1])
        elif op == "'" and st and isinstance(st[-1], bytes):
            self.tlm = mat_mul((1, 0, 0, 1, 0.0, -self.tl), self.tlm)
            self.tm = self.tlm
            self._show_text(st[-1])
        elif op == '"' and len(st) >= 3 and isinstance(st[-1], bytes):
            self.tw, self.tc = float(st[-3]), float(st[-2])
            self.tlm = mat_mul((1, 0, 0, 1, 0.0, -self.tl), self.tlm)
            self.tm = self.tlm
            self._show_text(st[-1])
        elif op == "TJ" and st and isinstance(st[-1], list):
            for el in st[-1]:
                if isinstance(el, bytes):
                    self._show_text(el)
                elif isinstance(el, (int, float)):
                    self.tm = mat_mul(
                        (1, 0, 0, 1, -float(el) / 1000.0 * self.tfs * self.tz, 0.0), self.tm
                    )
        # every other operator (gs, ri, i, j, J, M, d, sh, BMC/BDC/EMC, ...)
        # consumes its operands and is a documented no-op
        return i


def rasterize_pdf(data: bytes, dpi: float = 300.0) -> list[np.ndarray]:
    """PDF bytes -> one grayscale uint8 array per page at the given dpi
    (reference behavior: pyvips render at 300 dpi, kraken/kraken.py:372-394)."""
    doc = Document(data)
    out = []
    for page in doc.pages():
        r = Raster(doc, page, dpi)
        r.run(doc.content_bytes(page))
        canvas = r.canvas
        # /Rotate (inherited, clockwise display rotation in 90deg steps):
        # viewers/pyvips emit the rotated raster, so must we
        try:
            rot = int(doc.resolve(page.get("Rotate", 0)) or 0) % 360
        except (PdfError, TypeError, ValueError):
            rot = 0
        if rot in (90, 180, 270):
            canvas = np.ascontiguousarray(np.rot90(canvas, k=-(rot // 90)))
        out.append(canvas)
    return out
