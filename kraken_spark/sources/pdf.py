"""Multi-page document ingestion: one input blob -> N page rows.

The reference rasterizes PDFs at 300 dpi via pyvips, emitting one temp PNG
per page (/root/reference/kraken/kraken.py:363-405). This container ships
no pyvips/poppler, so PDF support splits in two native paths:

- **Image PDFs** (the scanned-document case kraken actually targets):
  handled natively. `write_pdf` emits a minimal valid PDF 1.4 with one
  Flate-encoded DeviceGray/DeviceRGB image XObject per page, and
  `extract_pdf_images` parses image XObjects back out of any PDF whose
  page images are raw Flate (no renderer needed — the pixels ARE the
  page). `unpack_pages` routes `%PDF-` blobs through it.
- **Vector-content PDFs** rasterize natively through the from-scratch
  content-stream renderer (kernels/pdfraster.py) at the reference's
  300 dpi — or at 72 dpi (1 unit = 1 px) when the producer marker
  ``%kraken-px`` is present, which is what `write_vector_pdf` emits so
  the engine's own vector pages rasterize pixel-exactly back into
  corpus geometry.

The Spark-side plumbing — the blob -> ARRAY<page> explode, schema,
batching — is shared and also tested via the deterministic ``MPGZ``
container (a length-prefixed list of PNG payloads).
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

MAGIC = b"MPGZ"


def write_pdf(pages: list, jpeg_quality: int | None = None) -> bytes:
    """Minimal valid PDF 1.4: one page per grayscale/RGB uint8 array, the
    samples Flate-compressed into an image XObject scaled to the MediaBox
    (the inverse of the reference's rasterize-to-PNG step). With
    ``jpeg_quality`` set, grayscale pages are DCTDecode (baseline JPEG via
    kernels/jpeg.py) — the dominant real-world scanned-PDF encoding."""
    objs: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kid_refs = " ".join(f"{3 + 3 * i} 0 R" for i in range(len(pages)))
    objs.append(
        f"<< /Type /Pages /Kids [{kid_refs}] /Count {len(pages)} >>".encode()
    )
    for i, img in enumerate(pages):
        h, w = img.shape[:2]
        rgb = img.ndim == 3
        page_n, content_n, image_n = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Resources << /XObject << /Im0 {image_n} 0 R >> >> "
                f"/Contents {content_n} 0 R >>"
            ).encode()
        )
        draw = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(draw), draw)
        )
        if jpeg_quality is not None and not rgb:
            from ..kernels.jpeg import encode_jpeg

            data = encode_jpeg(img, jpeg_quality)
            filt = "DCTDecode"
        else:
            data = zlib.compress(img.tobytes(), 6)
            filt = "FlateDecode"
        objs.append(
            (
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /Device{'RGB' if rgb else 'Gray'} "
                f"/BitsPerComponent 8 /Filter /{filt} "
                f"/Length {len(data)} >>\nstream\n"
            ).encode()
            + data
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


PX_MARKER = b"%kraken-px"


def _escape_pdf_string(raw: bytes) -> bytes:
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def write_vector_pdf(pages: list[dict]) -> bytes:
    """Vector-content PDF 1.4: text drawn via content-stream text operators
    (no image XObjects — requires a real rasterizer to read back).

    Each page dict: ``{"width": W, "height": H, "lines": [{"visual": str,
    "x0": int, "y0": int}]}`` in PIXEL units (y0 = ink-top image row, the
    corpus renderer's contract, kernels/render.py). Glyphs are shown at
    size 16 with char-spacing 16 (advance = CELL_W = 32) so rasterizing at
    72 dpi (the ``%kraken-px`` producer marker) reproduces the corpus page
    ink pixel-for-pixel. Strings are UTF-8 (the engine's documented
    convention; real PDFs would carry font /Encoding + ToUnicode maps)."""
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kid_refs = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(
        f"<< /Type /Pages /Kids [{kid_refs}] /Count {len(pages)} >>".encode()
    )
    for i, pg in enumerate(pages):
        w, h = int(pg["width"]), int(pg["height"])
        content_n = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Resources << /Font << /F0 << /Type /Font /Subtype /Type1 "
                f"/BaseFont /KrakenSparkMono >> >> >> "
                f"/Contents {content_n} 0 R >>"
            ).encode()
        )
        parts = [b"BT /F0 16 Tf 16 Tc"]
        for ln in pg.get("lines", []):
            x0, y0 = int(ln["x0"]), int(ln["y0"])
            s = _escape_pdf_string(str(ln["visual"]).encode("utf-8"))
            parts.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x0, h - y0 - 16, s))
        parts.append(b"ET")
        draw = zlib.compress(b"\n".join(parts), 6)
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(draw)
            + draw
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n" + PX_MARKER + b"\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


_OBJ_RE = re.compile(rb"\d+\s+0\s+obj\b(.*?)\bendobj", re.DOTALL)
_NUM_KEY = lambda key, d: re.search(rb"/" + key + rb"\s+(\d+)", d)  # noqa: E731


def extract_pdf_images(data: bytes) -> list:
    """Image XObjects (raw Flate or uncompressed samples) -> uint8 arrays,
    in document order. Returns [] when the PDF has no such images (vector
    content — rasterizer territory)."""
    import numpy as np

    pages = []
    for m in _OBJ_RE.finditer(data):
        body = m.group(1)
        if b"/Subtype" not in body or b"/Image" not in body:
            continue
        wm, hm = _NUM_KEY(b"Width", body), _NUM_KEY(b"Height", body)
        if not wm or not hm:
            continue
        w, h = int(wm.group(1)), int(hm.group(1))
        channels = 3 if b"/DeviceRGB" in body else 1
        bpc = _NUM_KEY(b"BitsPerComponent", body)
        if bpc and int(bpc.group(1)) != 8:
            continue  # unsupported depth: skip, don't crash
        sm = re.search(rb"stream\r?\n", body)
        if not sm:
            continue
        start = sm.end()
        lm = _NUM_KEY(b"Length", body)
        if lm:
            raw = body[start : start + int(lm.group(1))]
        else:
            end = body.rfind(b"endstream")
            raw = body[start:end].rstrip(b"\r\n")
        if b"/DCTDecode" in body:
            # JPEG-compressed image (the dominant scanned-PDF encoding):
            # own baseline codec, kernels/jpeg.py
            from ..kernels.jpeg import decode_jpeg

            try:
                pages.append(decode_jpeg(raw))
            except ValueError:
                continue
            continue
        if b"/FlateDecode" in body:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        if len(raw) < w * h * channels:
            continue
        arr = np.frombuffer(raw[: w * h * channels], dtype=np.uint8)
        pages.append(arr.reshape((h, w, 3) if channels == 3 else (h, w)))
    return pages


def pack_multipage(pages: list[bytes]) -> bytes:
    """Build a deterministic multi-page container from PNG page payloads."""
    out = [MAGIC, struct.pack(">I", len(pages))]
    for p in pages:
        out.append(struct.pack(">I", len(p)))
        out.append(p)
    return b"".join(out)


def unpack_pages(data: bytes) -> list[bytes]:
    """blob -> list of per-page PNG payloads.

    - MPGZ container: length-prefixed split (deterministic fake of the
      rasterizer output).
    - %PDF with image XObjects (scanned-document PDFs): pages extracted
      natively via extract_pdf_images and re-encoded as PNG payloads.
    - %PDF with only vector content: rasterized by the from-scratch
      content-stream renderer (kernels/pdfraster.py) at 300 dpi — the
      reference's pyvips setting (kraken/kraken.py:372-394) — or at
      72 dpi (1 unit = 1 px) when the ``%kraken-px`` producer marker
      is present.
    - anything else: treated as a single-page payload.
    """
    if data[:4] == MAGIC:
        (n,) = struct.unpack(">I", data[4:8])
        pages = []
        pos = 8
        for _ in range(n):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            pos += 4
            pages.append(bytes(data[pos : pos + ln]))
            pos += ln
        return pages
    if data[:5] == b"%PDF-":
        from ..kernels import png

        imgs = extract_pdf_images(data)
        if not imgs:
            from ..kernels.pdfraster import rasterize_pdf

            dpi = 72.0 if PX_MARKER in data[:64] else 300.0
            imgs = rasterize_pdf(data, dpi=dpi)
        return [png.encode_png(im) for im in imgs]
    return [bytes(data)]


def explode_pages(docs: DataFrame) -> DataFrame:
    """documents(url, html=multi-page blob, ...) -> one row per page with
    url suffixed '#p{idx}' — the Spark form of the reference's one-temp-PNG-
    per-page expansion.

    Undecodable blobs (malformed PDFs, truncated containers) emit ONE
    sentinel row (page_idx=-1, html=garbage bytes) instead of vanishing:
    downstream extraction commits it as a guard_tripped row, so a resumed
    job's anti-join (pipeline.remaining_documents) sees the url as done and
    converges — a silently-dropped url would be re-selected forever."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("page_idx", pa.int32()),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ]
        )
        for batch in batches:
            names = batch.schema.names
            out = []
            for r in batch.to_pylist():
                try:
                    pages = unpack_pages(r["html"] or b"")
                except Exception:
                    pages = None
                if pages is None or not pages:
                    out.append(
                        {
                            "url": f"{r['url']}#p-1",
                            "page_idx": -1,
                            "html": b"",
                            "text": r.get("text") if "text" in names else None,
                            "lang": r.get("lang") if "lang" in names else None,
                        }
                    )
                    continue
                for i, p in enumerate(pages):
                    out.append(
                        {
                            "url": f"{r['url']}#p{i}",
                            "page_idx": i,
                            "html": p,
                            "text": r.get("text") if "text" in names else None,
                            "lang": r.get("lang") if "lang" in names else None,
                        }
                    )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    return docs.mapInArrow(
        fn, schema="url string, page_idx int, html binary, text string, lang string"
    )
