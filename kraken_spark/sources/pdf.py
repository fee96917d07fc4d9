"""Multi-page document ingestion: one input blob -> N page rows.

The reference rasterizes PDFs at 300 dpi via pyvips, emitting one temp PNG
per page (/root/reference/kraken/kraken.py:363-405). This container ships
no PDF rasterizer (no pyvips/poppler), so the rasterizer itself is STUBBED
behind an import-try + NotImplementedError, while the Spark-side plumbing —
the blob -> ARRAY<page> explode, schema, batching — is real and tested via
a deterministic multi-page container format (magic ``MPGZ``: a length-
prefixed list of PNG payloads) that stands in for rasterized PDF output.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

MAGIC = b"MPGZ"


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
    - %PDF: requires a rasterizer; raises NotImplementedError unless pyvips
      is importable (it is not in this container) — the clearly-marked stub
      the Spark plumbing is tested around.
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
        try:
            import pyvips  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "PDF rasterization requires pyvips (the reference renders at "
                "300 dpi, kraken/kraken.py:372-394); not available in this "
                "container — ship pages pre-rasterized or as MPGZ"
            ) from None
        raise NotImplementedError("pyvips rasterization path not wired")
    return [bytes(data)]


def explode_pages(docs: DataFrame) -> DataFrame:
    """documents(url, html=multi-page blob, ...) -> one row per page with
    url suffixed '#p{idx}' — the Spark form of the reference's one-temp-PNG-
    per-page expansion. Unreadable blobs yield zero rows (logged upstream
    by the extraction guard)."""

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
                except (NotImplementedError, Exception):
                    pages = []
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
