"""WARC (ISO 28500) ingestion: Common-Crawl's native container format.

The north-star input is an Iceberg table of Common-Crawl-style pages;
the upstream of such a table is WARC — one gzip member per record, each
record a header block (WARC/1.0 named fields) plus a payload that is
usually a full HTTP response. This module implements the from-scratch
reader/writer pair:

- `iter_warc_records(data)`: streams records out of a .warc or .warc.gz
  blob (member-per-record gzip, the Common-Crawl layout, handled with
  zlib raw streams so trailing members keep their boundaries; plain
  concatenated-record WARC works too).
- `warc_to_documents(data)`: response/resource records -> rows shaped
  exactly like the `documents` input table (url, warc_ts, html payload,
  lang from Content-Language when present) — HTTP headers stripped,
  chunked transfer-encoding decoded, gzip Content-Encoding inflated.
- `write_warc_gz(rows)`: the fixture writer (member-per-record, full
  HTTP response wrapping), so every parse path round-trips.
- `explode_warc(df)`: Spark face — DataFrame of (path, warc binary) ->
  one documents-shaped row per response record via mapInArrow.
- `write_wet_gz(rows)` / `write_wet_shards(df, dir)`: the WET sink —
  Common-Crawl's extracted-text artifact (WARC `conversion` records,
  text/plain payloads), one shard per partition, executor-written.

Scale shape: Common-Crawl splits its corpus into ~1 GB .warc.gz files
(tens of thousands per crawl); one task per file is the natural
partitioning, so the Spark reader parallelizes across files and streams
within a file — no intra-file split is needed at 100 TB because file
count >> core count.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream decompressed."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("warc: bad gzip member")
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(data[pos:]) + d.flush()
        except zlib.error:
            if pos == 0:
                raise ValueError("warc: corrupt gzip member") from None
            return  # truncated/corrupt tail member: keep earlier records
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block -> {lowercased-name: value} with continuation folding."""
    out: dict[str, str] = {}
    last = None
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:
            out[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, val = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        out[last] = val.strip().decode("latin-1")
    return out


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """WARC bytes (.warc or .warc.gz) -> (headers, payload) per record."""
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _gunzip_members(data)
    else:
        chunks = iter([data])
    for chunk in chunks:
        pos = 0
        n = len(chunk)
        while pos < n:
            start = chunk.find(b"WARC/", pos)
            if start < 0:
                break
            hdr_end = chunk.find(CRLF + CRLF, start)
            if hdr_end < 0:
                break
            headers = _parse_headers(chunk[start:hdr_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break
            body_at = hdr_end + 4
            payload = chunk[body_at : body_at + length]
            if len(payload) < length:
                break  # truncated record: stop, keep what we parsed
            yield headers, payload
            pos = body_at + length


def _split_http(payload: bytes) -> tuple[dict[str, str], bytes]:
    """HTTP response payload -> (headers, decoded body). Handles chunked
    transfer-encoding and gzip/deflate content-encoding; a payload that
    is not an HTTP message comes back with empty headers, body as-is."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return {}, payload
    headers = _parse_headers(payload[:sep])
    body = payload[sep + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        out = bytearray()
        pos = 0
        while pos < len(body):
            line_end = body.find(CRLF, pos)
            if line_end < 0:
                break
            try:
                size = int(body[pos:line_end].split(b";")[0], 16)
            except ValueError:
                break
            if size == 0:
                break
            out += body[line_end + 2 : line_end + 2 + size]
            pos = line_end + 2 + size + 2
        body = bytes(out)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip"):
        try:
            body = zlib.decompress(body, wbits=zlib.MAX_WBITS | 16)
        except zlib.error:
            pass  # keep raw bytes; downstream sniffing guards
    elif enc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, wbits=-zlib.MAX_WBITS)
            except zlib.error:
                pass
    return headers, body


def warc_to_documents(data: bytes) -> list[dict]:
    """WARC blob -> documents-shaped dicts: url, warc_ts (ISO string from
    WARC-Date), html (payload body bytes), lang (Content-Language primary
    subtag or None). Only response/resource/conversion records carry
    page content; request/metadata/warcinfo records are skipped."""
    rows = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "resource", "conversion"):
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        http, body = _split_http(payload)
        lang = http.get("content-language")
        if lang:
            lang = lang.split(",")[0].split("-")[0].strip().lower() or None
        rows.append(
            {
                "url": url,
                "warc_ts": headers.get("warc-date"),
                "html": body,
                "lang": lang,
            }
        )
    return rows


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def _gzip_member(raw: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    return co.compress(raw) + co.flush()


def write_warc_gz(rows: list[dict]) -> bytes:
    """documents-shaped dicts -> member-per-record .warc.gz with a leading
    warcinfo record, each page as a full HTTP response (the Common-Crawl
    layout)."""

    def record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
        head = b"WARC/1.0\r\n"
        head += b"".join(
            f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
        )
        head += f"Content-Length: {len(payload)}\r\n".encode()
        return head + CRLF + payload + CRLF + CRLF

    out = bytearray()
    info = b"software: kraken-spark-warc-writer\r\n"
    out += _gzip_member(
        record(
            [("WARC-Type", "warcinfo"), ("WARC-Record-ID", "<urn:uuid:0>")],
            info,
        )
    )
    for i, r in enumerate(rows):
        body = bytes(r["html"] or b"")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + (
                f"Content-Language: {r['lang']}\r\n".encode()
                if r.get("lang")
                else b""
            )
            + f"Content-Length: {len(body)}\r\n".encode()
            + CRLF
            + body
        )
        hdrs = [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{i + 1}>"),
            ("WARC-Target-URI", r["url"]),
            ("Content-Type", "application/http; msgtype=response"),
        ]
        if r.get("warc_ts"):
            hdrs.append(("WARC-Date", str(r["warc_ts"])))
        out += _gzip_member(record(hdrs, http))
    return bytes(out)


def write_wet_gz(rows: list[dict], software: str = "kraken-spark-wet-writer") -> bytes:
    """Extraction output dicts (url, text, optional warc_ts/lang/refers_to)
    -> a .wet.gz blob: the Common-Crawl WET layout — a warcinfo record
    followed by one WARC `conversion` record per page whose payload is the
    extracted plain text (UTF-8, Content-Type text/plain), WARC-Refers-To
    linking back to the source response record. Member-per-record gzip so
    readers can split on member boundaries, same as the WARC writer."""

    def record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
        head = b"WARC/1.0\r\n"
        head += b"".join(f"{k}: {v}\r\n".encode("latin-1") for k, v in headers)
        head += f"Content-Length: {len(payload)}\r\n".encode()
        return head + CRLF + payload + CRLF + CRLF

    out = bytearray()
    info = f"software: {software}\r\nformat: WET File Format 1.0\r\n".encode()
    out += _gzip_member(
        record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", "<urn:uuid:wet-0>"),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    )
    for i, r in enumerate(rows):
        body = (r.get("text") or "").encode("utf-8")
        hdrs = [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", f"<urn:uuid:wet-{i + 1}>"),
            ("WARC-Target-URI", r["url"]),
            ("Content-Type", "text/plain"),
        ]
        if r.get("refers_to"):
            hdrs.append(("WARC-Refers-To", str(r["refers_to"])))
        if r.get("warc_ts"):
            hdrs.append(("WARC-Date", str(r["warc_ts"])))
        if r.get("lang"):
            hdrs.append(("WARC-Identified-Content-Language", str(r["lang"])))
        out += _gzip_member(record(hdrs, body))
    return bytes(out)


def write_wet_shards(extracted_df, out_dir: str) -> None:
    """Spark face of the WET sink: extraction output (url, text, + any of
    warc_ts/lang) -> one .wet.gz file per partition under out_dir, written
    executor-side with no driver bottleneck (the write_ipc_shards pattern,
    sources/arrow_dataset.py) — at 100 TB each task streams its partition
    into its own shard, mirroring how Common Crawl ships one WET file per
    WARC file. Rows are sorted by url within a shard for determinism."""
    import os

    import pyarrow as pa

    cols = [c for c in ("url", "warc_ts", "text", "lang") if c in extracted_df.columns]

    def fn(batches):
        from pyspark import TaskContext

        rows = []
        for batch in batches:
            for r in batch.to_pylist():
                rows.append(
                    {
                        "url": r["url"],
                        "text": r.get("text") or "",
                        "warc_ts": r.get("warc_ts"),
                        "lang": r.get("lang"),
                    }
                )
        schema = pa.schema([pa.field("path", pa.string()), pa.field("n", pa.int64())])
        if rows:
            rows.sort(key=lambda r: r["url"])
            pid = TaskContext.get().partitionId()
            path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
            with open(path, "wb") as f:
                f.write(write_wet_gz(rows))
            yield pa.RecordBatch.from_pylist(
                [{"path": path, "n": len(rows)}], schema=schema
            )

    os.makedirs(out_dir, exist_ok=True)
    manifest = extracted_df.select(*cols).mapInArrow(
        fn, schema="path string, n bigint"
    )
    shards = [r.asDict() for r in manifest.collect()]  # tiny: one row/shard
    import json

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({"shards": sorted(shards, key=lambda s: s["path"])}, f, indent=1)


# --------------------------------------------------------------------------
# Spark face
# --------------------------------------------------------------------------


def explode_warc(files_df):
    """DataFrame (path string, content binary) -> documents-shaped rows
    (url, warc_ts string, html binary, lang string), one per response
    record. One task per WARC file — the Common-Crawl-scale partitioning
    (file count >> core count at 100 TB; see module docstring)."""
    import pyarrow as pa

    def fn(batches):
        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.string()),
                pa.field("html", pa.binary()),
                pa.field("lang", pa.string()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                try:
                    rows = warc_to_documents(bytes(r["content"] or b""))
                except Exception:
                    rows = []
                out.extend(rows)
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=schema)

    return files_df.mapInArrow(
        fn, schema="url string, warc_ts string, html binary, lang string"
    )
