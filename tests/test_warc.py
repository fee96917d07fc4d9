"""WARC ingestion (sources/warc.py): Common-Crawl's container format —
member-per-record gzip, HTTP response unwrapping (chunked + content
encodings), documents-shaped rows, and the Spark explode feeding the same
extraction plan as every other source.
"""

import zlib

import pytest

from kraken_spark.kernels import render
from kraken_spark.kernels.htmlparse import write_boilerplate_page
from kraken_spark.sources.warc import (
    iter_warc_records,
    warc_to_documents,
    write_warc_gz,
)


def _doc_rows(idxs=(0, 2)):
    rows = []
    for i in idxs:
        d = render.render_document(42, i)
        url = f"https://example.org/{d['lang']}/doc-{i:08d}"
        rows.append(
            {
                "url": url,
                "warc_ts": "2026-08-17T00:00:00Z",
                "html": write_boilerplate_page(d["text"], d["lang"], url),
                "lang": d["lang"],
                "_gt": d["text"],
            }
        )
    return rows


def test_roundtrip_member_gzip():
    rows = _doc_rows()
    blob = write_warc_gz(rows)
    assert blob[:2] == b"\x1f\x8b"
    recs = list(iter_warc_records(blob))
    assert [h.get("warc-type") for h, _ in recs] == ["warcinfo", "response", "response"]
    docs = warc_to_documents(blob)
    assert [d["url"] for d in docs] == [r["url"] for r in rows]
    assert all(bytes(d["html"]) == bytes(r["html"]) for d, r in zip(docs, rows))
    assert [d["lang"] for d in docs] == ["en", "ar"]
    assert docs[0]["warc_ts"] == "2026-08-17T00:00:00Z"


def test_plain_uncompressed_warc_and_skipped_types():
    body = b"<html><body><article><p>hello there world</p></article></body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://a/\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    docs = warc_to_documents(req + rec)
    assert len(docs) == 1 and docs[0]["html"] == body  # request skipped


def test_http_chunked_and_content_encodings():
    body = b"0123456789abcdef" * 8
    chunked = b"10\r\n" + body[:16] + b"\r\n70\r\n" + body[16:] + b"\r\n0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://c/\r\n"
        b"Content-Length: %d\r\n\r\n" % len(http) + http
    )
    assert warc_to_documents(rec)[0]["html"] == body
    co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    gz = co.compress(body) + co.flush()
    http2 = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://g/\r\n"
        b"Content-Length: %d\r\n\r\n" % len(http2) + http2
    )
    assert warc_to_documents(rec2)[0]["html"] == body


def test_truncated_and_garbage_are_total():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"\x1f\x8b garbage"))
    # truncating mid-stream keeps earlier records, drops the broken tail
    full = write_warc_gz(_doc_rows((0, 2)))
    docs = warc_to_documents(full[:-40])
    assert 1 <= len(docs) <= 2  # never raises, never fabricates
    assert docs[0]["url"].endswith("00000000")


def test_explode_warc_to_extraction_cer0():
    """WARC.gz files -> explode_warc -> the SAME plan_extraction: every
    WARC-sourced HTML page extracts byte-identical (cer 0)."""
    pytest.importorskip("pyspark")
    from pyspark.sql import functions as F

    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.session import get_spark
    from kraken_spark.sources.warc import explode_warc

    spark = get_spark(app="test-warc", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    rows = _doc_rows((0, 1, 2))
    gt = {r["url"]: r["_gt"] for r in rows}
    files = spark.createDataFrame(
        [("wf-0.warc.gz", write_warc_gz(rows[:2])), ("wf-1.warc.gz", write_warc_gz(rows[2:]))],
        "path string, content binary",
    )
    docs = explode_warc(files)
    got = {r.url: r for r in docs.collect()}
    assert set(got) == set(gt)
    ext = plan_extraction(
        docs.select(
            "url", "html", F.lit(None).cast("string").alias("text"), "lang"
        ),
        num_partitions=2,
    )
    for r in ext.collect():
        assert r.text == gt[r.url]
        assert not r.guard_tripped


def test_registered_query_routes_through_warc_cer0():
    """The driver-registered x_extract_html query packs its pages into
    real .warc.gz containers and reads them back via explode_warc — every
    url must come out cer 0 (container + HTTP + boilerplate chain is
    lossless), with one row per corpus doc."""
    pytest.importorskip("pyspark")
    from kraken_spark.operators.advanced import x_extract_html
    from kraken_spark.session import get_spark

    spark = get_spark(app="test-warc", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    rows = x_extract_html(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 12
    assert all(r.cer == 0.0 for r in rows)
    assert [r.url for r in rows] == sorted(r.url for r in rows)
    # markdown render through the same WARC pages: byte-equal on the
    # paragraph-only fixtures (the structured-extraction subset contract)
    assert all(r.markdown_match for r in rows)
