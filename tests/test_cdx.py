"""CDX(J) index (sources/warc.py): the Common-Crawl/Wayback random-access
index over WARC — per-record (offset, length) spans that gunzip standalone,
SURT keys matching the JVM surt_key expression, the sharded cdx-NNNNN.gz +
cluster.idx shipping layout, and point lookups routed through it.
"""

import zlib

import pytest

from kraken_spark.kernels import render
from kraken_spark.kernels.htmlparse import write_boilerplate_page
from kraken_spark.sources.warc import (
    cdx_index_records,
    fetch_record,
    iter_warc_record_spans,
    read_cdxj,
    surt,
    write_cdxj,
    write_warc_gz,
)


def _doc_rows(idxs=(0, 1, 2)):
    rows = []
    for i in idxs:
        d = render.render_document(42, i)
        url = f"https://example.org/{d['lang']}/doc-{i:08d}"
        rows.append(
            {
                "url": url,
                "warc_ts": "2026-08-17T12:34:56Z",
                "html": write_boilerplate_page(d["text"], d["lang"], url),
                "lang": d["lang"],
            }
        )
    return rows


def test_member_spans_random_access_byte_identical():
    """The core CDX promise: data[offset:offset+length] is a standalone
    slice from which fetch_record reproduces the exact record."""
    rows = _doc_rows()
    blob = write_warc_gz(rows)
    recs = cdx_index_records(blob, "f.warc.gz")
    assert len(recs) == len(rows)  # warcinfo not indexed
    for r, src in zip(recs, rows):
        assert r["url"] == src["url"]
        assert r["filename"] == "f.warc.gz"
        assert r["ts"] == "20260817123456"
        assert r["mime"] == "text/html"
        assert r["status"] == 200
        sl = blob[r["offset"] : r["offset"] + r["length"]]
        assert sl[:2] == b"\x1f\x8b"  # standalone gzip member
        headers, payload = fetch_record(sl)
        assert headers["warc-target-uri"] == src["url"]
        body = payload.split(b"\r\n\r\n", 1)[1]
        assert body == bytes(src["html"])  # byte-identical page

    # spans tile the file with no overlap and cover every content record
    spans = sorted((r["offset"], r["length"]) for r in recs)
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 <= o2


def test_plain_warc_spans():
    body = b"<html><body><article><p>hello cdx world page</p></article></body></html>"
    http = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a.test/x\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n"
    )
    data = rec + rec.replace(b"http://a.test/x", b"http://b.test/y")
    out = cdx_index_records(data, "plain.warc")
    assert [r["url"] for r in out] == ["http://a.test/x", "http://b.test/y"]
    assert out[0]["status"] == 404 and out[0]["ts"] == "20260102030405"
    for r in out:
        _, payload = fetch_record(data[r["offset"] : r["offset"] + r["length"]])
        assert payload.endswith(body[-20:])
    spans = list(iter_warc_record_spans(data))
    assert spans[0][2] == 0 and spans[1][2] == len(rec)


def test_digest_is_sha1_b32_of_body():
    import base64
    import hashlib

    rows = _doc_rows((0,))
    recs = cdx_index_records(write_warc_gz(rows), "f")
    want = base64.b32encode(hashlib.sha1(bytes(rows[0]["html"])).digest()).decode()
    assert recs[0]["digest"] == want


def test_cdxj_roundtrip_and_sort():
    recs = cdx_index_records(write_warc_gz(_doc_rows()), "f.warc.gz")
    blob = write_cdxj(recs)
    lines = blob.decode().splitlines()
    assert lines == sorted(lines)
    back = read_cdxj(blob)
    assert [(r["surt"], r["url"], r["offset"]) for r in back] == sorted(
        (r["surt"], r["url"], r["offset"]) for r in recs
    )


SURT_VECTORS = [
    "https://News.Example.co.uk/a/b?q=1#f",
    "http://www.example.org/",
    "https://example.org",
    "https://example.org/path/",
    "http://a.b.c.example.com:8080/x?y=2",
    "https://example.org/%7Euser/page.html",
    "ftp://files.example.net/pub",
    "not a url at all",
    "mailto:user@example.org",
]


def test_surt_python_matches_jvm_expression():
    """The Python surt() used by the CDX kernel must agree with the JVM
    surt_key() expression used for corpus-side dedup/sort, or index keys
    and query keys would diverge."""
    pytest.importorskip("pyspark")
    from pyspark.sql import functions as F

    from kraken_spark.functions.web import surt_key
    from kraken_spark.session import get_spark

    spark = get_spark(app="test-cdx", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame([(u,) for u in SURT_VECTORS], "url string")
    got = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [surt(u) for u in SURT_VECTORS]
    assert surt("https://News.Example.co.uk/a/b?q=1#f") == "uk,co,example,news)/a/b"


def test_spark_cdx_index_and_sharded_lookup(tmp_path):
    """e2e: WARC files -> cdx_index (one task per file) -> write_cdx_shards
    (range-partitioned, sorted, cluster.idx) -> cdx_lookup routes to ONE
    shard -> ranged WARC read -> byte-identical page."""
    pytest.importorskip("pyspark")
    from kraken_spark.session import get_spark
    from kraken_spark.sources.warc import cdx_index, cdx_lookup, write_cdx_shards

    spark = get_spark(app="test-cdx", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    rows = _doc_rows((0, 1, 2, 3))
    blobs = {
        "wf-0.warc.gz": write_warc_gz(rows[:2]),
        "wf-1.warc.gz": write_warc_gz(rows[2:]),
    }
    files = spark.createDataFrame(
        list(blobs.items()), "path string, content binary"
    )
    idx = cdx_index(files)
    got = {r.url: r.asDict() for r in idx.collect()}
    assert set(got) == {r["url"] for r in rows}

    out = str(tmp_path / "cdx")
    write_cdx_shards(idx, out, num_shards=2)
    assert (tmp_path / "cdx" / "cluster.idx").exists()

    for src in rows:
        hits = cdx_lookup(out, src["url"])
        assert len(hits) == 1, src["url"]
        h = hits[0]
        blob = blobs[h["filename"]]
        _, payload = fetch_record(blob[h["offset"] : h["offset"] + h["length"]])
        assert payload.split(b"\r\n\r\n", 1)[1] == bytes(src["html"])
    assert cdx_lookup(out, "https://never.indexed.example/") == []

    # shards are internally sorted and ranges do not interleave
    import os

    shard_lines = []
    for name in sorted(os.listdir(out)):
        if not name.endswith(".gz"):
            continue
        data = zlib.decompress(
            (tmp_path / "cdx" / name).read_bytes(), wbits=zlib.MAX_WBITS | 16
        )
        keys = [line.split(" ", 1)[0] for line in data.decode().splitlines()]
        assert keys == sorted(keys)
        shard_lines.append(keys)
    flat = [k for keys in shard_lines for k in keys]
    assert flat == sorted(flat)


def test_cdx_digest_dedup():
    """Recrawl collapse by (surt, digest): identical content captured at
    three timestamps keeps the EARLIEST capture with n_dupes=2; changed
    content at the same URL stays a separate row."""
    pytest.importorskip("pyspark")
    from kraken_spark.session import get_spark
    from kraken_spark.sources.warc import cdx_digest_dedup, cdx_index

    spark = get_spark(app="test-cdx", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")

    rows = _doc_rows((0, 1))
    same = dict(rows[0])
    # the same page recrawled later, twice (identical body -> same digest)
    recrawl1 = dict(same, warc_ts="2026-08-18T00:00:00Z")
    recrawl2 = dict(same, warc_ts="2026-08-19T00:00:00Z")
    # the same URL with CHANGED content
    changed = dict(same, warc_ts="2026-08-20T00:00:00Z",
                   html=same["html"] + b"<!-- edited -->")
    blobs = [
        ("a.warc.gz", write_warc_gz([rows[0], rows[1]])),
        ("b.warc.gz", write_warc_gz([recrawl1, changed])),
        ("c.warc.gz", write_warc_gz([recrawl2])),
    ]
    files = spark.createDataFrame(blobs, "path string, content binary")
    out = cdx_digest_dedup(cdx_index(files)).collect()
    assert len(out) == 3  # url0-content0, url0-changed, url1
    u0 = [r for r in out if "doc-00000000" in r.url]
    assert len(u0) == 2
    dup = next(r for r in u0 if r.n_dupes == 2)
    assert dup.ts == "20260817123456" and dup.filename == "a.warc.gz"
    uniq = next(r for r in u0 if r.n_dupes == 0)
    assert uniq.ts == "20260820000000"
    assert all(r.n_dupes == 0 for r in out if "doc-00000001" in r.url)
