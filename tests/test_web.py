"""Web-corpus metadata + WET sink (functions/web.py, sources/warc.py):
page-level head/DOM signals, the domain link graph, and the Common-Crawl
WET conversion-record artifact with its per-partition shard writer.
"""

import gzip
import json
import os

import pytest

from kraken_spark.kernels import render
from kraken_spark.kernels.htmlparse import page_meta, write_boilerplate_page
from kraken_spark.sources.warc import (
    iter_warc_records,
    warc_to_documents,
    write_wet_gz,
)

_PAGE = b"""<!doctype html>
<html lang="en-GB">
<head>
  <title> The  Page &amp; Title </title>
  <base href="https://base.example.com/dir/">
  <meta name="description" content="A &quot;demo&quot; page.">
  <meta name="robots" content="NOINDEX, nofollow">
  <link rel="canonical" href="../canon">
</head>
<body>
  <a href="rel/one">r</a>
  <a href="/abs/two">a</a>
  <a href="https://other.example.net/three">x</a>
  <a href="#frag">skip</a>
  <a href="mailto:x@y.z">skip</a>
  <a href="javascript:void(0)">skip</a>
  <a href="rel/one">dup</a>
</body></html>"""


def test_page_meta_fields_and_link_resolution():
    m = page_meta(_PAGE, base_url="https://fetch.example.org/fetched/page")
    assert m["title"] == "The Page & Title"
    assert m["description"] == 'A "demo" page.'
    # canonical resolves against <base href>, not the fetch URL
    assert m["canonical"] == "https://base.example.com/canon"
    assert m["noindex"] is True and m["nofollow"] is True
    assert m["lang_attr"] == "en-gb"
    assert m["links"] == [
        "https://base.example.com/dir/rel/one",
        "https://base.example.com/abs/two",
        "https://other.example.net/three",
    ]


def test_page_meta_defaults_and_robots_none():
    m = page_meta(b"<html><body><p>x</p></body></html>")
    assert m["title"] is None and m["canonical"] is None
    assert m["noindex"] is False and m["nofollow"] is False and m["links"] == []
    m2 = page_meta(b'<html><head><meta name="robots" content="none"></head></html>')
    assert m2["noindex"] is True and m2["nofollow"] is True


def test_wet_roundtrip_through_warc_reader():
    rows = [
        {
            "url": "https://example.org/a",
            "text": "line one\nline two",
            "warc_ts": "2026-08-17T00:00:00Z",
            "lang": "en",
            "refers_to": "<urn:uuid:1>",
        },
        {"url": "https://example.org/b", "text": "autre texte", "lang": "fr"},
    ]
    blob = write_wet_gz(rows)
    # member-per-record gzip: warcinfo + 2 conversions = 3 members
    assert blob[:2] == b"\x1f\x8b"
    recs = list(iter_warc_records(blob))
    assert [h.get("warc-type") for h, _ in recs] == [
        "warcinfo",
        "conversion",
        "conversion",
    ]
    conv = recs[1]
    assert conv[0]["warc-target-uri"] == "https://example.org/a"
    assert conv[0]["warc-refers-to"] == "<urn:uuid:1>"
    assert conv[0]["content-type"] == "text/plain"
    assert conv[1].decode() == "line one\nline two"
    # the documents adapter surfaces conversion records too
    docs = warc_to_documents(blob)
    assert {d["url"]: d["html"].decode() for d in docs} == {
        "https://example.org/a": "line one\nline two",
        "https://example.org/b": "autre texte",
    }
    # plain-gzip readers that ignore member boundaries still see all text
    assert b"autre texte" in gzip.decompress(blob)


def test_wet_shards_spark_e2e(tmp_path):
    """extraction output -> write_wet_shards -> explode_warc reads the
    shards back byte-identical per url; manifest covers every row."""
    pytest.importorskip("pyspark")
    from kraken_spark.session import get_spark
    from kraken_spark.sources.warc import explode_warc, write_wet_shards

    spark = get_spark(app="test-wet", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = []
    for i in range(4):
        d = render.render_document(42, i)
        docs.append(
            (f"https://example.org/{d['lang']}/doc-{i:08d}", d["text"], d["lang"])
        )
    df = spark.createDataFrame(docs, "url string, text string, lang string")
    out = str(tmp_path / "wet")
    write_wet_shards(df.repartition(2), out)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert sum(s["n"] for s in manifest["shards"]) == 4
    files = spark.createDataFrame(
        [(s["path"], open(s["path"], "rb").read()) for s in manifest["shards"]],
        "path string, content binary",
    )
    back = {r.url: bytes(r.html).decode() for r in explode_warc(files).collect()}
    assert back == {u: t for u, t, _ in docs}


def test_surt_key_canonicalization():
    pytest.importorskip("pyspark")
    from pyspark.sql import functions as F

    from kraken_spark.functions.web import surt_key, url_dedup_key
    from kraken_spark.session import get_spark

    spark = get_spark(app="test-surt", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    cases = [
        ("https://News.Example.co.uk/a/b?q=1#f", "uk,co,example,news)/a/b"),
        ("http://www.example.org/a/b/", "org,example)/a/b"),
        ("https://example.org/a/b", "org,example)/a/b"),
        ("https://example.org", "org,example)/"),
        ("https://example.org/?utm=x", "org,example)/"),
        ("not a url at all", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.surt for r in url_dedup_key(df).collect()}
    for url, want in cases:
        assert got[url] == want, (url, got[url])
    # the four http(s)/www/slash variants of one page collapse to ONE key
    variants = df.where(F.col("url").contains("example.org/a/b"))
    assert variants.select(surt_key(F.col("url"))).distinct().count() == 1
    # codegen-only: no python stage in the projection
    plan = url_dedup_key(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


def test_main_content_markdown_structure():
    from kraken_spark.kernels.htmlparse import (
        extract_main_text,
        main_content_markdown,
    )

    page = b"""<!doctype html><html><body>
    <nav><a href="/">Home</a><a href="/about">About</a></nav>
    <article>
      <h1>The Grand Unified Article Title</h1>
      <p>This is the first real paragraph of the article and it is long
      enough that the classifier accepts it as good content with the
      usual words in it.</p>
      <h2>A Second Level Heading Here</h2>
      <ul>
        <li>the first item of the list with enough words to be real content</li>
        <li>the second item of the list also has enough words in it to count</li>
        <ul><li>a nested item with enough words to be kept as content too</li></ul>
      </ul>
      <blockquote>a quoted passage that is long enough to be kept by the
      classifier as content with the usual words</blockquote>
      <pre>verbatim code block kept with enough length to be content here</pre>
    </article>
    <footer>Copyright chrome that should vanish</footer>
    </body></html>"""
    md = main_content_markdown(page, "en")
    lines = md.split("\n")
    assert lines[0] == "# The Grand Unified Article Title"
    assert any(l.startswith("## A Second Level Heading") for l in lines)
    assert any(l.startswith("- the first item") for l in lines)
    assert any(l.startswith("  - a nested item") for l in lines)
    assert any(l.startswith("> a quoted passage") for l in lines)
    assert any(l.startswith("    verbatim code block") for l in lines)
    assert "Home" not in md and "Copyright" not in md
    # paragraph-only pages: markdown == plain extraction, byte-identical
    plain = write_boilerplate_page("Line one of text.\nLine two of text.", "en",
                                   "https://e.org/p")
    assert main_content_markdown(plain, "en") == extract_main_text(plain, "en")[0]


def test_main_content_markdown_tables():
    from kraken_spark.kernels.htmlparse import (
        extract_main_text,
        main_content_markdown,
    )

    page = b"""<!doctype html><html><body><article>
    <p>An introduction paragraph that is long enough for the classifier to
    accept it as good content with the usual words in it.</p>
    <table>
      <caption>Yearly figures for the example measurements table</caption>
      <tr><th>Year</th><th>Value | Units</th></tr>
      <tr><td>2024</td><td>17 meters</td></tr>
      <tr><td>2025</td><td>23 meters</td></tr>
    </table>
    </article>
    <table><tr>
      <td><a href="/a">Nav One</a></td><td><a href="/b">Nav Two</a></td>
    </tr><tr>
      <td><a href="/c">Nav Three</a></td><td><a href="/d">Nav Four</a></td>
    </tr></table>
    </body></html>"""
    md = main_content_markdown(page, "en")
    lines = md.split("\n")
    ti = lines.index("| Year | Value \\| Units |")  # th header, pipe escaped
    assert lines[ti - 1].startswith("Yearly figures")  # caption leads
    assert lines[ti + 1] == "|---|---|"
    assert lines[ti + 2] == "| 2024 | 17 meters |"
    assert lines[ti + 3] == "| 2025 | 23 meters |"
    assert "Nav One" not in md  # link-dense layout table stays stripped
    # the plain-text extraction contract is untouched by table rendering:
    # cells still flatten to plain lines, no pipe syntax injected
    text, _ = extract_main_text(page, "en")
    assert "17 meters" in text and "| 2024" not in text


def test_page_meta_total_on_garbage():
    """page_meta is total over arbitrary bytes (fed by wild WARC payloads):
    never raises, always returns the full key set."""
    import random

    rng = random.Random(99)
    keys = {"title", "description", "canonical", "noindex", "nofollow",
            "lang_attr", "links"}
    probes = [
        b"",
        b"\x00\xff\xfe<houses",
        b"<a href=",
        b"<html><a href='" + bytes([rng.randrange(256) for _ in range(64)]) + b"'>",
        "<html><head><base href='::bad::'><a href='x y'>t</a>".encode(),
    ]
    for _ in range(200):
        probes.append(bytes(rng.randrange(256) for _ in range(rng.randrange(400))))
    for p in probes:
        m = page_meta(p, base_url="https://e.org/x")
        assert keys <= set(m)


def test_page_metadata_and_link_graph_spark():
    pytest.importorskip("pyspark")
    from kraken_spark.functions.web import domain_link_graph, page_metadata
    from kraken_spark.session import get_spark

    spark = get_spark(app="test-webmeta", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")

    def page(links, nofollow=False):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        robots = '<meta name="robots" content="nofollow">' if nofollow else ""
        return f"<!doctype html><html><head>{robots}</head><body>{body}</body></html>".encode()

    rows = [
        ("https://a.example.org/p1", page(["https://b.example.net/x", "/local"])),
        ("https://a.example.org/p2", page(["https://b.example.net/y"])),
        ("https://c.example.com/p3", page(["https://b.example.net/z"], nofollow=True)),
        ("https://d.example.com/bad", b"\x00\xff not html"),
    ]
    docs = spark.createDataFrame(rows, "url string, html binary")
    meta = page_metadata(docs)
    got = {r.url: r for r in meta.collect()}
    assert got["https://a.example.org/p1"].n_links == 2
    assert got["https://c.example.com/p3"].nofollow is True
    assert got["https://d.example.com/bad"].n_links == 0
    edges = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in domain_link_graph(meta).collect()
    }
    # nofollow page's links excluded; self-domain edge from the /local link
    assert edges == {
        ("a.example.org", "b.example.net"): 2,
        ("a.example.org", "a.example.org"): 1,
    }
    # scale-shape guard: no python UDF in the link-graph plan (the only
    # python stage is the upstream metadata mapInArrow)
    plan = domain_link_graph(meta)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
