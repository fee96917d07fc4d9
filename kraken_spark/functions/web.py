"""Web-corpus page metadata + link graph (the Common-Crawl index signals).

`page_metadata` lifts per-page head/DOM signals (title, description,
canonical, robots noindex/nofollow, <html lang>, resolved outlinks) out of
the documents table in one Arrow-batched DOM pass (kernels/htmlparse.
page_meta — no per-row Python, same batching discipline as extraction).
`domain_link_graph` then turns the outlinks into a (src_domain,
dst_domain, n_links) edge list entirely JVM-side: JSON array explode +
regexp domain extraction + one groupBy — the shape that survives 10^12
pages because the only shuffle is the final per-edge aggregation, and
per-page link lists are bounded (MAX_LINKS) before the explode.

The reference engine has no web leg (it is image-only); these mirror what
its CLI metadata plumbing (kraken/kraken.py message/ProcessingStep
surface) would need to become over a crawl corpus, per the brief's
Common-Crawl-style north rule.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..session import lineage_cut
from pyspark.sql.types import ArrayType, StringType

# outlink cap per page: wild pages carry up to ~10^4 anchors; an unbounded
# explode would let one adversarial page fan out millions of edge rows
MAX_LINKS = 512

_META_SCHEMA = (
    "url string, title string, description string, canonical string, "
    "noindex boolean, nofollow boolean, lang_attr string, "
    "links_json string, n_links int"
)


def page_metadata(docs: DataFrame) -> DataFrame:
    """documents(url, html, ...) -> one metadata row per page. Links are
    emitted as a JSON array string (driver-output invariant: no
    array-typed columns), capped at MAX_LINKS in document order."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels.htmlparse import looks_like_html, page_meta

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("title", pa.string()),
                pa.field("description", pa.string()),
                pa.field("canonical", pa.string()),
                pa.field("noindex", pa.bool_()),
                pa.field("nofollow", pa.bool_()),
                pa.field("lang_attr", pa.string()),
                pa.field("links_json", pa.string()),
                pa.field("n_links", pa.int32()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                url = r["url"]
                html = bytes(r["html"] or b"")
                row = {
                    "url": url,
                    "title": None,
                    "description": None,
                    "canonical": None,
                    "noindex": False,
                    "nofollow": False,
                    "lang_attr": None,
                    "links_json": "[]",
                    "n_links": 0,
                }
                try:
                    if looks_like_html(html):
                        m = page_meta(html, base_url=url)
                        links = m["links"][:MAX_LINKS]
                        row.update(
                            title=m["title"],
                            description=m["description"],
                            canonical=m["canonical"],
                            noindex=m["noindex"],
                            nofollow=m["nofollow"],
                            lang_attr=m["lang_attr"],
                            links_json=json.dumps(links),
                            n_links=len(links),
                        )
                except Exception:
                    pass  # malformed page: keep the empty-metadata row
                out.append(row)
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=schema)

    return docs.select("url", "html").mapInArrow(fn, schema=_META_SCHEMA)


_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//?([^/?#:]+)"


def _domain(col):
    """URL -> lowercased host. Pure JVM regexp (no UDF): scheme://host…"""
    return F.lower(F.regexp_extract(col, _DOMAIN_RE, 1))


def surt_key(col):
    """URL -> SURT-style sort key (the Common-Crawl/Wayback index key):
    host lowercased, leading `www.` dropped, labels reversed and
    comma-joined, then `)/` + path with the query string and fragment
    stripped and a trailing slash normalized away.

        https://News.Example.co.uk/a/b?q=1#f -> uk,co,example,news)/a/b

    Pure JVM expression (regexp + split + reverse + concat) so it can key
    a 10^12-row sort/groupBy without leaving codegen; URLs without a
    parseable host key as '' (callers filter)."""
    host = F.lower(F.regexp_extract(col, _DOMAIN_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    path = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(rev, F.lit(")"), F.when(path == "", F.lit("/")).otherwise(path))
    )


def url_dedup_key(docs: DataFrame) -> DataFrame:
    """documents(url, ...) -> (url, surt) — the canonical-URL grouping key
    for crawl-frontier dedup: http/https variants, www/no-www, trailing
    slash and query-string noise all collapse to one key. One codegen
    projection; dedup is then a plain groupBy(surt)."""
    return docs.select("url", surt_key(F.col("url")).alias("surt"))


_POLICY_SCHEMA = "url string, host string, allowed boolean, crawl_delay double"


def crawl_policy(
    docs: DataFrame, robots: DataFrame, agent: str = "kraken-spark-bot"
) -> DataFrame:
    """documents(url, ...) × robots(host string, robots binary) -> one
    (url, host, allowed, crawl_delay) verdict row per page for `agent`
    (kernels/robots.py, RFC 9309 matching).

    Plan shape at 10^12 pages: host extraction is a codegen regexp, the
    page↔policy combine is ONE shuffle hash join on host (the robots table
    has one row per host — large, so no broadcast), and verdicts run in
    Arrow batches with a per-host parsed-rules cache that hits because the
    join output arrives host-clustered. Pages with no robots row are
    allowed (fetching policy: absent robots.txt permits crawling)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import re

        from ..kernels.robots import RobotsRules, parse_robots

        path_re = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)")
        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("host", pa.string()),
                pa.field("allowed", pa.bool_()),
                pa.field("crawl_delay", pa.float64()),
            ]
        )
        cache: dict[str, RobotsRules] = {}
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                blob = r.get("robots")
                allowed, delay = True, None
                if blob is not None:
                    rules = cache.get(r["host"])
                    if rules is None:
                        try:
                            rules = parse_robots(bytes(blob))
                        except Exception:
                            rules = RobotsRules()
                        if len(cache) >= 4096:
                            cache.clear()
                        cache[r["host"]] = rules
                    m = path_re.match(r["url"] or "")
                    path = m.group(1) if m and m.group(1) else "/"
                    allowed = rules.allowed(agent, path)
                    delay = rules.delay_for(agent)
                out.append(
                    {
                        "url": r["url"],
                        "host": r["host"],
                        "allowed": allowed,
                        "crawl_delay": delay,
                    }
                )
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=schema)

    pages = docs.select("url", _domain(F.col("url")).alias("host"))
    joined = pages.join(robots, "host", "left").select("url", "host", "robots")
    return joined.mapInArrow(fn, schema=_POLICY_SCHEMA)


def robots_sitemaps(robots: DataFrame) -> DataFrame:
    """robots(host, robots binary) -> (host, sitemap) rows — the sitemap
    discovery signal a crawl frontier seeds from. Map-only."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels.robots import parse_robots

        schema = pa.schema(
            [pa.field("host", pa.string()), pa.field("sitemap", pa.string())]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                try:
                    maps = parse_robots(bytes(r["robots"] or b"")).sitemaps
                except Exception:
                    maps = []
                out.extend({"host": r["host"], "sitemap": s} for s in maps)
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=schema)

    return robots.mapInArrow(fn, schema="host string, sitemap string")


def domain_link_graph(meta: DataFrame) -> DataFrame:
    """page_metadata output -> (src_domain, dst_domain, n_links) edges,
    nofollow pages excluded (their anchors are opted out of the graph).
    All JVM-side: from_json + explode + regexp + one groupBy shuffle."""
    links = (
        meta.where(~F.col("nofollow"))
        .select(
            _domain(F.col("url")).alias("src_domain"),
            F.explode(
                F.from_json(F.col("links_json"), ArrayType(StringType()))
            ).alias("link"),
        )
        .select("src_domain", _domain(F.col("link")).alias("dst_domain"))
        .where((F.col("src_domain") != "") & (F.col("dst_domain") != ""))
    )
    return links.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("n_links")
    )


def domain_pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """Weighted PageRank over a `domain_link_graph` edge list ->
    (domain, rank) with sum(rank) == 1.

    The crawl-corpus authority signal (the CC-style host-level rank that
    quality pipelines join against). Standard model: column-stochastic
    transition weighted by link multiplicity, uniform teleport, dangling
    mass (domains with no outlinks) redistributed uniformly each step —
    i.e. rank = (1-d)/n + d * (W^T rank + dangling/n).

    Scale shape (the part that matters at 10^12 pages / 10^8 domains):

    - The edge list is normalized ONCE (one groupBy for out-weights, one
      join), hash-partitioned by `src_domain`, and persisted; every
      iteration's rank-contribution join then reuses that layout, so the
      per-iteration cost is one shuffle of the (domain, rank) table —
      never of the edges.
    - Self-loops are dropped up front (they only slow convergence) and
      parallel edges are already aggregated by domain_link_graph.
    - Dangling mass is folded in as a broadcast 1-row aggregate, not a
      driver round-trip, so one iteration = one Spark stage chain with no
      .collect(); only the initial node count hits the driver (a scalar).
    - Iterative DataFrame loops grow the logical plan geometrically;
      each new rank table is cut free with lineage_cut (a reliable
      df.checkpoint when the session has a checkpoint dir — env
      SPARK_GRAFT_CHECKPOINT_DIR / get_spark(checkpoint_dir=...)) and the
      previous one unpersisted, keeping plan size and storage O(1) in the
      iteration count. On a real cluster point the checkpoint dir at
      durable storage and lineage_cut upgrades itself — same
      call shape, crash-resumable lineage (north-rule checkpoint story).

    Deterministic given the edge list: per-domain ranks are sums of a few
    hundred float64 terms combined in exchange order, pinned in
    tests/test_pagerank.py against a dense numpy power iteration at 1e-9.
    """
    spark = edges.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    e = edges.where(F.col("src_domain") != F.col("dst_domain"))
    out_w = e.groupBy("src_domain").agg(F.sum("n_links").alias("out_w"))
    norm = (
        e.join(out_w, "src_domain")
        .select(
            "src_domain",
            "dst_domain",
            (F.col("n_links").cast("double") / F.col("out_w")).alias("w"),
        )
        .repartition(p, "src_domain")
        .persist()
    )
    nodes = (
        e.select(F.col("src_domain").alias("domain"))
        .union(e.select(F.col("dst_domain").alias("domain")))
        .distinct()
        .repartition(p, "domain")
        .persist()
    )
    n = nodes.count()
    if n == 0:
        norm.unpersist()
        return nodes.select("domain", F.lit(0.0).alias("rank"))
    sinks = nodes.join(
        out_w.select(F.col("src_domain").alias("domain")), "domain", "left_anti"
    ).persist()

    ranks = nodes.select("domain", F.lit(1.0 / n).alias("rank")).transform(lineage_cut)
    for _ in range(iterations):
        contrib = (
            ranks.join(norm, ranks.domain == norm.src_domain)
            .groupBy(F.col("dst_domain").alias("domain"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        dangling = sinks.join(ranks, "domain").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        new_ranks = (
            nodes.join(contrib, "domain", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "domain",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / n
                    )
                ).alias("rank"),
            )
            .repartition(p, "domain")
            .transform(lineage_cut)
        )
        ranks.unpersist()
        ranks = new_ranks
    norm.unpersist()
    sinks.unpersist()
    nodes.unpersist()
    return ranks


# --- URL-level filtering (the RefinedWeb §3.1 / C4 pre-filter family) ---
#
# Two published mechanisms, both pure codegen (map-only at 10^12 rows):
# a hard domain blocklist (the UT1-blacklist pattern — the shipped list is
# an in-repo deterministic stand-in; production swaps in the real UT1
# categories as a broadcast table without touching the plan) and a soft
# weighted-fragment score over the URL string (RefinedWeb's word-score
# rule: strict fragments weigh more than ambiguous ones; a URL is dropped
# when the summed score of matched fragments crosses the threshold).

URL_BLOCK_DOMAINS = [
    "malware-cdn.example",
    "pill-discounts.example",
    "spam-casino.example",
    "warez-mirror.example",
]

URL_SOFT_WORDS = [
    ("casino", 3.0),
    ("lottery", 2.0),
    ("pills", 3.0),
    ("warez", 4.0),
    ("xxx", 4.0),
    ("free-download", 2.0),
    ("win-big", 2.0),
]

URL_SCORE_THRESHOLD = 4.0


def url_quality_filter(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, domain, domain_blocked, url_score, url_ok) per row — one
    codegen projection, no shuffle, no Python. `url_ok` is the keep
    verdict: domain not on the blocklist AND soft score under threshold."""
    u = F.lower(F.col(url_col))
    dom = _domain(F.col(url_col))
    blocked = dom.isin(*URL_BLOCK_DOMAINS)
    score = None
    for w, wt in URL_SOFT_WORDS:
        term = F.when(u.contains(w), F.lit(wt)).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return docs.select(
        F.col(url_col).alias("url"),
        dom.alias("domain"),
        blocked.alias("domain_blocked"),
        score.alias("url_score"),
        (~blocked & (score < F.lit(URL_SCORE_THRESHOLD))).alias("url_ok"),
    )
