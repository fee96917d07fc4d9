"""robots.txt REP engine (kernels/robots.py) + crawl-policy Spark face
(functions/web.py): RFC 9309 matching vectors (wildcards, $ anchors,
longest-match precedence, group selection, allow-tie), totality, and the
host-joined verdict plan.
"""

import pytest

from kraken_spark.kernels.robots import (
    parse_robots,
    robots_verdict,
)

BASIC = b"""
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/public.html
Sitemap: https://example.org/sitemap.xml

User-agent: goodbot
Disallow:

User-agent: strictbot
Crawl-delay: 2.5
Disallow: /
"""


def test_group_selection_and_basic_rules():
    r = parse_robots(BASIC)
    # * group: longest match wins -> the Allow exemption survives
    assert not r.allowed("somebot", "/private/secret.html")
    assert r.allowed("somebot", "/private/public.html")
    assert r.allowed("somebot", "/open/page.html")
    # goodbot group: empty Disallow = no rule = everything allowed
    assert r.allowed("goodbot", "/private/secret.html")
    # strictbot: everything blocked, delay parsed
    assert not r.allowed("strictbot", "/")
    assert not r.allowed("strictbot", "/anything")
    assert r.delay_for("strictbot") == 2.5
    assert r.delay_for("somebot") is None
    assert r.sitemaps == ["https://example.org/sitemap.xml"]


def test_longest_prefix_group_choice():
    data = b"""User-agent: googlebot
Disallow: /g/
User-agent: googlebot-news
Disallow: /n/
User-agent: *
Disallow: /all/
"""
    r = parse_robots(data)
    # agent token picks the LONGEST matching user-agent line
    assert not r.allowed("googlebot-news", "/n/x")
    assert r.allowed("googlebot-news", "/g/x")  # not its group
    assert not r.allowed("googlebot", "/g/x")
    assert r.allowed("googlebot", "/all/x")  # has own group, * ignored
    assert not r.allowed("otherbot", "/all/x")


def test_wildcards_and_anchors():
    data = b"""User-agent: *
Disallow: /fish*
Disallow: /*.php$
Allow: /fish/free
"""
    r = parse_robots(data)
    assert not r.allowed("b", "/fish")
    assert not r.allowed("b", "/fishheads/yummy.html")
    assert r.allowed("b", "/Fish")  # case-sensitive paths
    assert not r.allowed("b", "/folder/filename.php")
    assert r.allowed("b", "/filename.php5")  # $ anchors the end
    assert r.allowed("b", "/fish/free")  # longer Allow wins


def test_allow_wins_ties_and_stacked_agents():
    data = b"""User-agent: a
User-agent: b
Allow: /folder
Disallow: /folder
"""
    r = parse_robots(data)
    assert r.allowed("a", "/folder/page")  # equal length: Allow preferred
    assert r.allowed("b", "/folder/page")  # stacked UA lines share rules
    assert r.allowed("c", "/folder/page")  # no group at all


def test_totality_and_verdict_helper():
    assert parse_robots(b"\xff\xfe garbage \x00 bytes").groups == []
    assert robots_verdict(b"", "any", "https://e.org/x")
    assert not robots_verdict(
        b"User-agent: *\nDisallow: /x", "any", "https://e.org/x/y"
    )
    # BOM + CRLF + case-insensitive field names
    bom = "﻿USER-AGENT: *\r\nDISALLOW: /a\r\n".encode("utf-8")
    assert not robots_verdict(bom, "any", "https://e.org/a")


def test_parse_sitemap():
    from kraken_spark.kernels.robots import parse_sitemap

    urlset = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://e.org/a</loc><lastmod>2026-01-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://e.org/b</loc></url>
  <url><priority>bad</priority></url>
</urlset>"""
    got = parse_sitemap(urlset)
    assert got["kind"] == "urlset" and len(got["entries"]) == 2
    assert got["entries"][0] == {
        "loc": "https://e.org/a",
        "lastmod": "2026-01-01",
        "changefreq": "daily",
        "priority": 0.8,
    }
    # namespace-less index documents parse too
    idx = b"<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc></sitemap></sitemapindex>"
    got = parse_sitemap(idx)
    assert got["kind"] == "index"
    assert got["entries"][0]["loc"] == "https://e.org/s1.xml"
    assert parse_sitemap(b"not xml")["kind"] == "invalid"
    assert parse_sitemap(b"<html></html>")["kind"] == "invalid"


def test_crawl_policy_spark_face():
    pytest.importorskip("pyspark")
    from kraken_spark.functions.web import crawl_policy, robots_sitemaps
    from kraken_spark.session import get_spark

    spark = get_spark(app="test-robots", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(
        [
            ("https://a.org/private/secret.html",),
            ("https://a.org/open.html",),
            ("https://b.org/anything",),
            ("https://norobots.org/page",),
        ],
        "url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.org", b"User-agent: *\nDisallow: /private/"),
            ("b.org", b"User-agent: *\nCrawl-delay: 1.5\nDisallow: /\nSitemap: https://b.org/s.xml"),
        ],
        "host string, robots binary",
    )
    got = {r.url: r for r in crawl_policy(docs, robots).collect()}
    assert not got["https://a.org/private/secret.html"].allowed
    assert got["https://a.org/open.html"].allowed
    assert not got["https://b.org/anything"].allowed
    assert got["https://b.org/anything"].crawl_delay == 1.5
    assert got["https://norobots.org/page"].allowed  # absent robots row
    maps = {(r.host, r.sitemap) for r in robots_sitemaps(robots).collect()}
    assert maps == {("b.org", "https://b.org/s.xml")}
    # plan: exactly one shuffle join on host, no cartesian
    plan = crawl_policy(docs, robots)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
