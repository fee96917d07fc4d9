"""URL-level filtering (functions/web.url_quality_filter — the RefinedWeb
§3.1 blocklist + weighted-fragment score) and the compression-ratio junk
signal (functions/webfilter.compression_signals): rule vectors, DuckDB
parity for the codegen URL scorer, zero-Exchange plan guard, and
signal-band sanity for the zlib ratio.
"""

import duckdb
import pytest

from kraken_spark.functions.web import (
    URL_BLOCK_DOMAINS,
    URL_SCORE_THRESHOLD,
    URL_SOFT_WORDS,
    url_quality_filter,
)
from kraken_spark.functions.webfilter import compression_signals

URLS = [
    "https://news.example.org/world/article-1",
    "https://spam-casino.example/play",          # blocked domain
    "http://ok-site.example/casino-night-charity",  # casino(3) < 4 -> ok
    "http://shady.example/casino/free-download",  # 3 + 2 = 5 >= 4 -> drop
    "https://warez-mirror.example/files",        # blocked domain AND warez
    "https://mixed.example/xxx",                 # 4 >= 4 -> drop
    "not a url at all",
]


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-urlfilter", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_url_filter_verdicts(spark):
    got = {r.url: (r.domain_blocked, r.url_score, r.url_ok) for r in url_quality_filter(_df(spark)).collect()}
    assert got["https://news.example.org/world/article-1"] == (False, 0.0, True)
    assert got["https://spam-casino.example/play"][0] is True
    assert got["https://spam-casino.example/play"][2] is False
    assert got["http://ok-site.example/casino-night-charity"] == (False, 3.0, True)
    assert got["http://shady.example/casino/free-download"] == (False, 5.0, False)
    assert got["https://warez-mirror.example/files"] == (True, 4.0, False)
    assert got["https://mixed.example/xxx"] == (False, 4.0, False)
    assert got["not a url at all"] == (False, 0.0, True)


def test_url_filter_duckdb_parity(spark):
    got = sorted(
        (r.url, r.domain, r.domain_blocked, r.url_score, r.url_ok)
        for r in url_quality_filter(_df(spark)).collect()
    )
    block = ", ".join(f"'{d}'" for d in URL_BLOCK_DOMAINS)
    score = " + ".join(
        f"CASE WHEN contains(lower(url), '{w}') THEN {wt} ELSE 0.0 END"
        for w, wt in URL_SOFT_WORDS
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE urls(url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(u,) for u in URLS])
    want = sorted(
        con.execute(
            f"""
            SELECT url, domain,
                   domain IN ({block}) AS domain_blocked,
                   url_score,
                   (NOT domain IN ({block})) AND url_score < {URL_SCORE_THRESHOLD} AS url_ok
            FROM (SELECT url, {score} AS url_score,
                         lower(regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//?([^/?#:]+)', 1)) AS domain
                  FROM urls)
            """
        ).fetchall()
    )
    assert got == want


def test_url_filter_plan_is_map_only(spark):
    plan = url_quality_filter(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_compression_signal_bands(spark):
    import random
    import string

    prose = (
        "The committee convened on Thursday to weigh the annual budget against "
        "revised projections. Several members questioned infrastructure costs, "
        "while others urged caution on staffing expansions. After two hours of "
        "debate, a preliminary vote deferred the decision to the next session."
    )
    boiler = "buy now " * 400
    rng = random.Random(99)
    noise = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(1000))
    docs = spark.createDataFrame(
        [(1, prose), (2, boiler), (3, noise), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_signals(docs).collect()}
    # repetitive boilerplate compresses far better than prose; random noise worse
    assert got[2].compression_ratio < got[1].compression_ratio < got[3].compression_ratio
    assert got[4].compression_ratio == 0.0 and got[4].raw_bytes == 0
    # ratios are exact zlib level-6 recomputations
    import zlib

    assert got[1].zlib_bytes == len(zlib.compress(prose.encode(), 6))


def test_unicode_normalize(spark):
    """NFC + control-strip + exotic-space collapse: clean ASCII passes
    byte-identical; decomposed accents compose (pinned against DuckDB's
    nfc_normalize); controls vanish; NBSP becomes a plain space."""
    from kraken_spark.functions.webfilter import unicode_normalize

    decomposed = "Café au lait"        # e + combining acute
    rows = [
        (1, "plain ascii text stays identical.\nwith a newline\tand tab"),
        (2, decomposed),
        (3, "null\x00 and bell\x07 controls dropped"),
        (4, "non breaking space"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_changed_chars) for r in unicode_normalize(docs).collect()}
    assert got[1] == (rows[0][1], 0)
    import duckdb

    want_nfc = duckdb.sql(f"SELECT nfc_normalize('{decomposed}')").fetchone()[0]
    assert got[2][0] == want_nfc == "Café au lait" and got[2][1] > 0
    assert got[3][0] == "null and bell controls dropped"
    assert got[4][0] == "non breaking space"
    assert got[5] == ("", 0)


def test_unicode_normalize_total_on_arbitrary_text():
    """The hygiene kernel (the pure-python core of the Arrow batch fn)
    never crashes and is idempotent on arbitrary unicode."""
    import re
    import unicodedata

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    hspace = re.compile("[\\xa0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]+")

    def norm(t):
        return hspace.sub(" ", ctrl.sub("", unicodedata.normalize("NFC", t)))

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def prop(t):
        once = norm(t)
        assert norm(once) == once  # idempotent
        assert "\x00" not in once

    prop()
