"""Gopher document rules + C4 line cleaning (functions/webfilter.py):
rule-by-rule vectors on constructed docs, exact DuckDB parity on both the
constructed corpus and the real sf0.001 documents table, and a JVM-only
plan guard (no Python in the hot path).
"""

import os

import duckdb
import pytest

from kraken_spark.functions.webfilter import (
    C4_SQL_TEMPLATE,
    GOPHER_SQL_TEMPLATE,
    c4_clean,
    gopher_quality,
)

GOOD = (
    "This is the first sentence of a perfectly ordinary document that "
    "speaks about the weather and other things people have to deal with. "
    * 5
)
DOCS = [
    ("d01", GOOD),
    ("d02", "too short to pass the word count rule."),
    ("d03", " ".join(["####"] * 80)),  # symbol-heavy, no stop words
    ("d04", "\n".join(["- bullet item with some words here"] * 40)),
    ("d05", "\n".join([GOOD] + ["trailing thought goes on..."] * 30)),
    ("d06", " ".join(["zq9!"] * 120)),  # words mostly non-alphabetic? (has z,q)
    ("d07", " ".join(["12345"] * 120)),  # numeric words: alpha fraction 0
    ("d08", GOOD + "\nlorem ipsum dolor sit amet."),
    ("d09", "One. Two words here. No terminal\nshort line\n" + GOOD),
    ("d10", GOOD.replace("deal", "deal {brace}")),
]


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-webfilter", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_gopher_rule_vectors(spark):
    out = {r.doc_id: r for r in gopher_quality(_df(spark)).collect()}
    assert out["d01"].passes  # ordinary prose passes
    assert not out["d02"].passes and out["d02"].n_words < 50
    assert not out["d03"].passes  # symbol ratio + stop words fail
    assert out["d03"].symbol_word_ratio > 0.1
    assert not out["d04"].passes and out["d04"].bullet_line_frac > 0.9
    assert not out["d05"].passes and out["d05"].ellipsis_line_frac > 0.3
    assert not out["d07"].passes and out["d07"].alpha_word_frac == 0.0
    assert out["d01"].stop_word_hits >= 2


def test_c4_clean_vectors(spark):
    out = {r.doc_id: r.text for r in c4_clean(_df(spark)).collect()}
    assert set(out) == {d for d, _ in DOCS}  # every input id survives
    # good doc: kept verbatim (single long line ends with '.')
    assert out["d01"] == GOOD.strip()
    # lorem ipsum and curly-brace docs dropped entirely
    assert out["d08"] == "" and out["d10"] == ""
    # < 5-word and non-terminal lines removed, rest kept in order
    assert out["d09"] == GOOD.strip()
    # bullet lines have >=5 words + no terminal punctuation -> dropped
    assert out["d04"] == ""


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con.execute(sql.format(id_col="doc_id")).fetchall()


def test_gopher_duckdb_parity_constructed(spark):
    got = sorted(
        tuple(r) for r in gopher_quality(_df(spark)).collect()
    )
    want = sorted(tuple(r) for r in _duck(DOCS, GOPHER_SQL_TEMPLATE))
    assert got == want


def test_c4_duckdb_parity_constructed(spark):
    got = sorted((r.doc_id, r.text) for r in c4_clean(_df(spark)).collect())
    want = sorted(tuple(r) for r in _duck(DOCS, C4_SQL_TEMPLATE))
    assert got == want


SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_parity_on_real_documents_table(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got_g = sorted(tuple(r) for r in gopher_quality(docs).collect())
    want_g = sorted(tuple(r) for r in _duck(rows, GOPHER_SQL_TEMPLATE))
    assert got_g == want_g
    got_c = sorted((r.doc_id, r.text) for r in c4_clean(docs).collect())
    want_c = sorted(tuple(r) for r in _duck(rows, C4_SQL_TEMPLATE))
    assert got_c == want_c


def test_plans_are_jvm_only(spark):
    d = _df(spark)
    for q in (gopher_quality(d), c4_clean(d)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

PII_DOCS = [
    ("p01", "Contact john.doe+spam@example-mail.co.uk or call +1 (555) 123-4567 today."),
    ("p02", "Server at 192.168.0.1 and 8.8.8.8; version 1.2 stays, 999.999.999.999 is not an IP."),
    ("p03", "Year 2024 and plain 1234567 are not phones; 555-123-9876 is."),
    ("p04", "No identifiers here at all, just regular prose."),
    ("p05", "Two mails a@b.io c@d.org and an ip 10.0.0.7 and +44 20 7946 0958."),
]


def test_pii_scrub_vectors(spark):
    from kraken_spark.functions.webfilter import pii_scrub

    df = spark.createDataFrame(PII_DOCS, "doc_id string, text string")
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out["p01"].n_emails == 1 and out["p01"].n_phones == 1
    assert "[EMAIL]" in out["p01"].text and "[PHONE]" in out["p01"].text
    assert "john.doe" not in out["p01"].text
    assert out["p02"].n_ips == 2
    assert "version 1.2 stays" in out["p02"].text
    # the non-IP dotted quad is still a separator-delimited digit sequence
    assert out["p02"].n_phones == 1 and "999.999" not in out["p02"].text
    assert out["p03"].n_phones == 1 and "2024" in out["p03"].text
    assert out["p04"].text == PII_DOCS[3][1]  # untouched doc byte-identical
    assert (out["p04"].n_emails, out["p04"].n_ips, out["p04"].n_phones) == (0, 0, 0)
    assert out["p05"].n_emails == 2 and out["p05"].n_ips == 1 and out["p05"].n_phones == 1


def test_pii_duckdb_parity_constructed_and_real(spark):
    from kraken_spark.functions.webfilter import pii_scrub, pii_sql

    df = spark.createDataFrame(PII_DOCS, "doc_id string, text string")
    got = sorted(map(tuple, pii_scrub(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", PII_DOCS)
    want = sorted(map(tuple, con.execute(pii_sql()).fetchall()))
    assert got == want

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if os.path.exists(f"{sf}/documents.parquet"):
        real = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        got = sorted(map(tuple, pii_scrub(real).collect()))
        con2 = duckdb.connect()
        con2.execute(
            "CREATE VIEW documents AS SELECT doc_id, text "
            f"FROM read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(map(tuple, con2.execute(pii_sql()).fetchall()))
        assert got == want


def test_pii_plan_is_map_only(spark):
    from kraken_spark.functions.webfilter import pii_scrub

    df = spark.createDataFrame(PII_DOCS, "doc_id string, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# Token-budget stratified sampling (corpus mixing)

from kraken_spark.functions.webfilter import (  # noqa: E402
    token_budget_sample,
    token_budget_sql,
)


def _duck_docs_lang(rows, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id VARCHAR, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    return con.execute(sql).fetchall()


MIX_DOCS = [
    (f"d{i:03d}", " ".join(f"w{j}" for j in range(10 + (i * 7) % 40)), lang)
    for i, lang in enumerate(
        ["en"] * 40 + ["fr"] * 12 + ["de"] * 3  # skewed strata
    )
]


def _mix_df(spark):
    return spark.createDataFrame(
        MIX_DOCS, "doc_id string, text string, lang string"
    )


def test_token_budget_sample_duckdb_parity(spark):
    for budgets in (None, {"fr": 10**9, "de": 0}):
        got = sorted(
            tuple(r)
            for r in token_budget_sample(
                _mix_df(spark), 300, budgets=budgets
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in _duck_docs_lang(
                MIX_DOCS, token_budget_sql(300, budgets=budgets)
            )
        )
        assert got == want


def test_token_budget_sample_semantics(spark):
    out = token_budget_sample(_mix_df(spark), 300).collect()
    assert len(out) == len(MIX_DOCS)  # every doc gets a verdict row
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r)
    # tiny stratum under budget: rate 1.0, everything sampled
    assert all(r.rate == 1.0 and r.sampled for r in by["de"])
    # over-budget stratum: rate < 1, sampled token mass near the budget
    en = by["en"]
    assert all(0 < r.rate < 1 for r in en)
    total = sum(r.n_tokens for r in en)
    kept = sum(r.n_tokens for r in en if r.sampled)
    assert kept < total
    assert abs(kept - 300) < 0.5 * total ** 0.5 * 40  # loose CLT band
    # determinism: same input -> identical sampled set
    again = token_budget_sample(_mix_df(spark), 300).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_token_budget_sample_real_documents_parity(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang"
    )
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
    got = sorted(
        tuple(r) for r in token_budget_sample(docs, 5000).collect()
    )
    want = sorted(tuple(r) for r in _duck_docs_lang(rows, token_budget_sql(5000)))
    assert got == want


def test_token_budget_sample_plan_broadcasts_totals(spark):
    plan = (
        token_budget_sample(_mix_df(spark), 300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


# ---------------------------------------------------------------------------
# Gopher repetition filters

from kraken_spark.functions.webfilter import (  # noqa: E402
    gopher_repetition,
    gopher_repetition_sql,
)

REP_DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog and then the quick brown fox jumps again"),
    ("d2", "spam spam spam spam spam spam spam spam spam spam"),
    ("d3", "line one\nline two\nline one\nline three\n\npara two\n\npara two"),
    ("d4", ""),
    # all-distinct words at a realistic (post-length-gate) size: no signal
    # may fire — top-ngram fractions are only meaningful past ~50 words
    ("d5", " ".join(f"word{i:02d}" for i in range(60))),
    ("d6", "a b\na b\na b\na b"),
    ("d7", "x"),
    ("d8", "alpha beta gamma delta " * 6),  # 4-word cycle: heavy n-gram dup
]


def test_gopher_repetition_signal_values(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id string, text string")
    out = {r.doc_id: r for r in gopher_repetition(df).collect()}
    # d6: 4 identical lines -> 3/4 dup lines, 9/12 dup chars
    assert out["d6"].dup_line_frac == 0.75
    assert out["d6"].dup_line_char_frac == 0.75
    # d2: "spam" x10 -> every 5..9-gram duplicated, the single 10-gram not
    for n in range(5, 10):
        assert out["d2"][f"dup_{n}gram_char_frac"] == 1.0
    assert out["d2"].top_2gram_char_frac == 1.0
    assert out["d2"].dup_10gram_char_frac == 0.0
    assert not out["d2"].passes_repetition
    # clean short docs pass
    assert out["d5"].passes_repetition
    assert out["d4"].passes_repetition  # empty text: all signals 0
    # d8: exact 4-word cycle -> 4 rotations split the 4-gram mass; the top
    # one holds 6 of 21 occurrences, well above the 0.16 threshold
    assert out["d8"].top_4gram_char_frac == pytest.approx(6 / 21, abs=1e-6)
    assert not out["d8"].passes_repetition


def _duck_rep(rows):
    # NOTE: not _duck — gopher_repetition_sql() is already fully
    # interpolated and contains regex {2,} braces .format would eat
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con.execute(gopher_repetition_sql()).fetchall()


def test_gopher_repetition_duckdb_parity_constructed(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id string, text string")
    got = sorted(tuple(r) for r in gopher_repetition(df).collect())
    want = sorted(tuple(r) for r in _duck_rep(REP_DOCS))
    assert got == want


def test_gopher_repetition_parity_real_documents(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got = sorted(tuple(r) for r in gopher_repetition(docs).collect())
    want = sorted(tuple(r) for r in _duck_rep(rows))
    assert got == want


def test_gopher_repetition_plan_is_map_only(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id string, text string")
    plan = gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: sort+fold per row
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
