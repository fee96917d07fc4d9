"""Exact-substring dedup (functions/dedup.exact_substring_dedup): the Lee
et al. 2021 duplicated-span rule — semantics on constructed corpora, the
keeper-wins / within-doc-repeat pins, exact DuckDB parity on constructed +
real sf0.001 documents, and the JVM-only plan guard.
"""

import os

import duckdb
import pytest

from kraken_spark.functions.dedup import (
    EXACT_SUBSTRING_SQL_TEMPLATE,
    duplicated_span_report,
    exact_substring_dedup,
)

K = 4  # small window for readable vectors; the default is the paper's 50

SPAN = "alpha beta gamma delta"  # exactly K tokens
DOCS = [
    ("u1", f"intro words {SPAN} trailing tail"),          # keeper (min url)
    ("u2", f"other opening {SPAN} different ending"),     # loses the span
    ("u3", "completely unrelated text with no shared windows at all"),
    ("u4", f"{SPAN} {SPAN}"),                             # loses both copies
    ("u5", ""),                                            # empty doc
]


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-exactsub", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "url string, text string")


def test_span_semantics_keeper_wins(spark):
    out = {r.url: r.text for r in exact_substring_dedup(_df(spark), k=K).collect()}
    assert set(out) == {"u1", "u2", "u3", "u4", "u5"}
    # keeper (smallest url containing the span) is byte-identical
    assert out["u1"] == DOCS[0][1]
    # the duplicated window is cut from u2; surrounding words survive
    assert out["u2"] == "other opening different ending"
    # untouched docs byte-identical (incl. the empty one)
    assert out["u3"] == DOCS[2][1]
    assert out["u5"] == ""
    # u4 is all duplicated spans (both copies + the straddling windows)
    assert out["u4"] == ""


def test_within_doc_repeat_is_not_corpus_duplication(spark):
    one = [
        ("a", f"{SPAN} filler words here {SPAN}"),
        ("b", "nothing in common with the other document at all okay"),
    ]
    out = {r.url: r.text for r in exact_substring_dedup(_df(spark, one), k=K).collect()}
    # the span repeats only within one doc -> < 2 distinct urls -> kept
    assert out["a"] == one[0][1]
    assert out["b"] == one[1][1]


def test_longer_than_k_spans_fully_removed(spark):
    long_span = "one two three four five six seven"  # 7 tokens > K
    rows = [
        ("a", f"head {long_span} tail"),
        ("b", f"pre {long_span} post"),
    ]
    out = {r.url: r.text for r in exact_substring_dedup(_df(spark, rows), k=K).collect()}
    assert out["a"] == rows[0][1]  # keeper untouched
    # every word of the long span is covered by some duplicated k-window
    assert out["b"] == "pre post"


def test_short_docs_pass_through(spark):
    rows = [("a", "only three words"), ("b", "only three words")]
    out = {r.url: r.text for r in exact_substring_dedup(_df(spark, rows), k=K).collect()}
    # < K tokens: no windows exist, identical short docs are NOT spans
    assert out == dict(rows)


def test_span_report(spark):
    rep = {r.gram: (r.n_docs, r.keeper)
           for r in duplicated_span_report(_df(spark), k=K).collect()}
    assert rep[SPAN][0] >= 2 and rep[SPAN][1] == "u1"


def _duckdb_expected(rows, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return dict(con.execute(EXACT_SUBSTRING_SQL_TEMPLATE.format(k=k)).fetchall())


def test_duckdb_parity_constructed(spark):
    got = {r.url: r.text for r in exact_substring_dedup(_df(spark), k=K).collect()}
    assert got == _duckdb_expected(DOCS, K)


def test_duckdb_parity_real_documents(spark):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("no testdata")
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .withColumnRenamed("doc_id", "url")
    )
    k = 8  # small enough to fire on the synthetic corpus
    got = {r.url: r.text for r in exact_substring_dedup(docs, k=k).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id AS url, text "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    want = dict(con.execute(EXACT_SUBSTRING_SQL_TEMPLATE.format(k=k)).fetchall())
    assert got == want
    assert len(got) == docs.count()


def test_plan_is_jvm_only(spark):
    plan = (
        exact_substring_dedup(_df(spark), k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
