"""Paragraph-level corpus dedup (functions/dedup.py): the C4/RefinedWeb
repeated-line rule — semantics on a constructed corpus, formatting
preservation, and exact DuckDB parity on both the constructed corpus and
the real sf0.001 documents table.
"""

import os

import duckdb
import pytest

from kraken_spark.functions.dedup import (
    MIN_PARA_LEN,
    STRIP_PARAGRAPHS_SQL_TEMPLATE,
    repeated_paragraph_report,
    strip_repeated_paragraphs,
)

BOILER = "Subscribe to our newsletter for more updates!"
COOKIE = "This site uses cookies to improve your experience."

DOCS = [
    ("u1", f"{BOILER}\nAlpha unique content line one.\n\nshort\n{COOKIE}"),
    ("u2", f"Beta unique content line two.\n{BOILER}\n{COOKIE}"),
    ("u3", f"Gamma unique content line three.\nGamma second line here."),
    ("u4", f"{BOILER}\n{COOKIE}"),  # fully boilerplate
    ("u5", ""),  # empty doc
]


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-paradedup", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "url string, text string")


def test_strip_semantics_and_formatting(spark):
    out = {r.url: r.text for r in strip_repeated_paragraphs(_docs_df(spark)).collect()}
    assert set(out) == {"u1", "u2", "u3", "u4", "u5"}
    # repeated paragraphs gone; unique content, empty lines, short lines kept
    assert out["u1"] == "Alpha unique content line one.\n\nshort"
    assert out["u2"] == "Beta unique content line two."
    # untouched doc is byte-identical
    assert out["u3"] == DOCS[2][1]
    # fully-boilerplate and empty docs still present
    assert out["u4"] == ""
    assert out["u5"] == ""


def test_report_doc_frequencies(spark):
    rep = {
        r.para: r.n_docs
        for r in repeated_paragraph_report(_docs_df(spark)).collect()
    }
    assert rep == {BOILER: 3, COOKIE: 3}
    # within-doc repetition alone does not make boilerplate (distinct urls)
    one = spark.createDataFrame(
        [("a", "Repeated inside one doc only.\nRepeated inside one doc only.")],
        "url string, text string",
    )
    assert repeated_paragraph_report(one).count() == 0
    assert {
        r.url: r.text for r in strip_repeated_paragraphs(one).collect()
    } == {"a": "Repeated inside one doc only.\nRepeated inside one doc only."}


def _duckdb_expected(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = STRIP_PARAGRAPHS_SQL_TEMPLATE.format(min_len=MIN_PARA_LEN, min_repeats=2)
    return dict(con.execute(sql).fetchall())


def test_duckdb_parity_constructed(spark):
    got = {r.url: r.text for r in strip_repeated_paragraphs(_docs_df(spark)).collect()}
    assert got == _duckdb_expected(DOCS)


def test_duckdb_parity_real_documents(spark):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("no testdata")
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .withColumnRenamed("doc_id", "url")
    )
    got = {r.url: r.text for r in strip_repeated_paragraphs(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id AS url, text "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = STRIP_PARAGRAPHS_SQL_TEMPLATE.format(min_len=MIN_PARA_LEN, min_repeats=2)
    want = dict(con.execute(sql).fetchall())
    assert got == want
    assert len(got) == docs.count()


def test_plan_is_jvm_only(spark):
    plan = (
        strip_repeated_paragraphs(_docs_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
