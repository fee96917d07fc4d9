"""Benchmark decontamination (functions/dedup.decontaminate — the GPT-3
appendix-C / FineWeb 13-gram overlap rule): verbatim-copy detection through
case/punctuation noise, paraphrase immunity, DuckDB parity on constructed
and real tables, and the broadcast-join plan guard (the corpus side must
never shuffle for the membership test).
"""

import duckdb
import pytest

from kraken_spark.functions.dedup import DECONTAM_K, DECONTAM_SQL_TEMPLATE, decontaminate

SF = "/root/testdata/sf0.001"

BENCH = [
    (100, "What is the capital of France? The capital of France is Paris, "
          "a city on the Seine known for its museums and cafes."),
    (101, "Solve for x: if three times x plus seven equals twenty two then "
          "x equals five exactly as shown in the worked solution."),
]

DOCS = [
    # verbatim copy of a benchmark span (>= 13 normalized words), with
    # different case + punctuation — must be flagged
    (1, "the CAPITAL of france IS paris; a city on the seine... known for "
        "its museums and cafes!! plus extra trailing words here"),
    # paraphrase — must NOT be flagged
    (2, "Paris, France's capital, sits on the Seine and is famous for art "
        "museums along with pleasant cafes throughout the city."),
    # unrelated prose
    (3, "The committee convened on Thursday to weigh the annual budget "
        "against revised projections from the finance office."),
    # too-short overlap (< 13 shared words) — must NOT be flagged
    (4, "The capital of France is Paris, a lovely place."),
    (5, ""),
]


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-decontam", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    return docs, bench


def test_verdicts(spark):
    docs, bench = _dfs(spark)
    got = {r.doc_id: (r.n_contaminated_grams, r.contaminated) for r in decontaminate(docs, bench).collect()}
    assert got[1][1] is True and got[1][0] > 0
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (0, False)


def test_duckdb_parity_constructed_and_real(spark):
    docs, bench = _dfs(spark)
    got = sorted(
        (r.doc_id, r.n_contaminated_grams, r.contaminated)
        for r in decontaminate(docs, bench).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    con.execute("CREATE TABLE benchmark(bench_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO benchmark VALUES (?, ?)", BENCH)
    sql = DECONTAM_SQL_TEMPLATE.format(id_col="doc_id", k=DECONTAM_K)
    assert got == sorted(con.execute(sql).fetchall())

    # real documents table vs a benchmark built from two of its own docs:
    # those two docs (and any verbatim near-copies) flag, the rest don't
    real = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bench_real = real.limit(2).selectExpr("doc_id AS bench_id", "text")
    got_real = sorted(
        (r.doc_id, r.n_contaminated_grams, r.contaminated)
        for r in decontaminate(real, bench_real).collect()
    )
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    bench_ids = [r.bench_id for r in bench_real.collect()]
    con2.execute(
        "CREATE VIEW benchmark AS SELECT doc_id AS bench_id, text FROM documents "
        f"WHERE doc_id IN ({bench_ids[0]}, {bench_ids[1]})"
    )
    want_real = sorted(con2.execute(sql).fetchall())
    assert got_real == want_real and len(got_real) == 500
    flagged = {d for d, n, c in got_real if c}
    assert set(bench_ids) <= flagged or all(
        len((r.text or "").split()) < DECONTAM_K for r in bench_real.collect()
    )


def test_benchmark_side_broadcasts(spark):
    docs, bench = _dfs(spark)
    plan = decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
