"""CCNet-style character-trigram LM (kernels/lm_train.py + webfilter
lm_score): asset reproducibility, prose-vs-junk separation on held-out
seeds, python==Spark==DuckDB three-way parity, and the zero-Exchange
plan guard for the codegen scorer.
"""

import json

import duckdb
import numpy as np
import pytest

from kraken_spark.kernels.lm_train import (
    ASSET,
    doc_sum_q,
    load_lm,
    train_lm,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-lm", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_asset_reproducible():
    m = train_lm()
    with open(ASSET) as f:
        on_disk = json.load(f)
    assert m == {**on_disk}


def test_prose_junk_separation_held_out_seeds():
    """On three evaluation seeds disjoint from training seed 773001, prose
    must score clearly above junk on the per-char mean (a >=1.5e6 gap in
    quantized units ~ 1.5 nats/char), and the head threshold must sit
    above the junk mean."""
    from kraken_spark.kernels.quality_train import gen_good, gen_junk

    m = load_lm()
    for seed in (5, 1234, 882001):
        rng = np.random.default_rng(seed)
        good = [gen_good(rng) for _ in range(40)]
        junk = [gen_junk(rng) for _ in range(40)]

        def mean_q(t):
            s, n = doc_sum_q(t, m["logp_q"])
            return s / n

        gm = float(np.mean([mean_q(t) for t in good]))
        jm = float(np.mean([mean_q(t) for t in junk]))
        assert gm - jm > 1.5e6, (seed, gm, jm)
        assert m["tail_thr"] > jm, (seed, jm)


def test_three_way_parity_constructed_and_real(spark):
    from kraken_spark.functions.webfilter import lm_score, lm_sql

    m = load_lm()
    rows = [
        (1, "The river flows past the old library each morning."),
        (2, "buy cheap pills casino bonus winner " * 5),
        (3, ""),
        (4, "ab"),
        (5, "Mixed CASE text, with punctuation! And digits 123."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.lm_sum_q, r.lm_n_tri, r.lm_mean_q, r.lm_bucket) for r in lm_score(docs).collect()}
    # python kernel parity
    for i, t in rows:
        s, n = doc_sum_q(t, m["logp_q"])
        assert got[i][0] == s and got[i][1] == n, (i, got[i], s, n)
    # DuckDB parity (constructed)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: tuple(r[1:]) for r in con.execute(lm_sql("doc_id")).fetchall()}
    assert got == want
    # DuckDB parity (real sf0.001 documents)
    real = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got_real = {r.doc_id: (r.lm_sum_q, r.lm_mean_q, r.lm_bucket) for r in lm_score(real).collect()}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want_real = {r[0]: (r[1], r[3], r[4]) for r in con2.execute(lm_sql("doc_id")).fetchall()}
    assert got_real == want_real and len(got_real) == 500


def test_lm_score_plan_is_map_only(spark):
    from kraken_spark.functions.webfilter import lm_score

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_ccnet_quality_weighted_mixing(spark):
    """The CCNet recipe end-to-end: lm_score's head/middle/tail bucket IS
    the stratum for token_budget_sample — head kept (large budget), tail
    aggressively downsampled. Pure composition of two oracle-checked
    pieces; deterministic across runs."""
    import pyspark.sql.functions as F

    from kraken_spark.functions.webfilter import lm_score, token_budget_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    lm = lm_score(docs).select("doc_id", "lm_bucket")
    staged = docs.join(lm, "doc_id")
    out = token_budget_sample(
        staged,
        budget_tokens=10_000_000,  # default: keep everything
        strata_col="lm_bucket",
        budgets={"tail": 200},     # tail: ~200 tokens' worth survives
    )
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        k = by_bucket.setdefault(r.stratum, [0, 0])
        k[0] += 1
        k[1] += int(r.sampled)
    # every head/middle doc survives; the tail is hard-downsampled
    for b in ("head", "middle"):
        if b in by_bucket:
            assert by_bucket[b][1] == by_bucket[b][0], by_bucket
    assert "tail" in by_bucket and by_bucket["tail"][1] < by_bucket["tail"][0]
    # deterministic: a second run keeps the identical doc set
    again = {r.doc_id for r in token_budget_sample(
        staged, budget_tokens=10_000_000, strata_col="lm_bucket",
        budgets={"tail": 200}).collect() if r.sampled}
    assert again == {r.doc_id for r in rows if r.sampled}
