"""In-repo-trained model-based quality classifier (kernels/quality_train.py
+ functions/webfilter.quality_classifier): training reproducibility against
the shipped asset, perfect held-out separation across evaluation seeds
disjoint from the training seed, exact three-way parity (python kernel ==
Spark codegen expr == DuckDB oracle) on constructed and real documents,
and the map-only plan guard (the 10^12-doc shape: zero shuffle).
"""

import os

import duckdb
import numpy as np
import pytest

from kraken_spark.kernels import quality_train as qt
from kraken_spark.functions.webfilter import quality_classifier, quality_sql

EVAL_SEEDS = (990123, 424242, 550001)  # disjoint from training seed 771001


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-quality", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="module")
def model():
    return qt.load_model()


def test_training_reproduces_shipped_asset(model):
    m = qt.train()
    assert m["bias_q"] == model["bias_q"]
    assert np.array_equal(
        np.asarray(m["weights_q"], dtype=np.int64), model["weights_q"]
    )


def test_heldout_separation_every_seed(model):
    wq, bq = model["weights_q"], model["bias_q"]
    for seed in EVAL_SEEDS:
        texts, y = qt.gen_corpus(seed, 200)
        logits = np.array([qt.logit_q(t, wq, bq) for t in texts])
        # perfect separation with a wide margin on every held-out seed
        assert ((logits >= 0) == (y == 1)).all(), seed
        assert logits[y == 1].min() > 500_000, seed
        assert logits[y == 0].max() < -50_000, seed


def test_repetition_cannot_buy_score(model):
    """The presence-feature property: keyword-stuffing a few prose words
    scores exactly the same as saying them once — and stays junk."""
    wq, bq = model["weights_q"], model["bias_q"]
    once = "river mountain library science"
    stuffed = " ".join([once] * 50)
    assert qt.logit_q(once, wq, bq) == qt.logit_q(stuffed, wq, bq)
    assert qt.logit_q(stuffed, wq, bq) < 0


CONSTRUCTED = [
    ("d01", "The river was long and the morning light came over the water."),
    ("d02", "click here buy cheap casino bonus free download winner prize " * 4),
    ("d03", ""),  # empty: logit == bias
    ("d04", "$$$ ### 12345 67890 @@@"),
    ("d05", "Home About Contact Login Register Next Previous Page Sitemap " * 3),
    ("d06", "ThE RiVeR wAs LoNg AnD tHe MoRnInG lIgHt CaMe OvEr ThE wAtEr."),
]


def test_python_kernel_matches_spark(spark, model):
    df = spark.createDataFrame(CONSTRUCTED, "doc_id string, text string")
    got = {r.doc_id: (r.ml_logit_q, r.ml_pass) for r in quality_classifier(df).collect()}
    for doc_id, text in CONSTRUCTED:
        want = qt.logit_q(text, model["weights_q"], model["bias_q"])
        assert got[doc_id] == (want, want >= 0), doc_id
    # empty text scores exactly the bias
    assert got["d03"][0] == model["bias_q"]
    # case folding: mixed-case prose == lowercase prose
    assert got["d06"][0] == got["d01"][0]


def _duck(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_duckdb_parity_constructed_and_real(spark):
    df = spark.createDataFrame(CONSTRUCTED, "doc_id string, text string")
    got = sorted(tuple(r) for r in quality_classifier(df).collect())
    assert got == _duck(CONSTRUCTED, quality_sql())

    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got_real = sorted(tuple(r) for r in quality_classifier(docs).collect())
    assert got_real == _duck(rows, quality_sql())


def test_plan_is_map_only(spark):
    df = spark.createDataFrame(CONSTRUCTED, "doc_id string, text string")
    plan = quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
    assert "Exchange" not in plan  # zero shuffle: pure projection
