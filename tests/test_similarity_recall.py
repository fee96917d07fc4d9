"""ANN recall vs exact brute force (the correctness criterion the rows-only
driver check can't express)."""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")

from kraken_spark.functions.similarity import (  # noqa: E402
    ann_ivf_cosine,
    ann_lsh_cosine,
    knn_cosine_bruteforce,
)
from kraken_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-sim", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def exact(spark):
    return {(r.q_id, r.c_id) for r in knn_cosine_bruteforce(spark, SF).collect()}


def test_ivf_recall(spark, exact):
    got = {(r.q_id, r.c_id) for r in ann_ivf_cosine(spark, SF).collect()}
    assert len(exact & got) / len(exact) >= 0.8


def test_lsh_recall(spark, exact):
    got = {(r.q_id, r.c_id) for r in ann_lsh_cosine(spark, SF).collect()}
    assert len(exact & got) / len(exact) >= 0.6


def test_lsh_bucket_cap_bounds_degenerate_skew(spark):
    """A degenerate corpus (near-constant embeddings) hashes every row
    into ONE bucket per table — uncapped, the bucket self-join is
    quadratic on that key. With bucket_cap the survivor set per
    (tbl, bucket) is bounded and every surviving row is flagged
    bucket_truncated (no silent cap); an un-skewed corpus under the same
    cap is untouched and unflagged."""
    import pyspark.sql.functions as F

    from kraken_spark.functions.similarity import N_TABLES, _lsh_tables

    n, cap = 200, 16
    const = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(0.5 AS FLOAT))").alias("embedding"),
    )
    capped = _lsh_tables(const, bucket_cap=cap).select(
        "vec_id", "tbl", "bucket", "bucket_truncated"
    )
    per_bucket = capped.groupBy("tbl", "bucket").count().collect()
    assert per_bucket and all(r["count"] <= cap for r in per_bucket)
    assert capped.count() == N_TABLES * cap  # all rows collide -> cap rows/table
    assert all(r.bucket_truncated for r in capped.collect())
    # survivor set is the deterministic first-by-order_col prefix
    survivors = {r.vec_id for r in capped.filter(F.col("tbl") == 0).collect()}
    assert survivors == set(range(cap))

    # un-skewed corpus: same cap leaves every row in place, nothing flagged
    from kraken_spark.functions.similarity import t as _t

    normal = _lsh_tables(_t(spark, SF), bucket_cap=10**6)
    assert normal.filter(F.col("bucket_truncated")).count() == 0
    assert normal.count() == _lsh_tables(_t(spark, SF)).count()
