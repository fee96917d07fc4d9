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
