"""Multimodal query-plan tests: LSH page-kNN recall vs exact brute force,
and the dedup scale guards (Jaccard df cap, SimHash no-explode plan).
"""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")

import pyspark.sql.functions as F  # noqa: E402

from kraken_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-mm", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _bruteforce_page_knn(spark, sf, k=3):
    """Exact top-k cosine per page over the same tile embeddings —
    the recall reference for the LSH-bucketed x_page_knn."""
    from kraken_spark.operators.multimodal import x_doc_embeddings

    emb = x_doc_embeddings(spark, sf)
    dot = (
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    a = emb.select(F.col("url").alias("a_url"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("url").alias("b_url"), F.col("embedding").alias("b_emb"))
    from pyspark.sql import Window

    w = Window.partitionBy("a_url").orderBy(F.desc("cos"), "b_url")
    return (
        a.crossJoin(b)
        .filter(F.col("a_url") != F.col("b_url"))
        .withColumn("cos", F.round(F.expr(dot), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a_url", "b_url")
    )


def test_page_knn_lsh_recall(spark):
    """The LSH-bucketed x_page_knn must recover most of the exact top-3
    neighbor pairs (tile embeddings of same-layout pages sit at high
    cosine, where hyperplane LSH agreement is strong)."""
    from kraken_spark.operators.multimodal import x_page_knn

    exact = {(r.a_url, r.b_url) for r in _bruteforce_page_knn(spark, SF).collect()}
    got = {(r.a_url, r.b_url) for r in x_page_knn(spark, SF).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, f"page-kNN LSH recall {recall:.2f} < 0.7"


def test_page_knn_plan_has_no_cartesian(spark):
    """The candidate join must be an equi-join on (tbl, bucket) — no
    CartesianProduct / BroadcastNestedLoopJoin in the physical plan."""
    from kraken_spark.operators.multimodal import x_page_knn

    plan = x_page_knn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_df_cap_drops_hot_shingles(spark, tmp_path, monkeypatch):
    """A shingle present in more than DF_CAP documents must not generate
    candidate pairs: docs sharing ONLY boilerplate stay un-paired, while
    genuine near-duplicates still pair."""
    import kraken_spark.functions.dedup as dd

    monkeypatch.setattr(dd, "DF_CAP", 4)
    boiler = "all rights reserved worldwide under the berne convention " * 4
    uniq = [f"document number {i} body {'x%d ' % i * 30}" for i in range(8)]
    rows = [(i, boiler + uniq[i], "en", "t", len(boiler)) for i in range(8)]
    # two true near-dups sharing a long rare tail
    tail = " ".join(f"zq{i}" for i in range(120))
    rows.append((100, "alpha " + tail, "en", "t", 10))
    rows.append((101, "alphb " + tail, "en", "t", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    pairs = dd.dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (100, 101) in got, "true near-dup pair lost by the df cap"
    # boilerplate shingles have df=8 > 4 -> no pair among docs 0..7
    assert all(a >= 100 for a, b in got), f"hot-shingle pairs leaked: {got}"


def test_audio_features_plumbing(spark):
    """Audio modality: deterministic-fake decode, real mapInPandas chain —
    stable per-content features, one row per clip."""
    from kraken_spark.operators.multimodal import audio_features

    docs = spark.createDataFrame(
        [("a", b"blob-one"), ("b", b"blob-two"), ("c", b"blob-one")],
        "url string, html binary",
    )
    rows = {r.url: r for r in audio_features(docs).collect()}
    assert len(rows) == 3
    # same bytes -> identical features (deterministic decode)
    assert rows["a"].dominant_bin == rows["c"].dominant_bin
    assert rows["a"].rms == rows["c"].rms
    # different bytes -> content-dependent dominant tone
    assert rows["a"].dominant_bin != rows["b"].dominant_bin
    assert all(r.duration_s == 1.0 and r.n_frames == 31 for r in rows.values())


def test_simhash_plan_has_no_bit_explode(spark):
    """The SimHash plan must contain exactly one generator (the word
    explode) — the per-bit explode would multiply shuffle volume 32x."""
    from kraken_spark.functions.dedup import dedup_simhash

    plan = dedup_simhash(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") <= 1
