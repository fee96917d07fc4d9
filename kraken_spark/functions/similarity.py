"""Similarity search over the `embeddings` table (array<float> column).

Brute-force cosine top-k as the verified baseline (native higher-order
functions: zip_with + aggregate, JVM-side — no UDF), and a random-hyperplane
LSH-bucketed variant as the scale path (candidate set shrinks from N to the
bucket population; rows-only driver check, recall asserted in pytest since
float sign() near zero is not bit-stable across engines).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

TOP_K = 5
N_QUERIES = 10
N_PLANES = 8


def t(spark: SparkSession, sf_dir: str, name: str = "embeddings"):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


_QUANT = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_IDOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"


def knn_cosine_bruteforce(spark, sf):
    """Exact top-k cosine neighbors for the first N_QUERIES vectors.

    Vectors are quantized to integers (x1000) first so the dot product is an
    order-independent BIGINT sum — bit-identical across engines, unlike
    float summation whose result depends on accumulation order. The cosine
    then uses only IEEE-exact ops (sqrt, /, *) on exact integers.
    """
    e = t(spark, sf).select(
        "vec_id",
        "label",
        F.expr(_QUANT).alias("vq"),
    ).withColumn("n2", F.expr(_IDOT.format(a="vq", b="vq")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("vq").alias("q_emb"), F.col("n2").alias("qn2")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("vq").alias("c_emb"), F.col("n2").alias("cn2"), "label"
    )
    pairs = q.crossJoin(c).filter(F.col("q_id") != F.col("c_id"))
    cos = F.expr(_IDOT.format(a="q_emb", b="c_emb")) / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "c_id")
    return (
        pairs.withColumn("cos_r", F.round(cos, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cos_r", "rk", "label")
        .orderBy("q_id", "rk")
    )


KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
  FROM embeddings),
en AS (
  SELECT vec_id, label, vq,
         list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * vq[i])) AS n2
  FROM e),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label,
         ROUND(list_sum(list_transform(generate_series(1, len(q.vq)), i -> q.vq[i] * c.vq[i]))
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))), 6) AS cos_r
  FROM en q, en c WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
ranked AS (
  SELECT q_id, c_id, cos_r, label,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rk
  FROM pairs)
SELECT q_id, c_id, cos_r, rk, label FROM ranked WHERE rk <= {TOP_K} ORDER BY q_id, rk
"""


def embedding_norm_stats(spark, sf):
    """Per-label vector statistics — aggregate() over the array column."""
    e = t(spark, sf)
    norm = F.expr(_NORM.format(a="embedding"))
    mean_comp = F.expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE)) / size(embedding)"
    )
    return (
        e.select("label", norm.alias("norm"), mean_comp.alias("mean_comp"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.avg("mean_comp"), 6).alias("avg_mean_comp"),
        )
        .orderBy("label")
    )


NORM_STATS_SQL = """
WITH s AS (
  SELECT label, sqrt(list_dot_product(embedding, embedding)) AS norm,
         list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE))) / len(embedding) AS mean_comp
  FROM embeddings)
SELECT label, COUNT(*) AS n_vecs, ROUND(AVG(norm), 6) AS avg_norm,
       ROUND(AVG(mean_comp), 6) AS avg_mean_comp
FROM s GROUP BY label ORDER BY label
"""


def _lsh_buckets(e):
    """Deterministic random-hyperplane signatures: plane j component d has
    sign from md5(j:d) — reproducible without any RNG state."""
    sig_parts = []
    for j in range(N_PLANES):
        dot = F.expr(
            f"""aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
                  (v, d) -> CAST(v AS DOUBLE) * (CASE WHEN substr(md5(concat('{j}', ':', d)), 1, 1) < '8' THEN 1.0 ELSE -1.0 END)),
                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""
        )
        sig_parts.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**j))
    bucket = sig_parts[0]
    for p in sig_parts[1:]:
        bucket = bucket + p
    return e.withColumn("bucket", bucket)


def ann_lsh_cosine(spark, sf):
    """ANN via hyperplane-LSH bucket join, exact rerank inside buckets.

    No oracle SQL (float sign boundaries aren't bit-stable across engines);
    recall vs brute force is asserted in tests/test_similarity.py.
    """
    e = _lsh_buckets(t(spark, sf))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), F.col("bucket").alias("qb")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), F.col("bucket").alias("cb"))
    pairs = q.join(c, (F.col("qb") == F.col("cb")) & (F.col("q_id") != F.col("c_id")))
    cos = F.expr(
        _DOT.format(a="q_emb", b="c_emb")
        + " / ("
        + _NORM.format(a="q_emb")
        + " * "
        + _NORM.format(a="c_emb")
        + ")"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "c_id")
    return (
        pairs.withColumn("cos_r", F.round(cos, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cos_r", "rk")
        .orderBy("q_id", "rk")
    )


QUERIES = {
    "knn_cosine_bruteforce": (knn_cosine_bruteforce, KNN_SQL),
    "embedding_norm_stats": (embedding_norm_stats, NORM_STATS_SQL),
    "ann_lsh_cosine": (ann_lsh_cosine, None),
}
