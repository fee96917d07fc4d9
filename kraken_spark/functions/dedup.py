"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four are pure relational plans (explode/groupBy/join — no Python UDFs),
so they scale as ordinary shuffles and stay verifiable against DuckDB. The
cross-engine hash primitive is `md5` (identical bytes in both engines); the
first 8 hex chars are cast to BIGINT for numeric hashing:
Spark `conv(substr(md5(s),1,8),16,10)` == DuckDB `('0x'||substr(md5(s),1,8))::BIGINT`.

Shingles are character 7-grams; at 100 TB scale the shingle explode is the
dominant shuffle, which is why minhash_lsh reduces each document to a
16-value signature (4 bands x 4 rows) before any pairwise work — the
band-bucket join replaces the quadratic candidate generation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS


def t(spark: SparkSession, sf_dir: str, name: str = "documents"):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _shingles(spark, sf):
    """distinct (doc_id, shingle) pairs — char 7-grams."""
    d = t(spark, sf)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 6, 1)), i -> substr(text, i, 7))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


_SHINGLES_CTE = """
shingles AS (
  SELECT DISTINCT doc_id, s AS shingle
  FROM documents,
       LATERAL unnest(list_transform(generate_series(1, greatest(length(text) - 6, 1)),
                                     i -> substr(text, i, 7))) AS u(s))
"""


def dedup_exact(spark, sf):
    """Exact dedup via content-hash groupBy: cluster histogram."""
    d = t(spark, sf)
    clusters = d.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("rep")
    )
    return (
        clusters.groupBy("n_docs")
        .agg(F.count("*").alias("n_clusters"), F.min("rep").alias("min_rep"))
        .orderBy("n_docs")
    )


DEDUP_EXACT_SQL = """
WITH clusters AS (
  SELECT md5(text) AS h, COUNT(*) AS n_docs, MIN(doc_id) AS rep
  FROM documents GROUP BY 1)
SELECT n_docs, COUNT(*) AS n_clusters, MIN(rep) AS min_rep
FROM clusters GROUP BY n_docs ORDER BY n_docs
"""


def dedup_ngram_jaccard(spark, sf):
    """Pairwise n-gram Jaccard >= 0.5 (same-shingle join, ordered pairs)."""
    sh = _shingles(spark, sf)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
ORDER BY doc_a, doc_b
"""


def dedup_minhash_lsh(spark, sf):
    """MinHash (16 perms) + LSH banding (4 bands x 4): candidate pairs from
    band-bucket collisions, verified with exact signature agreement ratio."""
    sh = _shingles(spark, sf)
    perms = sh.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {N_PERM - 1})")).alias("perm"),
        "shingle",
    )
    hashed = perms.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("perm"), F.col("shingle"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
    )
    sig = hashed.groupBy("doc_id", "perm").agg(F.min("h").alias("minhash"))
    bands = (
        sig.withColumn("band", (F.col("perm") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws("=", "perm", "minhash"))))).alias("band_key"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    siga = sig.select(F.col("doc_id").alias("doc_a"), "perm", F.col("minhash").alias("ma"))
    sigb = sig.select(F.col("doc_id").alias("doc_b"), "perm", F.col("minhash").alias("mb"))
    return (
        cand.join(siga, "doc_a")
        .join(sigb, ["doc_b", "perm"])
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.avg((F.col("ma") == F.col("mb")).cast("double")), 6).alias("sig_agreement"))
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, perm,
         CAST(('0x' || substr(md5(perm || ':' || shingle), 1, 8)) AS BIGINT) AS h
  FROM shingles, LATERAL unnest(generate_series(0, {N_PERM - 1})) AS p(perm)),
sig AS (SELECT doc_id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
bands AS (
  SELECT doc_id, CAST(perm // {ROWS_PER_BAND} AS INT) AS band,
         md5(string_agg(perm || '=' || minhash, ',' ORDER BY perm || '=' || minhash)) AS band_key
  FROM sig GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       ROUND(AVG(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6) AS sig_agreement
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b AND sb.perm = sa.perm
GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b
"""


def dedup_simhash(spark, sf):
    """32-bit SimHash over word hashes: per-bit majority vote, cluster by
    fingerprint value."""
    d = t(spark, sf)
    words = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    wh = words.withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
    )
    bits = wh.select(
        "doc_id", F.explode(F.expr("sequence(0, 31)")).alias("bit"), "h"
    ).withColumn(
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    perbit = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    sim = perbit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(0)
        ).alias("simhash")
    )
    return (
        sim.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep"))
        .groupBy("n_docs")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("n_docs")
    )


DEDUP_SIMHASH_SQL = """
WITH words AS (
  SELECT doc_id, w FROM documents,
       LATERAL unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)),
wh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h FROM words),
bits AS (
  SELECT doc_id, bit, CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM wh, LATERAL unnest(generate_series(0, 31)) AS b(bit)),
perbit AS (SELECT doc_id, bit, SUM(vote) AS v FROM bits GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS simhash
  FROM perbit GROUP BY doc_id),
clusters AS (
  SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS rep FROM sim GROUP BY 1)
SELECT n_docs, COUNT(*) AS n_clusters FROM clusters GROUP BY n_docs ORDER BY n_docs
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
}
