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


N_TABLES = 8
PLANES_PER_TABLE = 3

# bucket-population cap for consumers that self-join buckets: a degenerate
# corpus (near-constant embeddings) hashes ~N rows into ONE bucket and the
# bucket join goes quadratic on that key — the cap bounds any bucket's
# contribution to cap^2 pairs per table. Never silent: capped rows carry
# bucket_truncated=true so consumers can surface partial candidate sets.
BUCKET_CAP = 512


def _lsh_tables(e, bucket_cap: int | None = None, order_col: str = "vec_id"):
    """Deterministic random-hyperplane signatures with OR-amplification:
    N_TABLES hash tables of PLANES_PER_TABLE planes each (one row per
    (vector, table) after the explode). Plane j's component d has sign from
    md5(j:d) — reproducible without any RNG state.

    Sizing: this corpus's true top-5 neighbors sit at cos ~0.32 (theta ~71
    deg), so per-plane agreement is only ~0.6 — a single wide signature has
    ~0.6^8 = 2% recall. 8 tables x 3 planes gives 1-(1-0.6^3)^8 ~ 0.86
    expected recall; the flip side is weak pruning (each table's bucket
    holds ~N/8), which is intrinsic to hyperplane LSH at mid similarity —
    the IVF variant below prunes better on this data."""
    # quantize ONCE into a column; the 24 plane dots and the post-explode
    # consumers all reference it instead of re-evaluating the transform
    e = e.withColumn("_vq", F.expr(_QUANT))
    tables = []
    for ti in range(N_TABLES):
        sig_parts = []
        for k in range(PLANES_PER_TABLE):
            j = ti * PLANES_PER_TABLE + k
            # sign of an INTEGER dot over the x1000-quantized vector —
            # exact and engine-independent, so the bucket assignment is
            # oracle-checkable (no float sign boundary)
            dot = F.expr(
                f"""aggregate(zip_with(_vq,
                      sequence(0, size(_vq) - 1),
                      (v, d) -> v * (CASE WHEN substr(md5(concat('{j}', ':', d)), 1, 1) < '8' THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
                      CAST(0 AS BIGINT), (acc, v) -> acc + v)"""
            )
            sig_parts.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**k))
        bucket = sig_parts[0]
        for p in sig_parts[1:]:
            bucket = bucket + p
        tables.append(F.struct(F.lit(ti).alias("tbl"), bucket.alias("bucket")))
    out = e.select(
        "*", F.explode(F.array(*tables)).alias("tb")
    ).select("*", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")).drop("tb")
    if bucket_cap:
        from pyspark.sql import Window

        # deterministic survivor set (first `bucket_cap` rows by order_col)
        # + an explicit truncation flag; both windows share the
        # (tbl, bucket) partitioning so this is ONE extra exchange, on the
        # same keys the downstream bucket join shuffles on anyway
        wp = Window.partitionBy("tbl", "bucket")
        out = (
            out.withColumn("_bpos", F.row_number().over(wp.orderBy(order_col)))
            .withColumn("bucket_truncated", F.count("*").over(wp) > bucket_cap)
            .filter(F.col("_bpos") <= bucket_cap)
            .drop("_bpos")
        )
    return out


def ann_lsh_cosine(spark, sf):
    """ANN via multi-table hyperplane-LSH bucket join, exact rerank over
    the union of candidates from all tables.

    Fully deterministic across engines: bucket signs AND the rerank cosine
    both run on the x1000-quantized integer vectors, so the DuckDB twin
    (ANN_SQL) reproduces it bit-for-bit; recall vs brute force is asserted
    in tests/test_similarity_recall.py.
    """
    e = _lsh_tables(t(spark, sf)).select(
        "vec_id", "tbl", "bucket", F.col("_vq").alias("vq")
    ).withColumn("n2", F.expr(_IDOT.format(a="vq", b="vq")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("vq").alias("q_emb"),
        F.col("n2").alias("qn2"), "tbl", F.col("bucket").alias("qb")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("vq").alias("c_emb"),
        F.col("n2").alias("cn2"), "tbl", F.col("bucket").alias("cb")
    )
    pairs = (
        q.join(c, (q.tbl == c.tbl) & (F.col("qb") == F.col("cb")) & (F.col("q_id") != F.col("c_id")))
        .select("q_id", "q_emb", "qn2", "c_id", "c_emb", "cn2")
        .dropDuplicates(["q_id", "c_id"])
    )
    cos = F.expr(_IDOT.format(a="q_emb", b="c_emb")) / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
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


N_CENTROIDS = 16
N_PROBE = 4


def ann_ivf_cosine(spark, sf):
    """ANN via an IVF coarse quantizer: every vector is assigned to its
    nearest of N_CENTROIDS centroid vectors, queries probe their N_PROBE
    nearest lists, and candidates are exactly reranked inside the probed
    lists. Candidate set shrinks from N to ~N*nprobe/C — the scale path
    beside the LSH variant.

    Centroid assignment is fully MAP-SIDE: the centroid table (a
    driver-side model, like any trained quantizer) is inlined as a literal
    array and each row argmaxes over it with array_sort/transform — no
    crossJoin, no window shuffle; the only shuffle left is the candidate
    join on cent_id. Centroids here are the first N_CENTROIDS vectors (a
    deterministic coarse quantizer); production would train them with
    k-means, which changes only the literal, not the plan. Rows-only driver
    check; recall vs brute force asserted in tests/test_similarity_recall.py.
    """
    e = t(spark, sf).select(
        "vec_id", "label", F.expr(_QUANT).alias("vq")
    ).withColumn("n2", F.expr(_IDOT.format(a="vq", b="vq")))
    cent_rows = sorted(
        e.filter(F.col("vec_id") < N_CENTROIDS).select("vec_id", "vq", "n2").collect(),
        key=lambda r: r.vec_id,
    )
    cents_lit = "array(" + ",".join(
        f"named_struct('cid', {int(r.vec_id)}, "
        f"'cvq', array({','.join(str(int(v)) for v in r.vq)}), "
        f"'cn2', CAST({int(r.n2)} AS BIGINT))"
        for r in cent_rows
    ) + ")"
    # per-row centroid ranking: descending cosine, ties by cent_id asc —
    # encoded as ascending (negcos, cid) struct sort, all inside codegen
    sorted_expr = (
        f"array_sort(transform({cents_lit}, c -> named_struct("
        "'negcos', -(aggregate(zip_with(vq, c.cvq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        " / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE)))),"
        "'cid', c.cid)))"
    )
    assigned = e.withColumn(
        "cent_id", F.expr(f"element_at({sorted_expr}, 1).cid")
    ).select("vec_id", "label", "vq", "n2", "cent_id")
    probes = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("vq").alias("q_emb"),
            F.col("n2").alias("qn2"),
            F.explode(
                F.expr(f"transform(slice({sorted_expr}, 1, {N_PROBE}), s -> s.cid)")
            ).alias("cent_id"),
        )
    )
    from pyspark.sql import Window

    cand = probes.join(
        assigned.select(
            F.col("vec_id").alias("c_id"), F.col("vq").alias("c_emb"), F.col("n2").alias("cn2"), "cent_id"
        ),
        "cent_id",
    ).filter(F.col("q_id") != F.col("c_id"))
    cos = F.expr(_IDOT.format(a="q_emb", b="c_emb")) / (
        F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "c_id")
    return (
        cand.withColumn("cos_r", F.round(cos, 6))
        .dropDuplicates(["q_id", "c_id"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cos_r", "rk")
        .orderBy("q_id", "rk")
    )


DEDUP_COS_THRESH = 0.9
_PERT_QUANT = (
    "transform(zip_with(embedding, reverse(embedding), "
    "(x, y) -> CAST(x AS DOUBLE) * 0.98 + CAST(y AS DOUBLE) * 0.02), "
    "v -> CAST(round(v * 1000) AS BIGINT))"
)

# Sign-bit banding for the near-dup candidate stage: ND_TABLES hash tables
# of ND_BITS hyperplane-sign bits each. The +-1 plane components are a
# PYTHON-generated constant (hashlib.md5 of "nd{plane}:{dim}" — no RNG
# state) inlined as literal arrays into BOTH engines, so there is no
# per-row md5 in the hot path and the bucket assignment is trivially
# engine-identical. Sizing: a 0.98/0.02 perturbed twin sits at cos ~0.999
# (per-plane agreement p ~0.99); P(all 8 tables miss) = (1 - p^8)^8 < 1e-9,
# while unrelated vectors (cos <= ~0.51, p ~0.66) collide in a given table
# with p^8 ~ 0.04 — the bucket join prunes ~96% of the brute-force pairs
# per table before the exact rerank.
ND_TABLES = 8
ND_BITS = 8
EMB_BUCKET_CAP = 256


def _nd_signs() -> list:
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"nd{j}:{d}".encode()).hexdigest()[0], 16) < 8 else -1
            for d in range(64)
        ]
        for j in range(ND_TABLES * ND_BITS)
    ]


_ND_SIGNS = _nd_signs()


def dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-duplicate detection — the embedding analog of
    the text dedup family. The synthetic embeddings table has no natural
    near-dups (max off-diagonal cosine ~0.51), so every 10th vector gets a
    deterministic perturbed twin (98% itself + 2% its reversal, built
    identically in Spark and the oracle); vectors are quantized to integers
    so the cosine is bit-stable across engines (see knn_cosine_bruteforce).
    A row appears once per near-duplicate with its canonical (minimum-id)
    representative.

    Plan shape (the 100 TB path — replaces the former label-block all-pairs
    join, which was quadratic in the largest label block): sign-bit LSH
    banding (ND_TABLES x ND_BITS literal hyperplanes, integer dots) ->
    band explode (8 rows/vector) -> ONE groupBy(tbl, bucket) with in-bucket
    pair expansion via sorted collect_list + a codegen slice/transform (the
    dedup_minhash_lsh shape — the quantized-vector subtree is computed
    exactly once, no self-join) -> exact integer-cosine rerank on the
    candidate pairs only. Hot buckets above EMB_BUCKET_CAP are dropped
    (mirrored in the oracle) so the pair expansion stays bounded on skewed
    data. NO join operator anywhere in the plan (guarded by
    tests/test_plan_shapes.py). The label-equality predicate is kept as a
    pair FILTER (same output semantics), no longer as the blocking key."""
    e = t(spark, sf)
    base = e.select("vec_id", "label", F.expr(_QUANT).alias("vq"))
    twins = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "label",
        F.expr(_PERT_QUANT).alias("vq"),
    )
    full = base.unionByName(twins).withColumn(
        "n2", F.expr(_IDOT.format(a="vq", b="vq"))
    )
    sgn2d = "array(" + ",".join(
        "array(" + ",".join(str(s) for s in plane) + ")" for plane in _ND_SIGNS
    ) + ")"
    bits = F.expr(
        f"transform({sgn2d}, sgn -> CASE WHEN "
        "aggregate(zip_with(vq, sgn, (x, s) -> x * CAST(s AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END)"
    )
    band_structs = [
        F.struct(
            F.lit(ti).alias("tbl"),
            sum(
                F.expr(f"element_at(bits, {ti * ND_BITS + k + 1})") * (2**k)
                for k in range(ND_BITS)
            ).alias("bucket"),
        )
        for ti in range(ND_TABLES)
    ]
    banded = (
        full.withColumn("bits", bits)
        .select(
            F.struct("vec_id", "label", "vq", "n2").alias("v"),
            F.explode(F.array(*band_structs)).alias("tb"),
        )
        .select("v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    )
    buckets = (
        banded.groupBy("tbl", "bucket")
        .agg(F.sort_array(F.collect_list("v")).alias("vecs"))
        .filter((F.size("vecs") >= 2) & (F.size("vecs") <= EMB_BUCKET_CAP))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(vecs, (va, i) ->"
                " transform(filter(slice(vecs, i + 2, size(vecs)),"
                "                  vb -> vb.label = va.label), vb ->"
                " struct(va.vec_id AS a_id, vb.vec_id AS dup_id,"
                " vb.label AS label, va.vq AS a_vq, va.n2 AS a_n2,"
                " vb.vq AS b_vq, vb.n2 AS b_n2))))"
            )
        ).alias("p")
    ).select("p.*")
    cos = F.expr(_IDOT.format(a="a_vq", b="b_vq")) / (
        F.sqrt(F.col("a_n2").cast("double")) * F.sqrt(F.col("b_n2").cast("double"))
    )
    scored = (
        pairs.withColumn("cos_r", F.round(cos, 6))
        .filter(F.col("cos_r") >= DEDUP_COS_THRESH)
        # collisions in multiple tables yield duplicate pairs
        .dropDuplicates(["a_id", "dup_id"])
    )
    return (
        scored.groupBy("dup_id", "label")
        .agg(
            F.min("a_id").alias("rep_id"),
            F.round(F.max("cos_r"), 6).alias("max_cos"),
            F.count("*").alias("n_nbrs"),
        )
        .repartition(1)
        .sortWithinPartitions("dup_id")
    )


def _dedup_emb_sql() -> str:
    """DuckDB twin of dedup_embedding_cosine — same literal sign matrix,
    same integer plane dots, same band buckets, same EMB_BUCKET_CAP guard,
    same exact-integer rerank; bit-identical by construction."""
    bit = (
        "CASE WHEN list_sum(list_transform(generate_series(1, len(vq)), "
        "i -> vq[i] * ({sgn})[i])) >= 0 THEN 1 ELSE 0 END"
    )
    bucket_cols = ", ".join(
        " + ".join(
            f"({bit.format(sgn='[' + ','.join(str(s) for s in _ND_SIGNS[ti * ND_BITS + k]) + ']')}) * {2 ** k}"
            for k in range(ND_BITS)
        )
        + f" AS b{ti}"
        for ti in range(ND_TABLES)
    )
    tb_arms = " UNION ALL ".join(
        f"SELECT vec_id, label, vq, n2, {ti} AS tbl, b{ti} AS bucket FROM sigs"
        for ti in range(ND_TABLES)
    )
    return f"""
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, label,
         list_transform(generate_series(1, len(embedding)),
                        i -> CAST(round((CAST(embedding[i] AS DOUBLE) * 0.98
                                         + CAST(embedding[len(embedding) + 1 - i] AS DOUBLE) * 0.02)
                                        * 1000) AS BIGINT)) AS vq
  FROM embeddings WHERE vec_id % 10 = 0),
en AS (
  SELECT vec_id, label, vq,
         list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * vq[i])) AS n2
  FROM base),
sigs AS (SELECT vec_id, label, vq, n2, {bucket_cols} FROM en),
tb AS ({tb_arms}),
ok_buckets AS (
  SELECT tbl, bucket FROM tb GROUP BY tbl, bucket
  HAVING COUNT(*) BETWEEN 2 AND {EMB_BUCKET_CAP}),
kept AS (SELECT tb.* FROM tb JOIN ok_buckets USING (tbl, bucket)),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS dup_id, b.label,
                  a.vq AS a_vq, a.n2 AS a_n2, b.vq AS b_vq, b.n2 AS b_n2
  FROM kept a JOIN kept b
    ON a.tbl = b.tbl AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id AND a.label = b.label),
scored AS (
  SELECT a_id, dup_id, label,
         ROUND(list_sum(list_transform(generate_series(1, len(a_vq)), i -> a_vq[i] * b_vq[i]))
               / (sqrt(CAST(a_n2 AS DOUBLE)) * sqrt(CAST(b_n2 AS DOUBLE))), 6) AS cos_r
  FROM cand)
SELECT dup_id, label, MIN(a_id) AS rep_id, ROUND(MAX(cos_r), 6) AS max_cos,
       COUNT(*) AS n_nbrs
FROM scored WHERE cos_r >= {DEDUP_COS_THRESH}
GROUP BY dup_id, label ORDER BY dup_id
"""


DEDUP_EMB_SQL = _dedup_emb_sql()


def _ann_oracle_sql() -> str:
    """DuckDB twin of ann_cosine. Everything rides on the x1000-quantized
    integer vectors: LSH bucket bits are signs of integer plane dots (md5
    per-component signs, identical string recipe in both engines), IVF
    assignment is an integer-cosine argmax with (negcos, cid) tie-break,
    and both reranks use the same exact-integer dot / sqrt(double) cosine
    rounded to 6 places — bit-identical to the Spark plan."""

    def plane_dot(j: int) -> str:
        return ("list_sum(list_transform(generate_series(0, len(vq) - 1), "
                f"d -> vq[d + 1] * CASE WHEN substr(md5(concat(CAST({j} AS VARCHAR), ':', CAST(d AS VARCHAR))), 1, 1) < '8' "
                "THEN 1 ELSE -1 END))")

    bucket_cols = ", ".join(
        " + ".join(f"(CASE WHEN {plane_dot(ti * PLANES_PER_TABLE + k)} >= 0 THEN {2 ** k} ELSE 0 END)"
                   for k in range(PLANES_PER_TABLE)) + f" AS b{ti}"
        for ti in range(N_TABLES))
    tb_arms = " UNION ALL ".join(
        f"SELECT vec_id, {ti} AS tbl, b{ti} AS bucket FROM sigs"
        for ti in range(N_TABLES))
    idot = ("list_sum(list_transform(generate_series(1, len({a}.vq)), "
            "i -> {a}.vq[i] * {b}.vq[i]))")
    cos = (f"CAST({idot} AS DOUBLE) / "
           "(sqrt(CAST({a}.n2 AS DOUBLE)) * sqrt(CAST({b}.n2 AS DOUBLE)))")
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vq
  FROM embeddings),
en AS (
  SELECT vec_id, vq,
         list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * vq[i])) AS n2
  FROM e),
sigs AS (SELECT vec_id, {bucket_cols} FROM e),
tb AS ({tb_arms}),
lsh_cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
  FROM tb q JOIN tb c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
lsh_scored AS (
  SELECT q_id, c_id, ROUND({cos.format(a='eq', b='ec')}, 6) AS cos_r
  FROM lsh_cand JOIN en eq ON eq.vec_id = q_id JOIN en ec ON ec.vec_id = c_id),
lsh_top AS (
  SELECT q_id, c_id, cos_r,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rk
  FROM lsh_scored),
cents AS (SELECT vec_id AS cid, vq, n2 FROM en WHERE vec_id < {N_CENTROIDS}),
cent_cos AS (
  SELECT ev.vec_id, c.cid, -({cos.format(a='ev', b='c')}) AS negcos
  FROM en ev CROSS JOIN cents c),
cent_rank AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY negcos, cid) AS crk
  FROM cent_cos),
assigned AS (SELECT vec_id, cid AS cent_id FROM cent_rank WHERE crk = 1),
probes AS (
  SELECT vec_id AS q_id, cid AS cent_id FROM cent_rank
  WHERE vec_id < {N_QUERIES} AND crk <= {N_PROBE}),
ivf_scored AS (
  SELECT p.q_id, a.vec_id AS c_id, ROUND({cos.format(a='eq', b='ec')}, 6) AS cos_r
  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id AND a.vec_id <> p.q_id
  JOIN en eq ON eq.vec_id = p.q_id JOIN en ec ON ec.vec_id = a.vec_id),
ivf_top AS (
  SELECT q_id, c_id, cos_r,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rk
  FROM ivf_scored)
SELECT 'lsh' AS method, q_id, c_id, cos_r, rk FROM lsh_top WHERE rk <= {TOP_K}
UNION ALL
SELECT 'ivf' AS method, q_id, c_id, cos_r, rk FROM ivf_top WHERE rk <= {TOP_K}
ORDER BY method, q_id, rk
"""


ANN_SQL = _ann_oracle_sql()


def ann_cosine(spark, sf):
    """Both ANN scale paths in one tagged result (driver-window
    consolidation): method='lsh' rows from the multi-table hyperplane-LSH
    bucket join, method='ivf' rows from the IVF coarse quantizer. Oracle
    SQL: ANN_SQL — exact, since buckets, assignment, and rerank all run on
    integer-quantized vectors (no float sign boundary). Recall vs brute
    force for BOTH methods is additionally asserted in
    tests/test_similarity_recall.py."""
    lsh = ann_lsh_cosine(spark, sf).select(F.lit("lsh").alias("method"), "*")
    ivf = ann_ivf_cosine(spark, sf).select(F.lit("ivf").alias("method"), "*")
    return lsh.unionByName(ivf).orderBy("method", "q_id", "rk")


QUERIES = {
    "knn_cosine_bruteforce": (knn_cosine_bruteforce, KNN_SQL),
    "embedding_norm_stats": (embedding_norm_stats, NORM_STATS_SQL),
    "ann_cosine": (ann_cosine, ANN_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMB_SQL),
}
