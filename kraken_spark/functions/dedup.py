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

md5 is chosen ONLY for oracle parity (the one hash both engines share);
a production deployment swaps the base shingle hash to xxhash64 (Spark
built-in, ~10x cheaper) without touching the plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ..session import lineage_cut

N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS
# LSH hot-bucket guard: a band bucket with more members than this is dropped
# (quadratic pair expansion bound; mirrored in the DuckDB oracle).
BUCKET_CAP = 256


def t(spark: SparkSession, sf_dir: str, name: str = "documents"):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# per-document shingle budget: a pathological multi-MB document must not
# explode into millions of shuffle rows (the row-blowup guard for the
# 100 TB corpus); similarity estimates over the first 100k chars are
# statistically identical for dedup purposes
MAX_SHINGLE_CHARS = 100_000


def _shingles(spark, sf, distinct: bool = True, stride: int = 1):
    """(doc_id, shingle) char-7-gram pairs; distinct unless the consumer is
    duplicate-insensitive (min-hash is: min() over duplicates is identical,
    so the minhash path skips a full 5M-row distinct shuffle).

    stride>1 samples every stride-th start position — the standard MinHash
    shingle-sampling approximation: Jaccard estimates over a uniform
    position sample converge to the full-set estimate, at 1/stride the
    hash volume (the md5 over every shingle occurrence was the headline
    cost center). Mirrored exactly in the DuckDB oracle CTEs."""
    d = t(spark, sf)
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(least(length(text), {MAX_SHINGLE_CHARS}) - 6, 1),"
                f" {stride}), i -> substr(text, i, 7))"
            )
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


_SHINGLES_STRIDE3_CTE = """
shingles AS (
  SELECT doc_id, s AS shingle
  FROM documents,
       LATERAL unnest(list_transform(generate_series(1, greatest(least(length(text), 100000) - 6, 1), 3),
                                     i -> substr(text, i, 7))) AS u(s))
"""

_SHINGLES_CTE = """
shingles AS (
  SELECT DISTINCT doc_id, s AS shingle
  FROM documents,
       LATERAL unnest(list_transform(generate_series(1, greatest(least(length(text), 100000) - 6, 1)),
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


def connected_components(edges, max_iter: int = 32):
    """Distributed connected components over an undirected candidate-pair
    graph — the cluster-formation pass every published dedup pipeline runs
    after candidate generation (MinHash-LSH pairs -> duplicate clusters ->
    keep one doc per cluster; RefinedWeb §3.2, FineWeb, Lee et al. 2021).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — converges
    in O(log^2 n) rounds, each round two groupBy shuffles over the EDGE set
    (never the corpus), no driver-side graph state, no collect. This is the
    shape that survives 10^12 nodes; naive label propagation needs
    O(diameter) rounds and dies on chain-shaped duplicate graphs.

    `edges`: DataFrame with orderable columns (hi, lo), hi > lo per row
    (callers canonicalize). Returns (node, cluster_id) with cluster_id =
    the component's minimum node id — one row per non-singleton node.

    Convergence is detected EXACTLY (symmetric-difference emptiness via
    exceptAll on the star edge set), not by count/hash signatures; the edge
    set is the tiny pair table, so the extra aggregate per round is noise.
    lineage_cut truncates lineage each round so plan depth stays O(1) in
    iterations — a RELIABLE df.checkpoint when the session has a
    checkpoint dir (get_spark(checkpoint_dir=...) / env
    SPARK_GRAFT_CHECKPOINT_DIR; survives executor loss on a cluster),
    localCheckpoint otherwise.
    """
    edges = (
        edges.select(F.col("hi"), F.col("lo")).distinct().transform(lineage_cut)
    )
    converged = False
    for _ in range(max_iter):
        # large-star: every node u links its strictly-larger neighbours to
        # min(N(u) + {u}). Symmetrize, one min-aggregate, one join back.
        sym = edges.union(edges.select(F.col("lo").alias("hi"), F.col("hi").alias("lo")))
        sym = sym.toDF("u", "v")
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.least("u", "mn").alias("lo"))
            .distinct()
        )
        # small-star: every node u links its smaller neighbours (and itself)
        # to the minimum of that set. On (hi, lo) rows the smaller
        # neighbourhood of hi is exactly its lo column.
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("mn"))
        joined = large.join(mins2, "hi")
        small = (
            joined.select(F.col("hi"), F.col("mn").alias("lo"))
            .union(
                joined.where(F.col("lo") != F.col("mn")).select(
                    F.col("lo").alias("hi"), F.col("mn").alias("lo")
                )
            )
            .distinct()
            .transform(lineage_cut)
        )
        # equal-size + one-direction-empty == set equality (both sides are
        # distinct), so convergence costs ONE set-difference, not two
        if small.count() == edges.count() and small.exceptAll(edges).isEmpty():
            edges = small
            converged = True
            break
        edges = small
    if not converged:
        # never return not-fully-propagated labels silently — a partial
        # star forest means some cluster_id is not the component minimum
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(Kiveris bound is O(log^2 n); raise max_iter)"
        )
    # converged: a star forest with centers = component minima.
    return edges.select(F.col("hi").alias("node"), F.col("lo").alias("cluster_id")).union(
        edges.select(F.col("lo").alias("node"), F.col("lo").alias("cluster_id")).distinct()
    )


def duplicate_clusters(pairs, a_col: str = "doc_a", b_col: str = "doc_b"):
    """(node, cluster_id, cluster_size) from a canonical candidate-pair
    DataFrame (a_col < b_col per row). cluster_id is the component minimum
    — the conventional "keep the smallest id" dedup representative."""
    comp = connected_components(
        pairs.select(F.col(b_col).alias("hi"), F.col(a_col).alias("lo"))
    )
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select("node", "cluster_id", "cluster_size")


def minhash_dedup_corpus(spark, sf, min_agreement: float = 0.5):
    """The full published dedup pipeline end-to-end: MinHash-LSH candidate
    pairs -> signature-agreement threshold -> connected components -> keep
    ONE document per duplicate cluster (the component-minimum doc_id).

    Returns the deduplicated documents DataFrame (all original columns).
    Every stage is the scale shape already audited for its parts: the LSH
    pair generation never leaves the band-bucket plan, the CC rounds
    shuffle only the pair edges, and the final keeper removal is one hash
    anti-join against the (tiny) loser set — the 10^12-row corpus is
    touched by exactly two passes (signatures, anti-join)."""
    pairs = (
        dedup_minhash_lsh(spark, sf)
        .where(F.col("sig_agreement") >= min_agreement)
        .transform(lineage_cut)
    )
    losers = duplicate_clusters(pairs).where(F.col("node") != F.col("cluster_id"))
    return t(spark, sf).join(
        losers.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    )


# document-frequency cap for the Jaccard self-join: a shingle present in K
# documents generates K^2/2 candidate pairs, so one ubiquitous 7-gram (a
# boilerplate phrase in 10^9 docs at 100 TB) would single-handedly create a
# quadratic blowup. Shingles with df > DF_CAP are dropped from the shingle
# universe BEFORE the join (standard stop-shingle removal — both the
# intersection AND the per-doc sizes use the capped universe, so the
# Jaccard stays a true Jaccard over non-ubiquitous shingles). The cap is
# exercised at test scale too: sf0.01 has 54 shingles with df > 128.
DF_CAP = 128


def dedup_ngram_jaccard(spark, sf):
    """Pairwise n-gram Jaccard >= 0.5 over the df-capped shingle universe
    (same-shingle join, ordered pairs), plus the cluster-formation pass:
    each pair row carries the connected-component id (component-minimum
    doc) and component size of the >= 0.5 duplicate graph — the "keep one
    per cluster" signal of the published dedup pipelines. Components via
    alternating large-star/small-star (see connected_components); the
    DuckDB twin derives the same labels with a recursive min-reachability
    CTE — algorithm-independent agreement on min-per-component."""
    sh = _shingles(spark, sf)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= DF_CAP
    )
    capped = sh.join(df, "shingle")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = capped.filter(F.col("df") >= 2).select("doc_id", "shingle")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    pairs = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        # the pair table feeds connected_components (an iterative consumer)
        # AND the final join — materialize it once instead of recomputing
        # the shingle self-join per CC round.
        .transform(lineage_cut)
    )
    clusters = duplicate_clusters(pairs)
    return (
        pairs.join(clusters.withColumnRenamed("node", "doc_a"), "doc_a")
        .select("doc_a", "doc_b", "jaccard", "cluster_id", "cluster_size")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_JACCARD_SQL = f"""
WITH RECURSIVE {_SHINGLES_CTE},
freq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY 1),
capped AS (
  SELECT s.doc_id, s.shingle, freq.df
  FROM shingles s JOIN freq ON s.shingle = freq.shingle
  WHERE freq.df <= {DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.df >= 2 AND b.df >= 2
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
         ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
-- duplicate clusters: min-reachability closure over the pair graph; the
-- Spark side computes the same component minima with large-star/small-star
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach (n, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) AS nodes(u)
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.n),
comp AS (SELECT n, MIN(r) AS cluster_id FROM reach GROUP BY n),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
SELECT p.doc_a, p.doc_b, p.jaccard, c.cluster_id, s.cluster_size
FROM pairs p
JOIN comp c ON c.n = p.doc_a
JOIN csize s ON s.cluster_id = c.cluster_id
ORDER BY doc_a, doc_b
"""


# Affine permutation family h_i(x) = (a_i*x + b_i) mod P over the base
# 32-bit shingle hash. P is the smallest prime > 2^32; a_i < 2^20, so
# a_i*x + b_i < 2^52 — exact in BIGINT in both engines (no overflow, no
# wraparound divergence). Each shingle is md5-hashed ONCE; the 16
# permutations are plain column arithmetic (vs 16x md5 + a 16x row
# explode, which made minhash the most expensive headline query).
_P = 4294967311
_PERM_AB = [((40503 * (i + 1)) | 1, 75321 * i + 12345) for i in range(N_PERM)]


def dedup_minhash_lsh(spark, sf):
    """MinHash (16 perms) + LSH banding (4 bands x 4): candidate pairs from
    band-bucket collisions, verified with exact signature agreement ratio.

    Plan shape (the 100 TB path): shingle explode -> ONE groupBy(doc) with
    16 min() aggregates (map-side partial agg; no per-perm row blowup) ->
    band explode (4 rows/doc) -> bucket self-join -> pairwise agreement on
    the wide signature rows."""
    # stride-3 position sampling cuts the md5 volume 3x (see _shingles);
    # Catalyst's RemoveRedundantAggregates elides a distinct under min(),
    # so no separate dedup pass — the oracle's min() dedups identically.
    sh = _shingles(spark, sf, distinct=False, stride=3)
    h0 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    sig = sh.select("doc_id", h0.alias("h0")).groupBy("doc_id").agg(
        *[
            F.min((F.col("h0") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(_PERM_AB)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(k).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{k * ROWS_PER_BAND + j}") for j in range(ROWS_PER_BAND)],
                )
            ).alias("band_key"),
        )
        for k in range(N_BANDS)
    ]
    # Carry the full signature (16 BIGINTs ~ 128 B/row) through the band
    # explode, then expand candidate pairs INSIDE each LSH bucket via
    # collect_list + a codegen slice/transform — so `sig` (and the whole
    # shingle pipeline under it) is computed exactly ONCE. The former
    # self-join shape duplicated the sig subtree per join side (no exchange
    # reuse once one side broadcasts) and joined back twice for the rerank:
    # 3x the dominant cost. Hot-bucket guard: buckets over BUCKET_CAP docs
    # are dropped (mirrored in the DuckDB oracle via HAVING) — a bucket
    # that large means near-identical boilerplate better handled by exact
    # dedup, and the cap bounds the quadratic pair expansion at 100 TB.
    bands = sig.select(
        F.col("doc_id"),
        F.array(*[F.col(f"m{i}") for i in range(N_PERM)]).alias("sig"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= BUCKET_CAP))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (da, i) ->"
                " transform(slice(docs, i + 2, size(docs)), db ->"
                " struct(da.doc_id AS doc_a, db.doc_id AS doc_b,"
                " da.sig AS sig_a, db.sig AS sig_b))))"
            )
        ).alias("p")
    ).select("p.*")
    agreement = F.size(
        F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y), lambda t: t)
    ) / F.lit(float(N_PERM))
    return (
        # collisions in multiple bands yield duplicate pairs; signatures are
        # functionally dependent on the pair, so first() dedups exactly.
        # repartition(1)+sortWithinPartitions, not orderBy: a global sort's
        # range-partitioner SAMPLING pass re-executes the whole pipeline
        # (the result is ~1k rows; one partition is the right plan).
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.round(F.first(agreement), 6).alias("sig_agreement"))
        .repartition(1)
        .sortWithinPartitions("doc_a", "doc_b")
    )


_SIG_COLS_SQL = ",\n         ".join(
    f"MIN((h0 * {a} + {b}) % {_P}) AS m{i}" for i, (a, b) in enumerate(_PERM_AB)
)
_BAND_ROWS_SQL = " UNION ALL ".join(
    "SELECT doc_id, {k} AS band, md5({key}) AS band_key FROM sig".format(
        k=k,
        key
        =" || ',' || ".join(f"m{k * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND)),
    )
    for k in range(N_BANDS)
)
_AGREE_SQL = " + ".join(
    f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
)

DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_STRIDE3_CTE},
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
  FROM shingles),
sig AS (
  SELECT doc_id,
         {_SIG_COLS_SQL}
  FROM hashed GROUP BY doc_id),
bands AS ({_BAND_ROWS_SQL}),
ok_buckets AS (
  SELECT band, band_key FROM bands
  GROUP BY band, band_key
  HAVING COUNT(*) BETWEEN 2 AND {BUCKET_CAP}),
kept AS (
  SELECT bands.* FROM bands JOIN ok_buckets USING (band, band_key)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       ROUND(({_AGREE_SQL}) / {float(N_PERM)}, 6) AS sig_agreement
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
ORDER BY doc_a, doc_b
"""


def dedup_simhash(spark, sf):
    """32-bit SimHash over word hashes: per-bit majority vote, cluster by
    fingerprint value.

    Plan shape: ONE groupBy(doc_id) with 32 conditional-sum vote columns —
    no per-bit row explode (which would multiply the shuffle volume 32x),
    so the shuffle carries exactly one row per (doc, word) and the map-side
    partial aggregation collapses it to one row per doc."""
    d = t(spark, sf)
    words = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    wh = words.withColumn(
        "h", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
    )
    votes = wh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"((h >> {i}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(32)
        ]
    )
    simhash_col = None
    for i in range(32):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash_col = term if simhash_col is None else simhash_col + term
    sim = votes.select("doc_id", simhash_col.alias("simhash"))
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


# --------------------------------------------------------------------------
# Paragraph-level dedup (C4/RefinedWeb-style repeated-line removal)
# --------------------------------------------------------------------------

# a paragraph shorter than this (after trim) is never treated as corpus
# boilerplate — empty lines and one-word fragments repeat naturally and
# stripping them would mangle formatting
MIN_PARA_LEN = 10


def _para_hash(col):
    """Cross-engine paragraph hash (module convention: md5 prefix for
    DuckDB parity; production swaps to xxhash64 without plan changes)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _paragraphs(docs):
    """documents(url, text) -> (url, pos, para, cand, ph): one row per
    newline-split paragraph with its position, boilerplate-candidacy flag
    and cross-engine hash. The explode is bounded by document size (the
    same row-blowup profile as the shingle explode above)."""
    return docs.select(
        "url", F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "para")
    ).select(
        "url",
        "pos",
        "para",
        (F.length(F.trim(F.col("para"))) >= MIN_PARA_LEN).alias("cand"),
        _para_hash(F.col("para")).alias("ph"),
    )


def repeated_paragraph_report(docs, min_repeats: int = 2):
    """Corpus boilerplate report: paragraphs (len >= MIN_PARA_LEN) that
    appear in >= min_repeats DISTINCT documents, with their document
    frequency — the audit view of what strip_repeated_paragraphs removes.
    One groupBy shuffle keyed on the paragraph hash; the paragraph string
    rides along via first() so the wide text is not the shuffle key."""
    return (
        _paragraphs(docs)
        .where("cand")
        .groupBy("ph")
        .agg(
            F.first("para").alias("para"),
            F.countDistinct("url").alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_repeats)
        .select("para", "n_docs")
    )


def strip_repeated_paragraphs(docs, min_repeats: int = 2):
    """The C4/RefinedWeb line-dedup rule, Spark-native: drop every
    paragraph that occurs in >= min_repeats distinct documents (cookie
    banners, nav crumbs, licence footers that survive per-page boilerplate
    stripping only corpus statistics can catch), preserving the order and
    formatting of everything kept. Returns (url, text) for EVERY input
    document (fully-boilerplate docs come back with '').

    Scale shape: paragraph explode -> hash-keyed countDistinct (shuffle 1)
    -> hash join back (shuffle 2, both sides pre-hashed BIGINT keys) ->
    per-url rebuild (shuffle 3, bounded by document size). No Python; the
    whole plan is codegen + exchanges. At 10^12 docs the boilerplate set
    is small relative to the corpus but NOT broadcastable in general
    (millions of distinct repeated paragraphs), hence the shuffle join."""
    paras = _paragraphs(docs)
    boiler = (
        paras.where("cand")
        .groupBy("ph")
        .agg(F.countDistinct("url").alias("n_docs"))
        .where(F.col("n_docs") >= min_repeats)
        .select("ph", F.lit(True).alias("boiler"))
    )
    kept = (
        paras.join(boiler, "ph", "left")
        .where(F.col("boiler").isNull() | ~F.col("cand"))
        .groupBy("url")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda x: x["para"],
                ),
            ).alias("text")
        )
    )
    return docs.select("url").join(kept, "url", "left").select(
        "url", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )


STRIP_PARAGRAPHS_SQL_TEMPLATE = """
WITH sp AS (SELECT url, string_split(text, chr(10)) AS l FROM documents),
paras AS (
  SELECT url, i AS pos, l[i] AS para
  FROM sp, LATERAL unnest(generate_series(1, len(l))) AS g(i)),
cand AS (
  SELECT url, pos, para,
         length(trim(para)) >= {min_len} AS cand,
         CAST(('0x' || substr(md5(para), 1, 8)) AS BIGINT) AS ph
  FROM paras),
boiler AS (
  SELECT ph FROM cand WHERE cand
  GROUP BY ph HAVING COUNT(DISTINCT url) >= {min_repeats}),
kept AS (
  SELECT c.url, c.pos, c.para FROM cand c
  LEFT JOIN boiler b ON c.cand AND c.ph = b.ph
  WHERE b.ph IS NULL),
rebuilt AS (
  SELECT url, string_agg(para, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY url)
SELECT d.url, COALESCE(r.text, '') AS text
FROM (SELECT DISTINCT url FROM documents) d
LEFT JOIN rebuilt r ON d.url = r.url
"""


# --------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better" — the 50-token duplicated-span rule)
# --------------------------------------------------------------------------

# the published span length: a run of >= 50 tokens shared verbatim between
# two documents is corpus duplication, not coincidence
EXACT_SUBSTR_K = 50


def _gram_hash(col):
    """60-bit cross-engine gram hash (15 md5 hex digits): collision
    birthday bound comfortably above the 10^12-gram corpus the 32-bit
    paragraph hash would saturate. Production swap: xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_substring_dedup(docs, k: int = EXACT_SUBSTR_K):
    """Lee et al.'s exact-substring rule, Spark-native: any k-token window
    that appears verbatim in >= 2 distinct documents is a duplicated span;
    every word covered by such a window is removed from every document
    EXCEPT the first (min url) that contains the window. Documents with no
    covered words pass through byte-identical; rewritten documents are
    re-joined with single spaces (the token-stream view of the paper —
    dedup operates on the token sequence, not the raw bytes).

    The reference algorithm is a corpus-wide suffix array; the
    Spark-native equivalent is positioned k-gram hashing — the same
    duplicated-span decision for spans of exactly the published length k
    (a suffix array also finds longer-than-k maximal spans, which hashed
    grams cover because a span of length m >= k contains m-k+1 duplicated
    k-grams marking the same words).

    Scale shape: gram hashing is map-side (one transform over the word
    array, no self-join); shuffle 1 = groupBy(gh) for the duplicate set
    (map-side partial aggs); shuffle 2 = hash join of gram occurrences
    against the duplicate set (both sides BIGINT-keyed; the duplicate set
    is unbounded at 10^12 docs, hence no broadcast); shuffle 3 = the
    per-url rebuild, restricted to TOUCHED documents only. Gram
    construction is O(n_words * k) characters per doc — the documented
    cost of the algorithm family; stride sampling (as in the minhash pass)
    is the production knob when k-gram recall can be traded for time."""
    words = F.split(F.trim("text"), r"\s+")
    base = docs.select(
        "url", F.col("text").alias("orig"), words.alias("w"), F.size(words).alias("n")
    )
    starts = F.when(
        F.col("n") >= k, F.sequence(F.lit(1), F.col("n") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    gh_arr = F.transform(
        starts, lambda p: _gram_hash(F.concat_ws(" ", F.slice("w", p, k)))
    )
    grams = base.select("url", F.posexplode(gh_arr).alias("gp", "gh")).select(
        "url", (F.col("gp") + 1).alias("p"), "gh"
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("url").alias("nd"), F.min("url").alias("keeper"))
        .where(F.col("nd") >= 2)
        .select("gh", "keeper")
    )
    covered = (
        grams.join(dup, "gh")
        .where(F.col("url") != F.col("keeper"))
        .select("url", F.explode(F.sequence("p", F.col("p") + k - 1)).alias("i"))
        .distinct()
    )
    word_rows = base.join(covered.select("url").distinct(), "url").select(
        "url", F.posexplode("w").alias("wi", "word")
    ).select("url", (F.col("wi") + 1).alias("i"), "word")
    rebuilt = (
        word_rows.join(covered, ["url", "i"], "left_anti")
        .groupBy("url")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "word"))),
                    lambda x: x["word"],
                ),
            ).alias("dedup_text")
        )
    )
    # touched docs get the rebuilt token stream ('' when fully covered);
    # untouched docs pass through byte-identical
    touched = covered.select("url").distinct().withColumn("_touched", F.lit(True))
    return (
        base.select("url", "orig")
        .join(touched, "url", "left")
        .join(rebuilt, "url", "left")
        .select(
            "url",
            F.when(F.col("_touched").isNotNull(), F.coalesce("dedup_text", F.lit("")))
            .otherwise(F.col("orig"))
            .alias("text"),
        )
    )


EXACT_SUBSTRING_SQL_TEMPLATE = """
WITH base AS (
  SELECT url, text AS orig, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents),
grams AS (
  SELECT url, p,
    CAST(('0x' || substr(md5(array_to_string(w[p:p+{k}-1], ' ')), 1, 15)) AS BIGINT) AS gh
  FROM base, LATERAL unnest(generate_series(1, len(w) - {k} + 1)) AS g(p)),
dup AS (
  SELECT gh, min(url) AS keeper FROM grams
  GROUP BY gh HAVING COUNT(DISTINCT url) >= 2),
covered AS (
  SELECT DISTINCT g.url, c.i
  FROM grams g JOIN dup d USING (gh), LATERAL unnest(generate_series(g.p, g.p + {k} - 1)) AS c(i)
  WHERE g.url <> d.keeper),
words AS (
  SELECT b.url, ww.i, b.w[ww.i] AS word
  FROM base b, LATERAL unnest(generate_series(1, len(b.w))) AS ww(i)
  WHERE b.url IN (SELECT url FROM covered)),
kept AS (
  SELECT wo.url, wo.i, wo.word FROM words wo
  LEFT JOIN covered c ON wo.url = c.url AND wo.i = c.i
  WHERE c.url IS NULL),
rebuilt AS (
  SELECT url, string_agg(word, ' ' ORDER BY i) AS text FROM kept GROUP BY url)
SELECT b.url,
  CASE WHEN b.url IN (SELECT url FROM covered)
       THEN COALESCE(r.text, '') ELSE b.orig END AS text
FROM base b LEFT JOIN rebuilt r USING (url)
"""


def duplicated_span_report(docs, k: int = EXACT_SUBSTR_K):
    """Audit view of exact_substring_dedup: each duplicated k-gram with
    its document frequency and keeper — one groupBy, the diagnostic a
    corpus run records alongside the rewrite."""
    words = F.split(F.trim("text"), r"\s+")
    base = docs.select("url", words.alias("w"), F.size(words).alias("n"))
    starts = F.when(
        F.col("n") >= k, F.sequence(F.lit(1), F.col("n") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    gram_str = F.transform(starts, lambda p: F.concat_ws(" ", F.slice("w", p, k)))
    grams = base.select("url", F.explode(gram_str).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.countDistinct("url").alias("n_docs"), F.min("url").alias("keeper"))
        .where(F.col("n_docs") >= 2)
    )


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
}


# --------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / The Pile / FineWeb: drop
# training documents sharing a verbatim normalized 13-gram with an eval set)
# --------------------------------------------------------------------------

DECONTAM_K = 13  # the published overlap length (Brown et al. 2020, App. C)


def _norm_words(col):
    """Decontamination normalization (the published recipe): lowercase,
    every non-alphanumeric run collapses to a single space — so case,
    punctuation, and whitespace differences can't hide an overlap."""
    return F.split(F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")), " ")


def _norm_gram_strings(df, id_col: str, k: int):
    """(id, items array<string>): each document's normalized k-gram
    STRINGS — the ONE construction both the exact (hashed) and bloom
    decontamination paths derive from, so their gram universes agree by
    construction (the bloom superset guarantee depends on it)."""
    words = _norm_words(F.col("text"))
    base = df.select(F.col(id_col), words.alias("w"), F.size(words).alias("n"))
    starts = F.when(
        F.col("n") >= k, F.sequence(F.lit(1), F.col("n") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(starts, lambda p: F.concat_ws(" ", F.slice("w", p, k)))
    return base.select(id_col, grams.alias("items"))


def _norm_gram_hashes(df, id_col: str, k: int):
    g = _norm_gram_strings(df, id_col, k)
    return g.select(
        id_col, F.explode(F.transform("items", lambda s: _gram_hash(s))).alias("gh")
    )


def decontaminate(docs, benchmark, k: int = DECONTAM_K, id_col: str = "doc_id"):
    """(id, n_contaminated_grams, contaminated) per training document: a
    document is contaminated when any normalized k-gram appears verbatim
    in the benchmark table (columns: bench_id, text).

    Scale shape: both gram constructions are map-side transforms; the
    benchmark gram set is TINY relative to the corpus (eval sets are
    10^5-10^6 grams), so the membership test is a BROADCAST hash join
    against the exploded corpus grams — the 10^12-row side never
    shuffles; the only exchange is the per-doc hit count groupBy over the
    (rare) matching grams."""
    bench = _norm_gram_hashes(benchmark, "bench_id", k).select("gh").distinct()
    hits = (
        _norm_gram_hashes(docs, id_col, k)
        .join(F.broadcast(bench), "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


DECONTAM_SQL_TEMPLATE = """
WITH nd AS (
  SELECT {id_col},
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS w
  FROM documents),
dg AS (
  SELECT {id_col},
         CAST(('0x' || substr(md5(array_to_string(w[i:i+{k}-1], ' ')), 1, 15)) AS BIGINT) AS gh
  FROM nd, LATERAL unnest(generate_series(1, greatest(len(w) - {k} + 1, 0))) AS u(i)),
nb AS (
  SELECT string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS w
  FROM benchmark),
bg AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(array_to_string(w[i:i+{k}-1], ' ')), 1, 15)) AS BIGINT) AS gh
  FROM nb, LATERAL unnest(generate_series(1, greatest(len(w) - {k} + 1, 0))) AS u(i)),
hits AS (
  SELECT {id_col}, COUNT(*) AS n FROM dg JOIN bg USING (gh) GROUP BY {id_col})
SELECT d.{id_col},
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_grams,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING ({id_col})
"""


# --------------------------------------------------------------------------
# Incremental dedup: a NEW crawl against an already-kept corpus (the
# per-dump production pattern — FineWeb dedups each CommonCrawl dump
# against itself; RefinedWeb-style pipelines dedup new data against the
# retained corpus WITHOUT re-clustering it)
# --------------------------------------------------------------------------


def minhash_signatures(docs, id_col: str = "doc_id", text_col: str = "text", stride: int = 3):
    """(id, m0..m15, band, band_key) — the stored dedup state per document:
    16 minhash values + the 4 LSH band keys, exactly the signature recipe
    of dedup_minhash_lsh. Persist this (one ~160-byte row set per doc)
    alongside the kept corpus; incremental dedup then never re-reads kept
    TEXT, only this table."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(least(length({text_col}), {MAX_SHINGLE_CHARS}) - 6, 1),"
                f" {stride}), i -> substr({text_col}, i, 7))"
            )
        ).alias("shingle"),
    )
    h0 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    sig = sh.select("doc_id", h0.alias("h0")).groupBy("doc_id").agg(
        *[
            F.min((F.col("h0") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(_PERM_AB)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(k).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m{k * ROWS_PER_BAND + j}") for j in range(ROWS_PER_BAND)],
                )
            ).alias("band_key"),
        )
        for k in range(N_BANDS)
    ]
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"m{i}") for i in range(N_PERM)]).alias("sig"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        "doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def dedup_incremental(
    new_docs, kept_sigs, min_agreement: float = 0.5, id_col: str = "doc_id", new_sigs=None
):
    """Dedup a new crawl against the retained corpus: returns the new docs
    minus (a) near-duplicates of KEPT documents and (b) within-crawl
    near-duplicates (cluster-minimum keeper among the new docs).

    `new_docs`: (doc_id, text, ...); `kept_sigs`: the persisted
    minhash_signatures table of the retained corpus. The kept corpus
    contributes only its signature rows — one band-key hash join, no
    re-shingling, no re-clustering, no kept-text I/O. Within-crawl pairs
    then run the standard in-bucket expansion + connected components over
    the NEW docs alone. At a 10^12-doc retained corpus with a 10^9-doc
    dump, the big side is touched exactly once, by the (pre-computed,
    sorted-on-band_key-able) signature join.

    `new_sigs`: optionally the new crawl's own minhash_signatures view,
    already materialized — callers that persist the signatures anyway
    (corpus_pipeline.corpus_tick) pass it so the delta is shingled exactly
    once instead of twice.

    Skew story for the signature join (band_key is the join key): a hot
    band bucket — web boilerplate shared by millions of pages — is a
    single join KEY, which AQE's skew-join splitting handles on the
    kept-vs-new equi-join (spark.sql.adaptive.skewJoin, on in
    session.get_spark: an oversized band_key partition is split at
    runtime, and each split still joins correctly because splitting the
    probe side of an equi-join is value-transparent). The within-crawl
    half never sees that skew at all: its bucket expansion drops buckets
    over BUCKET_CAP outright (pinned in tests/test_dedup_stress.py —
    boilerplate that identical is exact-dedup's job, and the cap bounds
    the quadratic pair expansion no matter the corpus)."""
    if new_sigs is None:
        new_sigs = minhash_signatures(new_docs, id_col=id_col).transform(lineage_cut)
    agree = lambda a, b: F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda t: t)
    ) / F.lit(float(N_PERM))

    # (a) new vs KEPT: band-key equi-join, agreement >= threshold
    k = kept_sigs.select(
        F.col("doc_id").alias("kept_id"),
        F.col("sig").alias("kept_sig"),
        "band",
        "band_key",
    )
    vs_kept = (
        new_sigs.join(k, ["band", "band_key"])
        .where(agree(F.col("sig"), F.col("kept_sig")) >= min_agreement)
        .select("doc_id")
        .distinct()
    )

    # (b) new vs NEW: the standard bucket expansion over this crawl only
    buckets = (
        new_sigs.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= BUCKET_CAP))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (da, i) ->"
                    " transform(slice(docs, i + 2, size(docs)), db ->"
                    " struct(da.doc_id AS doc_a, db.doc_id AS doc_b,"
                    " da.sig AS sig_a, db.sig AS sig_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .where(agree(F.col("sig_a"), F.col("sig_b")) >= min_agreement)
        .select("doc_a", "doc_b")
        .distinct()
        .transform(lineage_cut)
    )
    within_losers = duplicate_clusters(pairs).where(
        F.col("node") != F.col("cluster_id")
    ).select(F.col("node").alias("doc_id"))

    drop = vs_kept.union(within_losers).distinct().withColumnRenamed("doc_id", id_col)
    return new_docs.join(drop, id_col, "left_anti")
