"""Duplicate-cluster connected components (functions/dedup.py): the
cluster-formation pass after candidate generation (large-star/small-star,
Kiveris et al. SoCC 2014). Parity against a pure-Python union-find on
constructed and randomized graphs, chain-shaped convergence (the case
naive label propagation can't do in O(log) rounds), and the registered
dedup_ngram_jaccard query's cluster columns vs its recursive-CTE oracle
(exercised via tools/check_oracle in CI; here on sf0.001 directly).
"""

import random

import duckdb
import pytest

from kraken_spark.functions.dedup import (
    DEDUP_JACCARD_SQL,
    connected_components,
    dedup_ngram_jaccard,
    duplicate_clusters,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-cc", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _uf_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component, only for nodes touched by an edge
    touched = sorted({v for e in edges for v in e})
    comp_min = {}
    for v in touched:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in touched}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(
        [(max(a, b), min(a, b)) for a, b in edges], "hi bigint, lo bigint"
    )
    return {
        r.node: r.cluster_id for r in connected_components(df).collect()
    }


def test_cc_basic_shapes(spark):
    # two triangles bridged, a pair, an isolated chain
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (10, 11), (20, 21), (21, 22)]
    assert _cc_spark(spark, edges) == _uf_labels(edges)


def test_cc_chain_converges_logarithmically(spark):
    # a 64-node path: worst case for min-propagation (diameter 63); the
    # alternating algorithm must still fully resolve within max_iter=32
    # (Kiveris bound O(log^2 n); observed ~4 rounds)
    edges = [(i, i + 1) for i in range(63)]
    labels = _cc_spark(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 64


def test_cc_randomized_unionfind_parity(spark):
    rng = random.Random(4242)
    for trial in range(3):
        n = 60
        edges = list(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(range(n), 2)) for _ in range(40 + 10 * trial)
                )
            }
        )
        edges = [(a, b) for a, b in edges]
        assert _cc_spark(spark, edges) == _uf_labels(edges), f"trial {trial}"


def test_duplicate_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (20, 21)], "doc_a bigint, doc_b bigint"
    )
    rows = {r.node: (r.cluster_id, r.cluster_size) for r in duplicate_clusters(pairs).collect()}
    assert rows == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        7: (7, 2),
        9: (7, 2),
        20: (20, 2),
        21: (20, 2),
    }


def test_minhash_dedup_corpus_end_to_end(spark):
    """pairs -> clusters -> keep one per cluster: the kept set must contain
    every cluster minimum, drop every non-minimum, and never retain both
    members of a thresholded candidate pair."""
    import pyspark.sql.functions as F

    from kraken_spark.functions.dedup import dedup_minhash_lsh, minhash_dedup_corpus

    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF).where(F.col("sig_agreement") >= 0.5).collect()
    ]
    kept = {r.doc_id for r in minhash_dedup_corpus(spark, SF).select("doc_id").collect()}
    labels = _uf_labels(pairs)
    losers = {v for v, c in labels.items() if v != c}
    assert len(kept) == total - len(losers)
    assert not (kept & losers)
    for a, b in pairs:
        assert not (a in kept and b in kept)


def test_jaccard_query_cluster_columns_duckdb_parity(spark):
    got = {
        (r.doc_a, r.doc_b): (r.jaccard, r.cluster_id, r.cluster_size)
        for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = {
        (a, b): (j, c, s)
        for a, b, j, c, s in con.execute(DEDUP_JACCARD_SQL).fetchall()
    }
    assert got == want and len(got) > 0
    # cluster_id is always the component minimum, <= both pair members
    for (a, b), (_, c, s) in got.items():
        assert c <= a < b and s >= 2


def test_dedup_incremental_new_crawl_vs_kept(spark):
    """The per-dump production pattern: a new crawl deduped against the
    retained corpus's PERSISTED signatures — near-dups of kept docs drop,
    within-crawl near-dup clusters keep their minimum, fresh docs survive."""
    from kraken_spark.functions.dedup import dedup_incremental, minhash_signatures

    base = ("the quick brown fox jumps over the lazy dog while the band plays on "
            "and the crowd cheers loudly through the long summer evening " * 4)
    fresh1 = ("completely different content about maritime navigation charts and "
              "the history of lighthouse construction along rocky coastlines " * 4)
    fresh2 = ("a third topic entirely concerning the cultivation of alpine flowers "
              "in high-altitude greenhouse environments with controlled misting " * 4)
    kept = spark.createDataFrame([(1, base)], "doc_id long, text string")
    kept_sigs = minhash_signatures(kept).localCheckpoint(eager=True)

    new = spark.createDataFrame(
        [
            (100, base + " tiny tail edit."),   # near-dup of KEPT doc 1 -> drop
            (101, fresh1),                       # fresh -> keep
            (102, fresh1 + " small change."),   # within-crawl near-dup of 101 -> drop (101 is min)
            (103, fresh2),                       # fresh -> keep
        ],
        "doc_id long, text string",
    )
    kept_out = sorted(r.doc_id for r in dedup_incremental(new, kept_sigs).collect())
    assert kept_out == [101, 103]
