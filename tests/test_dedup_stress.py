"""Degenerate-corpus stress pins for the dedup family (round-5 verdict #7).

A worst-case near-duplicate corpus: one hot cluster LARGER than the LSH
BUCKET_CAP (every doc identical -> one band bucket per band holding the
whole cluster), one dedupable cluster under the cap, and a unique tail.
Pins the documented cap semantics (an over-cap bucket is DROPPED — no
quadratic pair blowup; such boilerplate is exact-dedup's job), the
keep-one-per-cluster end-to-end behavior under the cap, and
connected_components' round bound on the adversarial chain graph (the
shape where naive label propagation needs O(diameter) rounds)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="tests-dedup-stress", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="module")
def degen_sf(spark, tmp_path_factory):
    """documents.parquet with: 300 identical docs (hot cluster, > the
    256-doc BUCKET_CAP), 200 identical docs (dedupable, < cap), and 50
    unique docs."""
    hot = "the quick brown fox jumps over the lazy dog again and again " * 5
    dup = "pack my box with five dozen liquor jugs every single day now " * 5
    rows = (
        [(i, hot) for i in range(300)]
        + [(1000 + i, dup) for i in range(200)]
        + [(2000 + i,
            "".join(__import__("random").Random(9000 + i).choices(
                "abcdefghijklmnopqrstuvwxyz ", k=400)))
           for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path_factory.mktemp("degen_sf"))
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_hot_bucket_capped_and_small_cluster_paired(spark, degen_sf):
    from kraken_spark.functions.dedup import BUCKET_CAP, dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, degen_sf).collect()
    ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    # the 300-doc hot cluster exceeds BUCKET_CAP in every band -> its
    # buckets are dropped, no quadratic pair expansion
    assert 300 > BUCKET_CAP
    assert not any(i < 300 for i in ids)
    # the 200-doc cluster is under the cap: all its pairs surface with
    # full signature agreement
    sub = [r for r in pairs if 1000 <= r.doc_a < 1200]
    assert len(sub) == 200 * 199 // 2
    assert all(r.sig_agreement == 1.0 for r in sub)
    # unique docs never pair
    assert not any(i >= 2000 for i in ids)


def test_corpus_dedup_keeps_one_per_cluster_under_cap(spark, degen_sf):
    from kraken_spark.functions.dedup import minhash_dedup_corpus

    kept = sorted(
        r.doc_id for r in minhash_dedup_corpus(spark, degen_sf).select("doc_id").collect()
    )
    # dedupable cluster -> exactly its minimum survives
    assert [i for i in kept if 1000 <= i < 1200] == [1000]
    # hot cluster is cap-dropped (documented: exact dedup's job) and the
    # unique tail is untouched
    assert len([i for i in kept if i < 300]) == 300
    assert len([i for i in kept if i >= 2000]) == 50


def test_connected_components_chain_converges_in_log_rounds(spark):
    """1024-node path graph: diameter 1023, so O(diameter) propagation
    cannot finish in 32 rounds — large-star/small-star must (Kiveris
    O(log^2 n)), labeling every node with the chain minimum."""
    from kraken_spark.functions.dedup import connected_components

    n = 1024
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(n - 1)], "hi long, lo long"
    )
    comp = connected_components(edges, max_iter=32).collect()
    assert len(comp) == n
    assert all(r.cluster_id == 0 for r in comp)
