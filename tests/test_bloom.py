"""Dolma-style Bloom-filter dedup/decontamination (kernels/bloom.py +
functions/bloom.py): sizing math, the zero-false-negative guarantee, the
FPR band, partitioning-independent builds, superset agreement with the
exact decontamination path, cross-dump paragraph dedup, and a map-only
plan guard on the probe side.
"""

import random

import numpy as np
import pytest

import kraken_spark.kernels.bloom as kb
from kraken_spark.functions.bloom import (
    bloom_build,
    bloom_build_paragraphs,
    bloom_decontaminate,
    bloom_probe,
    bloom_seen_paragraphs,
    _norm_gram_strings,
)


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-bloom", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


# ------------------------------- kernel ----------------------------------


def test_params_published_sizing():
    # 10^9 items at 1% -> ~9.59e9 bits (~1.2 GiB), k = 7 (textbook values)
    m, k = kb.params(10**9, 0.01)
    assert abs(m - 9.585e9) / 9.585e9 < 0.01
    assert k == 7
    m2, k2 = kb.params(1000, 0.001)
    assert k2 == 10 and m2 % 64 == 0
    with pytest.raises(ValueError):
        kb.params(10, 0.0)


def test_kernel_no_false_negatives_and_fpr_band():
    rng = random.Random(4242)
    m, k = kb.params(2000, 0.01)
    bm = kb.empty(m)

    def positions(item):
        r = random.Random(hash(("blm", item)) & 0xFFFFFFFF)
        return np.array([r.randrange(m) for _ in range(k)], dtype=np.int64)

    inserted = [f"item-{i}" for i in range(2000)]
    for it in inserted:
        kb.set_bits(bm, positions(it))
    # zero false negatives: every inserted item has all k bits set
    flat = np.concatenate([positions(it) for it in inserted])
    off = np.arange(0, (len(inserted) + 1) * k, k, dtype=np.int64)
    counts = kb.member_counts(bm, flat, off, k)
    assert (counts == 1).all()
    # false positives on 10k absent items land near the designed rate
    absent = [f"absent-{rng.random()}" for _ in range(10_000)]
    flat_a = np.concatenate([positions(a) for a in absent])
    off_a = np.arange(0, (len(absent) + 1) * k, k, dtype=np.int64)
    fp = kb.member_counts(bm, flat_a, off_a, k).sum() / len(absent)
    assert fp <= 0.05  # designed 1%; generous ceiling against seed luck
    assert abs(kb.fpr_estimate(m, k, 2000) - 0.01) < 0.005


def test_kernel_empty_rows_and_edges():
    bm = kb.empty(64)
    kb.set_bits(bm, np.array([0, 63], dtype=np.int64))
    assert kb.get_bits(bm, [0, 1, 63]).tolist() == [1, 0, 1]
    # rows: [empty, one member item, empty, one absent item]
    counts = kb.member_counts(
        bm, np.array([0, 63, 1, 2], dtype=np.int64), np.array([0, 0, 2, 2, 4]), 2
    )
    assert counts.tolist() == [0, 1, 0, 0]
    with pytest.raises(ValueError):
        kb.member_counts(bm, np.array([0, 1, 2], dtype=np.int64), np.array([0, 3]), 2)


@pytest.mark.parametrize("seed", [1, 2])
def test_kernel_member_counts_property(seed):
    """member_counts agrees with a per-row brute-force reimplementation on
    randomized batches (random k, random row lengths incl. empties)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None, derandomize=True)
    @given(
        st.integers(1, 5),
        st.lists(st.lists(st.integers(0, 511), min_size=0, max_size=6), max_size=8),
        st.lists(st.integers(0, 511), min_size=0, max_size=40),
    )
    def check(k, rows, set_positions):
        bm = kb.empty(512)
        kb.set_bits(bm, np.array(set_positions, dtype=np.int64))
        # each row is a list of items; give each item k positions
        rng = random.Random(seed)
        row_pos = [
            [np.array([rng.randrange(512) for _ in range(k)], dtype=np.int64)
             for _ in row]
            for row in rows
        ]
        flat = (
            np.concatenate([p for r in row_pos for p in r])
            if any(row_pos) and sum(len(r) for r in row_pos)
            else np.zeros(0, dtype=np.int64)
        )
        off = np.cumsum([0] + [len(r) * k for r in row_pos]).astype(np.int64)
        got = kb.member_counts(bm, flat, off, k)
        want = [
            sum(1 for p in r if kb.get_bits(bm, p).all()) for r in row_pos
        ]
        assert got.tolist() == want

    check()


# ------------------------------ spark face --------------------------------


def test_list_to_flat_sliced_and_unsliced():
    """pyarrow ListArray.offsets is slice-adjusted; _list_to_flat must not
    re-apply col.offset (the unsliced path can't catch that — Spark's
    mapInArrow batches are normally unsliced)."""
    import pyarrow as pa

    from kraken_spark.functions.bloom import _list_to_flat

    arr = pa.array([[1, 2], [3], [4, 5, 6], [7]])
    flat, off = _list_to_flat(arr)
    assert flat.tolist() == [1, 2, 3, 4, 5, 6, 7]
    assert off.tolist() == [0, 2, 3, 6, 7]
    s = arr.slice(1, 2)  # [[3], [4, 5, 6]]
    flat_s, off_s = _list_to_flat(s)
    assert flat_s.tolist() == [3, 4, 5, 6]
    assert off_s.tolist() == [0, 1, 4]


def test_build_probe_e2e_partitioning_independent(spark):
    items = [(f"seen-{i}",) for i in range(500)]
    df = spark.createDataFrame(items, "g string")
    m, k = kb.params(500, 0.001)
    bm1 = bloom_build(df.repartition(1), "g", m, k)
    bm8 = bloom_build(df.repartition(8), "g", m, k)
    assert bm1 == bm8 and len(bm1) == m // 8  # OR-idempotent merge

    probe_in = spark.createDataFrame(
        [(1, [f"seen-{i}" for i in range(10)]),       # all inserted
         (2, ["seen-3", "never-a", "never-b"]),       # mixed
         (3, [])],                                     # empty
        "doc_id long, items array<string>",
    )
    rows = {r.doc_id: r for r in bloom_probe(probe_in, bm1, m, k).collect()}
    assert rows[1].n_member_items == 10  # zero false negatives
    assert rows[2].n_member_items >= 1
    assert rows[3].n_items == 0 and rows[3].n_member_items == 0


def test_empty_build_probes_false(spark):
    df = spark.createDataFrame([], "g string")
    bm = bloom_build(df, "g", 1024, 3)
    assert bm == bytes(1024 // 8)


def test_bloom_decontaminate_superset_of_exact(spark):
    from kraken_spark.functions.dedup import decontaminate

    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronomers watch the northern sky for comets every winter night"
    )
    clean = (
        "completely different material about cooking bread at home with "
        "flour water salt and patience across many seasons of practice"
    )
    docs = spark.createDataFrame(
        [(1, prose + " and then some extra words follow here"),
         (2, clean),
         (3, "short doc")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, prose)], "bench_id long, text string")
    exact = {r.doc_id: r.contaminated for r in decontaminate(docs, bench).collect()}
    bloom = {r.doc_id: r.flagged for r in bloom_decontaminate(docs, bench).collect()}
    assert exact[1] and not exact[2] and not exact[3]
    # superset: every exact hit is a bloom hit (no false negatives)
    assert all(bloom[d] for d in exact if exact[d])
    # at fpr=1e-3 over this tiny gram set, clean docs stay clean
    assert not bloom[2] and not bloom[3]


def test_paragraph_dedup_cross_dump(spark):
    shared = "this exact paragraph was already retained in the corpus before"
    kept = spark.createDataFrame(
        [(f"u{i}", f"unique retained paragraph number {i} with plenty of text\n"
          + shared) for i in range(50)],
        "url string, text string",
    )
    m, k = kb.params(200, 0.001)
    bm = bloom_build_paragraphs(kept, m, k)
    new = spark.createDataFrame(
        [("n1", shared + "\nplus one genuinely new paragraph of fresh text"),
         ("n2", "entirely novel content never seen in any retained document\n"
          "and a second novel paragraph to go with it"),
         ("n3", "x")],  # below MIN_PARA_LEN -> no candidate paragraphs
        "url string, text string",
    )
    rows = {r.url: r for r in bloom_seen_paragraphs(new, bm, m, k).collect()}
    assert rows["n1"].n_seen_paras == 1 and rows["n1"].n_paras == 2
    assert rows["n1"].dup_frac == pytest.approx(0.5)
    assert rows["n2"].n_seen_paras == 0
    assert rows["n3"].n_paras == 0 and rows["n3"].dup_frac == 0.0


def test_probe_plan_is_map_only(spark):
    docs = spark.createDataFrame(
        [(1, "some words repeated " * 20)], "doc_id long, text string"
    )
    m, k = kb.params(100, 0.01)
    probed = bloom_probe(_norm_gram_strings(docs, "doc_id", 13), b"\0" * (m // 8), m, k)
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "extended"
    )
    assert "Exchange" not in plan  # the corpus side never shuffles
