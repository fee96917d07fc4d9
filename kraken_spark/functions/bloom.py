"""Dolma-style Bloom-filter dedup / decontamination (Soldaini et al. 2024,
"Dolma": one Bloom filter drives URL, document, and paragraph exact-dedup
across crawl dumps; Brown et al. 2020 App. C is the n-gram decontamination
recipe the bloom variant accelerates).

Scale shape at 10^12 docs — and why this exists beside the exact paths in
functions/dedup.py:

- Hashing and bit-position computation are ALL JVM codegen (xxhash64
  double hashing, Kirsch-Mitzenmacher h1 + i*h2): no Python touches the
  hash path, so build and probe agree bit-for-bit by construction.
- Each build task sets bits in ONE partition-local numpy bitmap and emits
  exactly one m/8-byte row; partials merge by bitwise OR in log depth
  (treeReduce) — no node ever holds more than a handful of bitmaps, and
  OR-idempotence makes the result independent of partitioning and retry.
- The finished filter (~1.2 GiB for 10^9 items at 1% FPR — the weight
  class of a large broadcast-join table) ships once per executor via a
  Spark broadcast; the probe is then MAP-ONLY: the 10^12-row corpus side
  never shuffles, and probing a NEW dump needs no access to old data at
  all. That last property is what the published pipelines buy with bloom:
  even the minhash signature table of dedup_incremental is a join side
  that grows with the retained corpus, while the bloom probe's cost is a
  constant-size broadcast regardless of history.
- Trade-off: probabilistic — a tunable false-positive rate (items never
  seen can flag), but ZERO false negatives (a seen item always flags), so
  a bloom dedup pass can only over-drop, never leak a duplicate.
  decontaminate() in functions/dedup.py stays the oracle-exact twin;
  bloom_decontaminate's flags are a superset of its flags by construction
  (pinned in tests/test_bloom.py).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ..kernels import bloom as kb
from .dedup import DECONTAM_K, MIN_PARA_LEN, _norm_gram_strings

# Second xxhash64 input making h2 independent of h1 (golden-ratio constant;
# any fixed literal works — it only has to differ from the bare-column hash)
_H2_SALT = 0x9E3779B9


def _positions(col, m_bits: int, k: int):
    """array<bigint> of the k bit positions for one string item, entirely
    JVM-side: h1, h2 = xxhash64(x), xxhash64(x, salt); pos_i = (h1' + i*h2')
    mod m with h1' in [0,m) and h2' in [1,m) so the k probes never collapse
    to a single position. No overflow: h1' + i*h2' < (k+1)*m << 2^63."""
    m = F.lit(m_bits).cast("bigint")
    h1 = F.pmod(F.xxhash64(col), m)
    h2 = F.pmod(F.xxhash64(col, F.lit(_H2_SALT)), m - F.lit(1).cast("bigint")) + F.lit(1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i.cast("bigint") * h2, m),
    )


def bloom_build(items, col: str, m_bits: int, k: int) -> bytes:
    """Insert every value of `items[col]` (string) into a fresh filter and
    return the packed bitmap (m_bits/8 bytes). One numpy bitmap per task,
    one emitted row per non-empty task, log-depth OR merge."""
    import pyarrow as pa

    pos = items.select(F.explode(_positions(F.col(col), m_bits, k)).alias("pos"))

    def fn(batches):
        bm = kb.empty(m_bits)
        got = False
        for b in batches:
            got = True
            kb.set_bits(bm, b.column("pos").to_numpy(zero_copy_only=False))
        if got:
            yield pa.RecordBatch.from_arrays([pa.array([bm.tobytes()], pa.binary())], ["bm"])

    parts = pos.mapInArrow(fn, schema="bm binary")
    rdd = parts.rdd.map(lambda r: np.frombuffer(r[0], dtype=np.uint8))
    try:
        merged = rdd.treeReduce(np.bitwise_or)
    except ValueError:  # no items at all -> empty filter
        merged = kb.empty(m_bits)
    return merged.tobytes()


def _list_to_flat(col):
    """(flat int64 values, int64 row offsets) from an Arrow list column,
    slice-safe: pyarrow's ListArray.offsets is already slice-adjusted
    (len(col)+1 entries whose first is the value-offset of the first
    element — verified against a sliced array in tests/test_bloom.py), so
    the only normalization needed is rebasing to off[0]."""
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)[off[0] : off[-1]]
    return flat, off - off[0]


def bloom_probe(docs_items, bitmap: bytes, m_bits: int, k: int, id_col: str = "doc_id"):
    """(id, n_items, n_member_items) per row. docs_items: (id, items
    array<string>). Positions are computed JVM-side; the only Python is the
    vectorized kernel bit-test over the executor-broadcast bitmap. Map-only:
    the probed side never shuffles."""
    import pyarrow as pa

    id_type = docs_items.schema[id_col].dataType.simpleString()
    flat = F.flatten(F.transform(F.col("items"), lambda g: _positions(g, m_bits, k)))
    base = docs_items.select(
        F.col(id_col), F.size("items").alias("n_items"), flat.alias("pos")
    )
    bc = docs_items.sparkSession.sparkContext.broadcast(bitmap)

    def fn(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for b in batches:
            flat_pos, offsets = _list_to_flat(b.column("pos"))
            counts = kb.member_counts(bm, flat_pos, offsets, k)
            yield pa.RecordBatch.from_arrays(
                [b.column(id_col), b.column("n_items"), pa.array(counts, pa.int64())],
                [id_col, "n_items", "n_member_items"],
            )

    return base.mapInArrow(
        fn, schema=f"{id_col} {id_type}, n_items int, n_member_items long"
    )


# --------------------------------------------------------------------------
# Benchmark decontamination, bloom variant (scale path of
# functions/dedup.decontaminate — same normalization, same k-gram rule)
# --------------------------------------------------------------------------


def bloom_decontaminate(
    docs, benchmark, k_gram: int = DECONTAM_K, fpr: float = 0.001, id_col: str = "doc_id"
):
    """(id, n_flagged_grams, flagged) per training document: flagged when
    any normalized k-gram probes the filter built over the benchmark's
    grams. Flags are a SUPERSET of decontaminate()'s exact flags (zero
    false negatives); the sizing count runs over the benchmark side only
    (eval sets are 10^5-10^6 grams — the cheap side by construction)."""
    # materialize the (tiny) gram set once: the sizing count and the build
    # both read the checkpoint instead of re-running the gram construction
    bench = (
        _norm_gram_strings(benchmark, "bench_id", k_gram)
        .select(F.explode("items").alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = bench.count()
    m_bits, k = kb.params(n, fpr)
    bm = bloom_build(bench, "g", m_bits, k)
    probed = bloom_probe(
        _norm_gram_strings(docs, id_col, k_gram), bm, m_bits, k, id_col=id_col
    )
    return probed.select(
        id_col,
        F.col("n_member_items").alias("n_flagged_grams"),
        (F.col("n_member_items") > 0).alias("flagged"),
    )


# --------------------------------------------------------------------------
# Cross-dump paragraph dedup, Dolma's production shape: build the filter
# over the RETAINED corpus's paragraphs once per dump, probe each new dump
# map-only with no access to retained data
# --------------------------------------------------------------------------


def _para_items(docs, id_col: str):
    """(id, items array<string>): each document's dedup-candidate
    paragraphs (trimmed, >= MIN_PARA_LEN — same candidacy rule as the
    exact paragraph-dedup path)."""
    return docs.select(
        F.col(id_col),
        F.filter(
            F.transform(F.split(F.col("text"), "\n"), lambda p: F.trim(p)),
            lambda p: F.length(p) >= MIN_PARA_LEN,
        ).alias("items"),
    )


def bloom_build_paragraphs(docs, m_bits: int, k: int, id_col: str = "url") -> bytes:
    """Filter over every candidate paragraph of `docs` (the retained
    corpus). Size m_bits/k with kernels.bloom.params(n_paragraphs, fpr)."""
    paras = _para_items(docs, id_col).select(F.explode("items").alias("p"))
    return bloom_build(paras, "p", m_bits, k)


def bloom_seen_paragraphs(new_docs, bitmap: bytes, m_bits: int, k: int, id_col: str = "url"):
    """(id, n_paras, n_seen_paras, dup_frac) per NEW document against the
    retained corpus's paragraph filter — the per-dump Dolma pass. Documents
    with dup_frac above a policy threshold are dropped by the caller;
    zero false negatives means no retained paragraph ever slips through."""
    probed = bloom_probe(_para_items(new_docs, id_col), bitmap, m_bits, k, id_col=id_col)
    return probed.select(
        id_col,
        F.col("n_items").alias("n_paras"),
        F.col("n_member_items").alias("n_seen_paras"),
        F.when(F.col("n_items") > 0, F.col("n_member_items") / F.col("n_items"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
