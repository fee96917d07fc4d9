"""Bloom-filter kernel: the bounded-memory set-membership structure behind
Dolma-style exact dedup (Soldaini et al. 2024 run ONE Bloom filter for URL,
document, and paragraph dedup across crawl dumps; the same structure backs
bloom-side benchmark decontamination at corpus scale).

Pure numpy, zero Spark imports (module convention). The hash path lives
ENTIRELY on the JVM: Spark computes each item's k bit positions with
xxhash64 double hashing (functions/bloom.py), and this kernel only ever
sees Arrow batches of precomputed int64 positions — so build and probe
agree bit-for-bit with no Python in the hash path, and the same positions
expression serves both sides.

Guarantees: an inserted item ALWAYS probes true (zero false negatives —
the property that makes a Bloom dedup pass safe: it can only over-drop,
never leak a duplicate); false positives occur at a tunable rate
~ (1 - e^{-kn/m})^k, sized by params(). Merging partial filters is a
bitwise OR — associative, commutative, idempotent — so partition-local
build order can never change the result.
"""

from __future__ import annotations

import math

import numpy as np


def params(n_items: int, fpr: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for n items at the target false-positive
    rate: m = -n ln p / (ln 2)^2, k = (m/n) ln 2 (standard sizing).
    m is rounded up to a multiple of 64 so the bitmap packs to whole bytes.

    Weight class at scale: 10^9 items at 1% -> ~1.2 GiB, k=7 — the same
    order as a large broadcast-join table; 10^9 at 0.1% -> ~1.8 GiB, k=10.
    """
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0,1), got {fpr}")
    n = max(1, int(n_items))
    m = max(64, math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def fpr_estimate(m_bits: int, k: int, n_inserted: int) -> float:
    """Expected false-positive rate after n insertions."""
    return (1.0 - math.exp(-k * n_inserted / m_bits)) ** k


def empty(m_bits: int) -> np.ndarray:
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    return np.zeros(m_bits // 8, dtype=np.uint8)


def set_bits(bitmap: np.ndarray, positions) -> None:
    """Set every bit position in-place. bitwise_or.at handles repeated
    positions within one batch (plain fancy-assign would drop them)."""
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        return
    np.bitwise_or.at(bitmap, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8))


def get_bits(bitmap: np.ndarray, positions) -> np.ndarray:
    """0/1 uint8 per position."""
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        return np.zeros(0, dtype=np.uint8)
    return (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1


def member_counts(bitmap: np.ndarray, flat_pos, row_offsets, k: int) -> np.ndarray:
    """Per-row count of member items, fully vectorized over an Arrow batch.

    flat_pos: int64 positions for ALL rows concatenated, each item
    contributing exactly k consecutive positions. row_offsets: int64 array
    of length n_rows+1 giving each row's [start, end) in POSITION units
    (multiples of k). An item is a member iff ALL k of its bits are set.
    Empty rows are handled by the cumulative-sum segment trick (reduceat
    misbehaves on empty segments)."""
    pos = np.asarray(flat_pos, dtype=np.int64)
    off = np.asarray(row_offsets, dtype=np.int64)
    if pos.size % k:
        raise ValueError(f"flat positions ({pos.size}) not a multiple of k={k}")
    if np.any(off % k):
        raise ValueError("row offsets must fall on item boundaries")
    item_ok = (
        get_bits(bitmap, pos).reshape(-1, k).all(axis=1)
        if pos.size
        else np.zeros(0, dtype=bool)
    )
    cs = np.concatenate([[0], np.cumsum(item_ok, dtype=np.int64)])
    g = off // k
    return cs[g[1:]] - cs[g[:-1]]
