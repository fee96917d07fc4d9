"""HyperLogLog sketches for table-stats NDV estimation — pure numpy.

The Iceberg analog is Puffin ``apache-datasketches-theta-v1`` blobs
attached per data file so planners can estimate distinct counts without
scanning rows. This is the same capability from scratch: fixed 2^12
registers (~1.6 % relative error), built FROM 64-BIT HASHES so the hash
step stays JVM-side (Spark's ``xxhash64``) and only the register math
runs here; registers merge by elementwise max, which is what makes
per-FILE sketches composable into any file subset (a snapshot, one
partition, one crawl window) driver-side.

Estimator: Flajolet et al. 2007 HyperLogLog with the standard small-range
linear-counting correction; no large-range correction is needed at 64-bit
hash width. Reference capability: kraken has no stats subsystem — this
backs sources/icetable.analyze/approx_distinct (brief: 10^12-row corpus
bookkeeping).
"""

from __future__ import annotations

import base64

import numpy as np

P = 12  # register index bits
M = 1 << P  # 4096 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)  # bias constant for m >= 128


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (64 for x == 0)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = np.int64(32)
    while shift > 0:
        hi = x >> np.uint64(shift)
        has_hi = hi != 0
        n[has_hi] -= int(shift)
        x = np.where(has_hi, hi, x)
        shift >>= 1
    # x is now 0 or 1-bit-normalized: subtract the final set bit
    n[x != 0] -= 1
    return n


def registers_from_hashes(hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into a fresh register array.

    ``hashes`` may be int64 (Spark's xxhash64 is a signed long) or uint64;
    the bit pattern is used as-is. Register index = top P bits; rank =
    leading zeros of the remaining 64-P bits + 1, capped at 64-P+1 (the
    all-zero-suffix case).
    """
    h = np.asarray(hashes).view(np.uint64) if np.asarray(hashes).dtype == np.int64 \
        else np.asarray(hashes, dtype=np.uint64)
    regs = np.zeros(M, dtype=np.uint8)
    if h.size == 0:
        return regs
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = (h << np.uint64(P)).astype(np.uint64)  # suffix in the high bits
    rank = np.minimum(_clz64(w) + 1, 64 - P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge(*registers: np.ndarray) -> np.ndarray:
    """Union of sketches = elementwise max (lossless for HLL)."""
    out = np.zeros(M, dtype=np.uint8)
    for r in registers:
        np.maximum(out, r, out=out)
    return out


def estimate(registers: np.ndarray) -> float:
    """Distinct-count estimate with the small-range correction."""
    r = np.asarray(registers, dtype=np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-r))
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * M and zeros:
        return float(M * np.log(M / zeros))  # linear counting
    return float(e)


def to_b64(registers: np.ndarray) -> str:
    return base64.b64encode(np.asarray(registers, dtype=np.uint8).tobytes()).decode()


def from_b64(s: str) -> np.ndarray:
    regs = np.frombuffer(base64.b64decode(s), dtype=np.uint8)
    if regs.size != M:
        raise ValueError(f"sketch has {regs.size} registers, expected {M}")
    return regs.copy()
