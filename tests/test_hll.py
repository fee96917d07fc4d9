"""HyperLogLog kernel (kernels/hll.py): estimator accuracy, lossless
merge-by-max, register math edge cases, serialization round-trip. Pure
numpy — no Spark."""

import numpy as np
import pytest

from kraken_spark.kernels import hll


def _hashes(n, seed):
    # a 64-bit uniform RNG stands in for xxhash64 output
    return np.random.default_rng(seed).integers(
        0, 2**64, size=n, dtype=np.uint64
    )


def test_clz64_edges():
    x = np.array([0, 1, 2, 1 << 63, (1 << 64) - 1, 1 << 31], dtype=np.uint64)
    assert hll._clz64(x).tolist() == [64, 63, 62, 0, 0, 32]


def test_register_edge_cases():
    # all-zero suffix: rank capped at 64-P+1; top bits select the register
    h = np.array([0, 1 << 63], dtype=np.uint64)
    regs = hll.registers_from_hashes(h)
    assert regs[0] == 64 - hll.P + 1
    assert regs[1 << (hll.P - 1)] == 64 - hll.P + 1
    # int64 (Spark xxhash64) negatives are reinterpreted, not rejected
    regs2 = hll.registers_from_hashes(np.array([-1, -(1 << 62)], dtype=np.int64))
    assert regs2.sum() > 0
    assert hll.registers_from_hashes(np.array([], dtype=np.uint64)).sum() == 0


@pytest.mark.parametrize("n,tol", [(100, 0.03), (5000, 0.05), (200_000, 0.04)])
def test_estimate_accuracy(n, tol):
    est = hll.estimate(hll.registers_from_hashes(_hashes(n, seed=n)))
    assert abs(est - n) / n < tol, est


def test_duplicates_do_not_inflate():
    h = _hashes(1000, seed=7)
    est1 = hll.estimate(hll.registers_from_hashes(h))
    est2 = hll.estimate(hll.registers_from_hashes(np.tile(h, 50)))
    assert est1 == est2


def test_merge_is_union():
    a, b = _hashes(3000, seed=1), _hashes(3000, seed=2)
    ra, rb = hll.registers_from_hashes(a), hll.registers_from_hashes(b)
    merged = hll.merge(ra, rb)
    whole = hll.registers_from_hashes(np.concatenate([a, b]))
    assert np.array_equal(merged, whole)  # merge == sketch of the union
    assert np.array_equal(hll.merge(ra, ra), ra)  # idempotent
    est = hll.estimate(merged)
    assert abs(est - 6000) / 6000 < 0.05


def test_b64_roundtrip_and_validation():
    r = hll.registers_from_hashes(_hashes(500, seed=3))
    assert np.array_equal(hll.from_b64(hll.to_b64(r)), r)
    with pytest.raises(ValueError, match="registers"):
        hll.from_b64("AAAA")
