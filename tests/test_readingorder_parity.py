"""Reading-order parity with the reference's own test vectors
(test_readingorder.py:25-207): bbox reading order for stacked /
side-by-side / real-page line pairs in both directions, topological sort
on partial-order matrices with and without self-loops, and the
line-in-region membership test. The reference's two `xfail`-marked
touching-line cases are intentionally not pinned (they document known
quirks of its `not _left_of` RTL comparison, not desired behavior)."""

import numpy as np

from kraken_spark.kernels.order import is_in_region, reading_order, topsort


def _box(poly):
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    return (min(xs), min(ys), max(xs), max(ys))


def test_order_simple_over_under():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10]]
    p1 = [[10, 30], [10, 40], [100, 40], [100, 30]]
    assert reading_order([_box(p0), _box(p1)]) == [0, 1]
    assert reading_order([_box(p0), _box(p1)], rl=True) == [0, 1]


def test_order_simple_over_under_touching():
    p0 = [[10, 10], [10, 30], [100, 30], [100, 10]]
    p1 = [[10, 30], [10, 40], [100, 40], [100, 30]]
    assert reading_order([_box(p0), _box(p1)]) == [0, 1]
    assert reading_order([_box(p0), _box(p1)], rl=True) == [0, 1]


def test_order_simple_left_right():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10]]
    p1 = [[150, 10], [150, 20], [250, 20], [250, 10]]
    assert reading_order([_box(p0), _box(p1)]) == [0, 1]


def test_order_simple_right_left():
    p0 = [[10, 10], [10, 20], [100, 20], [100, 10]]
    p1 = [[150, 10], [150, 20], [250, 20], [250, 10]]
    assert reading_order([_box(p0), _box(p1)], rl=True) == [1, 0]


def test_order_real_reverse():
    p0 = [[474, 2712], [466, 2669], [1741, 2655], [1749, 2696],
          [1746, 2709], [474, 2725]]
    p1 = [[493, 2409], [488, 2374], [1733, 2361], [1741, 2395],
          [1738, 2409], [493, 2422]]
    assert reading_order([_box(p0), _box(p1)]) == [1, 0]
    assert reading_order([_box(p0), _box(p1)], rl=True) == [1, 0]


def test_order_real_in_order():
    p0 = [[493, 2409], [488, 2374], [1733, 2361], [1741, 2395],
          [1738, 2409], [493, 2422]]
    p1 = [[474, 2712], [466, 2669], [1741, 2655], [1749, 2696],
          [1746, 2709], [474, 2725]]
    assert reading_order([_box(p0), _box(p1)]) == [0, 1]
    assert reading_order([_box(p0), _box(p1)], rl=True) == [0, 1]


def test_topsort_reference_vectors():
    # with self-loops on the diagonal
    assert topsort(np.array([[1, 1, 1], [0, 1, 1], [0, 0, 1]])) == [0, 1, 2]
    assert topsort(np.array([[1, 1, 1], [0, 1, 0], [0, 1, 1]])) == [0, 2, 1]
    # without
    assert topsort(np.array([[0, 1, 1], [0, 0, 1], [0, 0, 0]])) == [0, 1, 2]
    assert topsort(np.array([[0, 1, 1], [0, 0, 0], [0, 1, 0]])) == [0, 2, 1]


def test_is_in_region_reference_cases():
    square = [[0, 0], [1, 0], [1, 1], [0, 1]]
    # midpoint of the baseline, as the engine attaches lines to regions
    assert is_in_region((0.5, 0.5), square)
    real_poly = [[268, 656], [265, 613], [885, 611], [888, 656],
                 [885, 675], [265, 672]]
    assert is_in_region((578.0, 656.0), real_poly)
    assert not is_in_region((1.5, 1.5), square)
