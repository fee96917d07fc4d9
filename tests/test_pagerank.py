"""domain_pagerank parity: the distributed iterative rank must agree with
a dense numpy power iteration of the exact same model (weighted
column-stochastic transition, uniform teleport, uniform dangling
redistribution) at 1e-9, on graphs with every structural hazard —
dangling sinks, pure-inlink authorities, self-loops, parallel-weighted
edges — plus the conservation invariant sum(rank) == 1.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("pyspark")

from kraken_spark.functions.web import domain_pagerank  # noqa: E402
from kraken_spark.session import get_spark  # noqa: E402

# (src, dst, n_links): weighted edges with a self-loop (b->b, must be
# dropped), a dangling sink (e: inlinks only), an authority hub (d), and
# weight asymmetry (a->b carries 3x a->c).
EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "b", 5),
    ("b", "d", 2),
    ("c", "d", 1),
    ("c", "e", 1),
    ("d", "a", 1),
    ("f", "d", 4),
    ("f", "a", 1),
]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-pagerank", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def numpy_pagerank(edges, iterations, damping):
    no_self = [(s, d, w) for s, d, w in edges if s != d]
    nodes = sorted({s for s, _, _ in no_self} | {d for _, d, _ in no_self})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in no_self:
        W[idx[s], idx[d]] += w
    out = W.sum(axis=1)
    has_out = out > 0
    W[has_out] /= out[has_out, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[~has_out].sum()
        r = (1.0 - damping) / n + damping * (W.T @ r + dangling / n)
    return dict(zip(nodes, r))


@pytest.mark.parametrize("iterations,damping", [(1, 0.85), (7, 0.85), (12, 0.5)])
def test_pagerank_matches_numpy_power_iteration(spark, iterations, damping):
    edges = spark.createDataFrame(EDGES, "src_domain string, dst_domain string, n_links bigint")
    got = {
        r.domain: r.rank
        for r in domain_pagerank(edges, iterations=iterations, damping=damping).collect()
    }
    want = numpy_pagerank(EDGES, iterations, damping)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_authority_above_leaf(spark):
    edges = spark.createDataFrame(EDGES, "src_domain string, dst_domain string, n_links bigint")
    got = {r.domain: r.rank for r in domain_pagerank(edges, iterations=20).collect()}
    # d receives weighted links from b, c and f; f receives none.
    assert got["d"] > got["e"] > got["f"]


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src_domain string, dst_domain string, n_links bigint")
    assert domain_pagerank(edges, iterations=3).count() == 0


def test_pagerank_plan_is_iteration_invariant(spark):
    """localCheckpoint must truncate lineage: the analyzed plan of the
    result after 8 iterations must be no deeper than after 1 — otherwise
    the loop compounds plan size and dies at real iteration counts."""
    edges = spark.createDataFrame(EDGES, "src_domain string, dst_domain string, n_links bigint")
    depth = [
        domain_pagerank(edges, iterations=k)._jdf.queryExecution().analyzed().toString().count("\n")
        for k in (1, 8)
    ]
    assert depth[1] <= depth[0]
