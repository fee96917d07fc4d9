"""Reliable-checkpoint wiring for iterative operators (round-5 hardening):
session.lineage_cut upgrades every iterative lineage cut (connected
components, PageRank, incremental dedup) from localCheckpoint to a
RELIABLE df.checkpoint whenever the session has a checkpoint directory —
the failure-tolerance a real cluster run needs (localCheckpoint blocks
die with their executor).

The reliable run executes in a SUBPROCESS: SparkContext.setCheckpointDir
is process-global, and leaking it into the shared test session would
silently flip every later dedup test onto the slow reliable path."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

from kraken_spark.session import get_spark, lineage_cut  # noqa: E402

EDGES = [(5, 1), (3, 1), (9, 7), (12, 9), (20, 20), (8, 2), (2, 1)]
LINKS = [
    ("a.com", "b.com", 2), ("b.com", "c.com", 1), ("c.com", "a.com", 3),
    ("d.com", "a.com", 1), ("a.com", "c.com", 1),
]

_CHILD = r"""
import json, sys
from kraken_spark.session import get_spark, lineage_cut
from kraken_spark.functions.dedup import connected_components
from kraken_spark.functions.web import domain_pagerank
import pyspark.sql.functions as F

spark = get_spark(app="ckpt-child", cores=2, shuffle_partitions=2,
                  checkpoint_dir=sys.argv[1])
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

edges = spark.createDataFrame(%(edges)s, "hi bigint, lo bigint")
cc = sorted(map(tuple, connected_components(edges).collect()))

links = spark.createDataFrame(%(links)s, "src_domain string, dst_domain string, n_links bigint")
pr = sorted((r[0], round(r[1], 12)) for r in domain_pagerank(links, iterations=5).collect())
print("RESULT" + json.dumps({"cc": cc, "pr": pr}))
"""


def test_lineage_cut_upgrades_with_checkpoint_dir(tmp_path):
    """With a checkpoint dir, lineage_cut returns a reliably-checkpointed
    frame (files appear under the dir) and both iterative operators
    produce byte-identical results to the localCheckpoint path."""
    spark = get_spark(app="tests-ckpt", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    from kraken_spark.functions.dedup import connected_components
    from kraken_spark.functions.web import domain_pagerank

    edges = spark.createDataFrame(EDGES, "hi bigint, lo bigint")
    cc_local = sorted(map(tuple, connected_components(edges).collect()))
    links = spark.createDataFrame(LINKS, "src_domain string, dst_domain string, n_links bigint")
    pr_local = sorted(
        (r[0], round(r[1], 12)) for r in domain_pagerank(links, iterations=5).collect()
    )

    ckpt = tmp_path / "ckpt"
    code = _CHILD % {"edges": EDGES, "links": LINKS}
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
    out = subprocess.run(
        [sys.executable, "-c", code, str(ckpt)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.split("RESULT", 1)[1])
    assert [tuple(x) for x in payload["cc"]] == cc_local
    assert [(d, v) for d, v in payload["pr"]] == pr_local
    # reliable checkpoints actually landed in the directory
    assert any(ckpt.rglob("*")), "no checkpoint files written"


def test_lineage_cut_local_fallback_without_dir():
    """Without a checkpoint dir the cut stays local (no files, lineage
    still truncated)."""
    spark = get_spark(app="tests-ckpt", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    if spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        pytest.skip("session already has a global checkpoint dir")
    df = spark.range(10)
    cut = lineage_cut(df)
    assert cut.count() == 10
    assert cut.rdd.toDebugString() is not None
