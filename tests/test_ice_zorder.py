"""Z-order compaction (icetable.compact(zorder_by=...) — Iceberg's
rewrite_data_files sort strategy with a z-order): multi-column Morton
clustering so manifest-stat file skipping is selective on EVERY
z-ordered column, where a linear sort order gives exactly one selective
dimension.
"""

import pytest
from pyspark.sql import functions as F

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-zorder", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _grid(spark, n=64):
    return spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
        F.format_string("u%05d", F.col("id")).alias("url"),
    )


def _kept(t, where):
    snap = it.snapshot(t)
    data, _ = it._split_entries(snap["manifest"])
    return len(it._prune_entries(data, where))


def test_zorder_makes_both_dimensions_prunable(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_grid(spark), t, sort_by=["x"])  # linear: only x selective
    n_files = len(it.snapshot(t)["manifest"])
    assert n_files >= 8
    before = {r.url for r in it.read(spark, t).collect()}

    # linear layout: an x-window prunes, a y-window touches EVERY file
    assert _kept(t, {"x": (8, 9)}) < n_files
    assert _kept(t, {"y": (8, 9)}) == n_files

    total_bytes = sum(e["bytes"] for e in it.snapshot(t)["manifest"])
    r = it.compact(
        spark, t,
        target_bytes=max(1, total_bytes // 12),
        small_bytes=1 << 40,
        zorder_by=["x", "y"],
    )
    assert r is not None and r["zorder_by"] == ["x", "y"]
    n_after = len(it.snapshot(t)["manifest"])
    assert n_after >= 8

    # z-ordered layout: BOTH single-column windows prune, and a 2-D box
    # touches a small corner of the file set
    kx, ky = _kept(t, {"x": (8, 9)}), _kept(t, {"y": (8, 9)})
    assert kx < n_after and ky < n_after
    kbox = _kept(t, {"x": (8, 9), "y": (8, 9)})
    assert kbox <= min(kx, ky) and kbox <= n_after // 2

    # row-preserving: same logical table through the rewrite + time travel
    assert {r.url for r in it.read(spark, t).collect()} == before
    assert it.read(spark, t, snapshot_id=1).count() == len(before)
    # the op key does not leak into later snapshots' summaries
    it.append(_grid(spark).limit(1).withColumn("url", F.lit("zz")), t)
    assert "zorder_by" not in it.snapshot(t)["summary"]


def test_zorder_values_interleave(spark):
    df = _grid(spark, 16)
    z = df.withColumn("_z", it._zvalue_col(df, ["x", "y"], bits=4))
    rows = {(r.x, r.y): r._z for r in z.collect()}
    # Morton property on rank-uniform data: nearby points share high bits
    # — the max z-spread inside a 2x2 cell is far below the global spread
    global_spread = max(rows.values()) - min(rows.values())
    local = max(
        max(
            rows[(x + dx, y + dy)]
            for dx in (0, 1)
            for dy in (0, 1)
        )
        - min(
            rows[(x + dx, y + dy)]
            for dx in (0, 1)
            for dy in (0, 1)
        )
        for x in (0, 4, 8)
        for y in (0, 4, 8)
    )
    assert local < global_spread / 4


def test_job_cli_maintain_zorder(spark, tmp_path, capsys):
    from kraken_spark.job import main

    t = str(tmp_path / "t")
    it.append(_grid(spark), t)
    n_files = len(it.snapshot(t)["manifest"])
    rc = main(["--input", t, "--output", t, "--table-format", "ice",
               "--maintain", "--zorder-by", "x,y",
               "--compact-target-bytes", "65536"])
    assert rc == 0
    assert it.snapshot(t)["summary"].get("zorder_by") == ["x", "y"]
    assert it.read(spark, t).count() == 64 * 64
    # both dimensions prunable post-maintenance
    n_after = len(it.snapshot(t)["manifest"])
    if n_after > 2:
        assert _kept(t, {"y": (8, 9)}) < n_after
