"""Table NDV stats (sources/icetable.py analyze/approx_distinct): per-file
HLL sketches computed once (incremental), merged driver-side, pruned with
the manifest window, GC'd by vacuum. The metadata-only answer to "how many
distinct urls in this snapshot / crawl window"."""

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-stats", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _urls(spark, lo, hi, dup=1):
    rows = [(f"u{i:06d}", i) for i in range(lo, hi)] * dup
    return spark.createDataFrame(rows, "url string, n int")


def test_analyze_and_approx_distinct(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 1500, dup=2), t)  # duplicates don't inflate
    it.append(_urls(spark, 1000, 2000), t)  # overlap across files
    r = it.analyze(spark, t, cols=["url"])
    assert r["analyzed_files"] >= 2
    d = it.approx_distinct(t, "url")
    assert d["covered_files"] == d["total_files"]
    assert d["covered_rows"] == d["total_rows"] == 4000
    assert abs(d["ndv"] - 2000) / 2000 < 0.05, d
    # incremental: nothing new to analyze
    assert it.analyze(spark, t, cols=["url"])["analyzed_files"] == 0
    # new append: only the delta is analyzed; merged estimate grows
    before = {e["path"] for e in it.snapshot(t)["manifest"]}
    it.append(_urls(spark, 2000, 2500), t)
    added_nonempty = [
        e
        for e in it.snapshot(t)["manifest"]
        if e["path"] not in before and e["rows"] > 0
    ]
    r = it.analyze(spark, t, cols=["url"])
    assert r["analyzed_files"] == len(added_nonempty) > 0
    d = it.approx_distinct(t, "url")
    assert abs(d["ndv"] - 2500) / 2500 < 0.05, d


def test_approx_distinct_window_pruning(spark, tmp_path):
    """NDV of one manifest-pruned window — the 'distinct urls in this
    crawl window' question, driver-side."""
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 800).coalesce(1), t)
    it.append(_urls(spark, 800, 2000).coalesce(1), t)
    it.analyze(spark, t, cols=["url"])
    d = it.approx_distinct(t, "url", where={"url": ("u000800", None)})
    assert d["total_files"] == 1 and d["covered_files"] == 1
    assert abs(d["ndv"] - 1200) / 1200 < 0.05, d


def test_uncovered_files_reported_not_undercounted(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 500).coalesce(1), t)
    it.analyze(spark, t, cols=["url"])
    it.append(_urls(spark, 500, 900).coalesce(1), t)  # NOT analyzed
    d = it.approx_distinct(t, "url")
    assert d["covered_files"] == 1 and d["total_files"] == 2
    assert d["covered_rows"] == 500 and d["total_rows"] == 900
    assert abs(d["ndv"] - 500) / 500 < 0.05  # estimate over covered only


def test_analyze_stage_is_map_only(spark, tmp_path):
    """Scale guard: sketch folding must add NO shuffle — per-file partial
    registers merge driver-side, so the analyze scan is one map stage."""
    from pyspark.sql import functions as F

    from kraken_spark.kernels import hll  # noqa: F401

    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 1000), t)
    snap = it.snapshot(t)
    files = [f"{t}/{e['path']}" for e in snap["manifest"]]
    df = spark.read.parquet(*files).select(
        F.input_file_name().alias("_f"), F.xxhash64("url").alias("_h_0")
    )
    # the same stage analyze() executes: scan -> project -> mapInArrow
    import pyarrow as pa

    def fold(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict(
                {"f": [""], "c": [0], "b64": [""]}
            )

    plan = (
        df.mapInArrow(fold, "f string, c long, b64 string")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_multi_column_analyze(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(f"u{i}", i % 7) for i in range(1000)], "url string, n int"
    )
    it.append(df, t)
    it.analyze(spark, t, cols=["url", "n"])
    assert abs(it.approx_distinct(t, "url")["ndv"] - 1000) / 1000 < 0.05
    n_est = it.approx_distinct(t, "n")["ndv"]
    assert abs(n_est - 7) < 1.0, n_est  # linear-counting small range


def test_job_cli_maintain_analyze_leg(spark, tmp_path, capsys):
    from kraken_spark import job

    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 400), t)
    rc = job.main(
        ["--input", t, "--output", t, "--maintain", "--analyze-cols", "url",
         "--vacuum-grace-ms", "0"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "analyzed" in out and "files for NDV" in out
    d = it.approx_distinct(t, "url")
    assert d["covered_files"] == d["total_files"]
    assert abs(d["ndv"] - 400) / 400 < 0.05


def test_vacuum_prunes_stats_of_reclaimed_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 300), t)
    it.analyze(spark, t, cols=["url"])
    assert it.approx_distinct(t, "url")["covered_files"] > 0
    it.overwrite(_urls(spark, 0, 100), t)
    it.expire_snapshots(t, keep_last=1)
    v = it.vacuum(t, grace_ms=0)
    assert v["pruned_stats_entries"] > 0
    # sketches for live-but-unanalyzed files: honest zero coverage
    d = it.approx_distinct(t, "url")
    assert d["covered_files"] == 0 and d["ndv"] == 0.0
    it.analyze(spark, t, cols=["url"])
    assert abs(it.approx_distinct(t, "url")["ndv"] - 100) / 100 < 0.06
