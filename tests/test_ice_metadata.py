"""Metadata tables on ice tables (sources/icetable.metadata_table) — the
Iceberg $snapshots / $files / $partitions audit views: inspect commits,
file layout, and partition skew without touching row data.
"""

import json

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-meta", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _mk(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("u1", "en", 1), ("u2", "en", 2), ("u3", "de", 3)],
        "url string, lang string, n int",
    )
    it.append(df, t, partition_by=["lang"], summary={"run_id": "r1"})
    it.append(
        spark.createDataFrame([("u4", "fr", 4)], "url string, lang string, n int"),
        t,
        summary={"run_id": "r2"},
    )
    return t


def test_snapshots_view(spark, tmp_path):
    t = _mk(spark, tmp_path)
    rows = it.metadata_table(spark, t, "snapshots").orderBy("snapshot_id").collect()
    assert [r.snapshot_id for r in rows] == [1, 2]
    assert [r.operation for r in rows] == ["append", "append"]
    assert rows[1].parent_id == 1
    assert rows[1].n_rows == 4  # cumulative table size at snapshot 2
    assert json.loads(rows[0].summary)["run_id"] == "r1"
    # composes with SQL like any other DataFrame
    it.metadata_table(spark, t, "snapshots").createOrReplaceTempView("snaps")
    n = spark.sql("select count(*) as c from snaps where operation='append'")
    assert n.collect()[0].c == 2


def test_files_and_partitions_views(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files = it.metadata_table(spark, t, "files").collect()
    manifest = it.snapshot(t)["manifest"]
    assert {f.path for f in files} == {e["path"] for e in manifest}
    assert sum(f.rows for f in files) == 4
    by_part = {
        r.partition: (r.n_files, r.n_rows)
        for r in it.metadata_table(spark, t, "partitions").collect()
    }
    # first append clustered by lang; second inherited the spec
    assert by_part["p_lang=en"][1] == 2
    assert by_part["p_lang=de"][1] == 1
    assert by_part["p_lang=fr"][1] == 1
    # stats JSON carries prunable url bounds
    stats = json.loads(files[0].stats)
    assert "url" in stats and len(stats["url"]) == 2
    # historical snapshot: only the first append's files
    old = it.metadata_table(spark, t, "files", snapshot_id=1).collect()
    assert sum(f.rows for f in old) == 3


def test_empty_and_unknown(spark, tmp_path):
    t = str(tmp_path / "none")
    assert it.metadata_table(spark, t, "snapshots").count() == 0
    assert it.metadata_table(spark, t, "files").count() == 0
    with pytest.raises(ValueError):
        it.metadata_table(spark, t, "nope")


def test_job_cli_inspect(spark, tmp_path, capsys):
    t = _mk(spark, tmp_path)
    from kraken_spark.job import main

    rc = main(["--input", "unused", "--output", t, "--inspect", "snapshots"])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {o["snapshot_id"] for o in out} == {1, 2}
