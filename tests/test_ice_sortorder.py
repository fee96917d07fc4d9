"""Table write sort-order on ice tables (sources/icetable append/compact/
delete_where/merge_by_key `sort_by` / `sort_order`) — Iceberg's write
sort-order: range-clustered files give near-disjoint per-file key ranges,
which is what makes manifest-stats file skipping (and therefore merge
candidate pruning) selective instead of no-op at 10^12 rows.
"""

import json

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-sort", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _urls(spark, lo, hi, shuffled=True):
    rows = [(f"u{i:05d}", i) for i in range(lo, hi)]
    if shuffled:  # interleave so unsorted writes span the whole key range
        rows = rows[::2] + rows[1::2]
    return spark.createDataFrame(rows, "url string, n int")


def _urls_wide(spark, lo, hi):
    """Unsorted control with a PINNED layout: exactly two hash-shuffled
    files, each spanning ~the whole key range — independent of the shared
    session's parallelism (the module may run after a 32-core session)."""
    return _urls(spark, lo, hi).repartition(2)


def _url_ranges(t, sid=None):
    return [
        tuple(e["stats"]["url"])
        for e in it.snapshot(t, sid)["manifest"]
        if e["rows"] > 0
    ]


def _disjoint(ranges):
    rs = sorted(ranges)
    return all(rs[i][1] < rs[i + 1][0] for i in range(len(rs) - 1))


def test_sorted_append_files_are_disjoint_and_prunable(spark, tmp_path):
    # unsorted control: every file spans the key space -> nothing prunable
    t0 = str(tmp_path / "unsorted")
    it.append(_urls_wide(spark, 0, 100), t0)
    r0 = _url_ranges(t0)
    assert len(r0) >= 2 and not _disjoint(r0)
    kept0 = it._prune_entries(
        it.snapshot(t0)["manifest"], {"url": ("u00007", "u00007")}
    )
    assert len(kept0) == len(r0)  # a point read touches EVERY file

    t = str(tmp_path / "sorted")
    it.append(_urls(spark, 0, 100), t, sort_by=["url"])
    assert it.snapshot(t)["sort_order"] == ["url"]
    r = _url_ranges(t)
    assert len(r) >= 2 and _disjoint(r)
    kept = it._prune_entries(
        it.snapshot(t)["manifest"], {"url": ("u00007", "u00007")}
    )
    assert len(kept) == 1  # a point read touches ONE file
    # clustering changes layout only, never content
    got = {(x.url, x.n) for x in it.read(spark, t).collect()}
    assert got == {(f"u{i:05d}", i) for i in range(100)}


def test_sort_order_inherited_by_later_appends(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 60), t, sort_by=["url"])
    it.append(_urls(spark, 60, 120), t)  # no sort_by: inherits
    snap = it.snapshot(t)
    assert snap["sort_order"] == ["url"]
    # the second append's own files are range-clustered too
    first = {e["path"] for e in it.snapshot(t, 1)["manifest"]}
    second = [
        tuple(e["stats"]["url"])
        for e in snap["manifest"]
        if e["path"] not in first and e["rows"] > 0
    ]
    assert len(second) >= 2 and _disjoint(second)


def test_compaction_recluster_keeps_sort_order(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 80, 20):  # four small sorted appends
        it.append(_urls(spark, lo, lo + 20), t, sort_by=["url"])
    before = {(x.url, x.n) for x in it.read(spark, t).collect()}
    s = it.compact(spark, t, target_bytes=1 << 30)
    assert s is not None
    snap = it.snapshot(t)
    assert snap["operation"] == "replace" and snap["sort_order"] == ["url"]
    assert _disjoint(_url_ranges(t))  # compaction re-clustered globally
    assert {(x.url, x.n) for x in it.read(spark, t).collect()} == before


def test_merge_on_sorted_table_rewrites_one_file(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 100), t, sort_by=["url"])
    assert len(_url_ranges(t)) >= 2
    # the delta hits one file's key slice: only that file is a candidate
    delta = spark.createDataFrame([("u00003", 999)], "url string, n int")
    s = it.merge_by_key(spark, t, delta, key="url")
    assert s["rewritten_files"] == 1 and s["replaced_rows"] == 1
    got = {(x.url, x.n) for x in it.read(spark, t).collect()}
    assert ("u00003", 999) in got and len(got) == 100


def test_delete_preserves_sort_clustering(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_urls(spark, 0, 100), t, sort_by=["url"])
    s = it.delete_where(
        spark, t, "url = 'u00007'", prune={"url": ("u00007", "u00007")}
    )
    assert s["deleted_rows"] == 1 and s["rewritten_files"] == 1
    snap = it.snapshot(t)
    assert snap["sort_order"] == ["url"]
    assert _disjoint(_url_ranges(t))
    assert it.read(spark, t).count() == 99
