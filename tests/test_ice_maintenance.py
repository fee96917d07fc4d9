"""Table maintenance triad (sources/icetable.py: compact /
expire_snapshots / vacuum — the rewrite_data_files / expire_snapshots /
remove_orphan_files analogs): the per-tick appending corpus's answer to
the small-files problem, plus the incremental-scan semantics that make
maintenance invisible to a tailing job.
"""

import os
import time

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-maint", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def _head_files(t):
    return [e["path"] for e in it.snapshot(t)["manifest"]]


def test_compact_preserves_rows_and_shrinks_manifest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):  # four tiny appends -> many small part files
        it.append(_df(spark, [(f"u{i}-{j}", i * 10 + j) for j in range(3)]), t)
    before = {(r.url, r.n) for r in it.read(spark, t).collect()}
    n_files_before = len(_head_files(t))
    s = it.compact(spark, t, target_bytes=1 << 30)
    assert s is not None and s["rewritten_rows"] == 12
    assert s["n_new_rows"] == 0  # row-preserving: adds no logical rows
    assert it.snapshot(t)["operation"] == "replace"
    after = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert after == before  # byte-for-byte row preservation
    assert len(_head_files(t)) < n_files_before
    # time travel to the pre-compaction snapshot still works: the small
    # files stay on disk until expire_snapshots
    old = {(r.url, r.n) for r in it.read(spark, t, snapshot_id=4).collect()}
    assert old == before


def test_compact_noop_cases(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert it.compact(spark, t) is None  # uncreated table
    it.append(_df(spark, [("a", 1)]).coalesce(1), t)
    assert it.compact(spark, t) is None  # single file: nothing to gain
    # all files above the small-file threshold: nothing qualifies
    it.append(_df(spark, [("b", 2)]).coalesce(1), t)
    assert it.compact(spark, t, small_bytes=1) is None


def test_incremental_scan_skips_replace_and_uses_per_snapshot_deltas(
    spark, tmp_path
):
    """The tailing-job contract: compaction between two ticks must neither
    break the scan (old code raised on non-append) nor double-deliver the
    rewritten rows; per-snapshot added-files is what makes both hold."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)  # s1
    it.append(_df(spark, [("b", 2)]), t)  # s2
    assert it.compact(spark, t, target_bytes=1 << 30) is not None  # s3
    it.append(_df(spark, [("c", 3)]), t)  # s4
    # delta after s2: only s4's rows — s3 rewrote a+b but added no rows
    got = {(r.url, r.n) for r in it.read_incremental(spark, t, 2).collect()}
    assert got == {("c", 3)}
    # genesis scan across the replace: every logical row exactly once
    allrows = [(r.url, r.n) for r in it.read_incremental(spark, t, 0).collect()]
    assert sorted(allrows) == [("a", 1), ("b", 2), ("c", 3)]
    # empty range ending on the replace snapshot itself
    assert it.read_incremental(spark, t, 2, 3).count() == 0
    # overwrite/rollback still refused
    it.rollback(t, 2)  # s5
    with pytest.raises(ValueError):
        it.read_incremental(spark, t, 4)


def test_expire_snapshots_drops_metadata_and_unreachable_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(3):
        it.append(_df(spark, [(f"u{i}", i)]), t)  # s1..s3
    it.compact(spark, t, target_bytes=1 << 30)  # s4: replaces all smalls
    pre_files = set(_head_files(t))
    r = it.expire_snapshots(t, keep_last=1)
    assert r["expired_snapshots"] == [1, 2, 3]
    assert r["deleted_files"] > 0  # the compacted-away smalls are gone
    # head state intact, history gap-tolerant, expired time travel refused
    got = {(x.url, x.n) for x in it.read(spark, t).collect()}
    assert got == {("u0", 0), ("u1", 1), ("u2", 2)}
    assert [h["snapshot_id"] for h in it.history(t)] == [4]
    with pytest.raises(it.NoSuchSnapshot):
        it.read(spark, t, snapshot_id=2)
    # every file the head references survived expiry
    assert set(_head_files(t)) == pre_files
    for p in pre_files:
        assert os.path.exists(os.path.join(t, p))
    # the head never expires, even under keep_last=0
    r2 = it.expire_snapshots(t, keep_last=0)
    assert r2["expired_snapshots"] == []
    assert it.current_snapshot_id(t) == 4


def test_expire_older_than_requires_age(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.append(_df(spark, [("b", 2)]), t)
    # cutoff in the past: nothing is old enough even outside keep_last
    r = it.expire_snapshots(t, keep_last=0, older_than_ms=0)
    assert r["expired_snapshots"] == []
    r = it.expire_snapshots(
        t, keep_last=1, older_than_ms=int(time.time() * 1000) + 10_000
    )
    assert r["expired_snapshots"] == [1]


def test_vacuum_grace_period(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    # stage orphans the way a crashed writer would: a failed precondition
    # leaves written-but-uncommitted data files behind
    with pytest.raises(it.PreconditionFailed):
        it.append(_df(spark, [("b", 2)]), t, precondition=lambda p, par: False)
    orphans = it.orphan_data_files(t)
    assert orphans
    # inside the grace window the orphans are presumed in-flight
    assert it.vacuum(t, grace_ms=3600 * 1000)["deleted_files"] == 0
    assert it.orphan_data_files(t) == orphans
    r = it.vacuum(t, grace_ms=0)
    assert r["deleted_files"] == len(orphans)
    assert it.orphan_data_files(t) == []
    # committed data untouched
    assert {x.url for x in it.read(spark, t).collect()} == {"a"}


def test_delete_where_takedown_end_to_end(spark, tmp_path):
    """Copy-on-write row deletion — the takedown primitive: stats-pruned
    file rewrite, time-travel visibility until expiry, and physical
    erasure completed by expire+vacuum."""
    import glob

    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2), (None, 5)]).coalesce(1), t)
    it.append(_df(spark, [("c", 100)]).coalesce(1), t)
    c_files = {e["path"] for e in it.snapshot(t)["manifest"] if e["stats"].get("url", ["", ""])[0] == "c"}
    s = it.delete_where(spark, t, "url = 'a'", prune={"url": ("a", "a")})
    assert s["deleted_rows"] == 1 and s["rewritten_files"] == 1
    assert it.snapshot(t)["operation"] == "delete"
    # null-url row survives (SQL DELETE: only TRUE deletes), c untouched
    got = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert got == {("b", 2), (None, 5), ("c", 100)}
    assert c_files <= {e["path"] for e in it.snapshot(t)["manifest"]}
    # pre-delete snapshot still shows the row (time travel)
    old = {r.url for r in it.read(spark, t, snapshot_id=2).collect()}
    assert "a" in old
    # incremental ranges crossing the delete are refused (row membership
    # changed) — must check before expiry drops the range
    with pytest.raises(ValueError):
        it.read_incremental(spark, t, 1)
    # no-match deletes are commit-free no-ops (pruned-away and scanned)
    head = it.current_snapshot_id(t)
    assert it.delete_where(spark, t, "url = 'zz'", prune={"url": ("zz", "zz")}) is None
    assert it.delete_where(spark, t, "url = 'zz'") is None
    assert it.current_snapshot_id(t) == head
    # takedown COMPLETION: expire the pre-delete history, vacuum the files
    it.expire_snapshots(t, keep_last=1)
    it.vacuum(t, grace_ms=0)
    for f in glob.glob(os.path.join(t, "data", "**", "*.parquet"), recursive=True):
        tbl = pq.read_table(f)
        if "url" in tbl.column_names:
            assert "a" not in tbl.column("url").to_pylist()  # physically gone
    assert {(r.url, r.n) for r in it.read(spark, t).collect()} == got


def test_corpus_tick_watermark_survives_maintenance(spark, tmp_path):
    """The production loop's exactly-once contract across maintenance:
    compact + expire on BOTH tables between ticks must not re-deliver old
    rows or lose the watermark."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.corpus_pipeline import corpus_tick

    pages = str(tmp_path / "pages")
    kept = str(tmp_path / "kept")
    docs = generate_corpus_df(spark, 3).localCheckpoint(eager=True)
    it.append(docs.limit(2), pages)
    r1 = corpus_tick(spark, pages, kept, run_id="t1", num_partitions=2,
                     require_quality=False)
    assert r1["kept_new"] == 2
    # maintenance on both tables (expire keeps the watermark-bearing head)
    it.compact(spark, pages, target_bytes=1 << 30)
    it.compact(spark, kept, target_bytes=1 << 30)
    it.expire_snapshots(kept, keep_last=1)
    it.vacuum(kept, grace_ms=0)
    # second crawl -> second tick: only the new doc, nothing re-delivered
    it.append(docs.subtract(docs.limit(2)), pages)
    r2 = corpus_tick(spark, pages, kept, run_id="t2", num_partitions=2,
                     require_quality=False)
    assert (r2["extracted"], r2["kept_new"]) == (1, 1)
    assert it.read(spark, kept).count() == 3
    # caught up: the next tick is a commit-free no-op
    r3 = corpus_tick(spark, pages, kept, run_id="t3", num_partitions=2,
                     require_quality=False)
    assert r3["out_snapshot_id"] is None


def test_job_cli_maintain_mode(spark, tmp_path, capsys):
    from kraken_spark import job

    t = str(tmp_path / "tbl")
    for i in range(3):
        it.append(_df(spark, [(f"u{i}", i)]), t)
    rc = job.main(
        [
            "--input", t, "--output", t, "--maintain",
            "--keep-snapshots", "1", "--vacuum-grace-ms", "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "compacted" in out and "expired" in out
    assert it.snapshot(t)["operation"] == "replace"
    assert {x.url for x in it.read(spark, t).collect()} == {"u0", "u1", "u2"}
