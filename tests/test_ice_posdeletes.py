"""Merge-on-read POSITIONAL deletes (sources/icetable.py scrub_where —
Iceberg v2's position-delete files): row-level masking by (data file, row
ordinal) address when there is no key to delete by.

Pins: mask-without-rewrite + time travel, stacked scrubs compose without
re-masking, NULL-condition SQL semantics, mutual exclusion with equality
deletes, COW-op guards, compaction skipping pos-masked files (addresses
would invalidate), rewrite_deletes folding to physical erasure, changelog
emitting each masked row exactly once, table relocatability of the
address join, and the Python DataSource read applying the masks.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-pos", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows(spark, a, b, tag=None):
    df = spark.range(a, b).select(
        F.format_string("u%04d", F.col("id")).alias("url"),
        F.col("id").cast("int").alias("n"),
    )
    if tag is not None:
        df = df.withColumn("tag", F.lit(tag))
    return df


def test_scrub_masks_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 100), t)
    files_before = sorted(
        (e["path"], e["bytes"]) for e in it.snapshot(t)["manifest"]
    )
    s = it.scrub_where(spark, t, "n % 10 = 3")
    assert s is not None and s["n_pos_deletes"] == 10
    got = it.read(spark, t)
    assert got.count() == 90
    assert got.filter("n % 10 = 3").count() == 0
    # no data file was rewritten: same paths, same bytes
    data_now = sorted(
        (e["path"], e["bytes"])
        for e in it.snapshot(t)["manifest"]
        if e.get("content") not in ("eq-deletes", "pos-deletes")
    )
    assert data_now == files_before
    # time travel to the pre-scrub snapshot still sees every row
    assert it.read(spark, t, snapshot_id=1).count() == 100
    # the delete entry is honest metadata: 0 logical rows, named files
    pos_entries = [
        e for e in it.snapshot(t)["manifest"] if e.get("content") == "pos-deletes"
    ]
    assert len(pos_entries) == 1
    assert pos_entries[0]["rows"] == 0 and pos_entries[0]["n_pos"] == 10
    assert set(pos_entries[0]["files"]) <= {p for p, _ in files_before}


def test_stacked_scrubs_compose_and_never_remask(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 60), t)
    it.scrub_where(spark, t, "n < 10")
    s2 = it.scrub_where(spark, t, "n < 20")  # overlaps the first mask
    assert s2 is not None and s2["n_pos_deletes"] == 10  # only the NEW rows
    assert it.read(spark, t).count() == 40
    # a scrub whose matches are all already masked is a commit-free no-op
    assert it.scrub_where(spark, t, "n < 5") is None
    assert len(it.history(t)) == 3
    # NULL conditions keep the row (SQL DELETE semantics)
    t2 = str(tmp_path / "t2")
    it.append(_rows(spark, 0, 10, tag="x").withColumn(
        "tag", F.when(F.col("n") < 5, None).otherwise(F.col("tag"))
    ), t2)
    s = it.scrub_where(spark, t2, "tag = 'x'")
    assert s["n_pos_deletes"] == 5
    assert it.read(spark, t2).count() == 5  # null-tag rows kept


def test_mutual_exclusion_and_cow_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 30), t)
    it.scrub_where(spark, t, "n = 7")
    with pytest.raises(ValueError, match="one delete kind"):
        it.delete_keys(spark, t, ["u0003"], key="url")
    with pytest.raises(ValueError, match="rewrite_deletes"):
        it.delete_where(spark, t, "n = 9")
    with pytest.raises(ValueError, match="rewrite_deletes"):
        it.merge_by_key(spark, t, _rows(spark, 0, 1), key="url")
    it.rewrite_deletes(spark, t)
    # folded: both kinds usable again
    assert it.delete_keys(spark, t, ["u0003"], key="url") is not None
    with pytest.raises(ValueError, match="one delete kind"):
        it.scrub_where(spark, t, "n = 9")


def test_compact_skips_pos_masked_files(spark, tmp_path):
    t = str(tmp_path / "t")
    # several small files; scrub addresses rows in SOME of them
    for a in range(0, 40, 10):
        it.append(_rows(spark, a, a + 10), t)
    s = it.scrub_where(spark, t, "n in (3, 25)")
    assert s["n_pos_deletes"] == 2
    named = {
        f
        for e in it.snapshot(t)["manifest"]
        if e.get("content") == "pos-deletes"
        for f in e["files"]
    }
    r = it.compact(spark, t, target_bytes=1 << 30, small_bytes=1 << 30)
    if r is not None:  # unnamed files may compact; named ones must survive
        head_paths = {
            e["path"]
            for e in it.snapshot(t)["manifest"]
            if e.get("content") not in ("eq-deletes", "pos-deletes")
        }
        assert named <= head_paths
    # masks still apply after whatever compaction did
    got = it.read(spark, t)
    assert got.count() == 38 and got.filter("n in (3, 25)").count() == 0


def test_rewrite_deletes_folds_to_physical_erasure(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 50), t, sort_by=["url"])
    it.scrub_where(spark, t, "n % 10 = 1")
    r = it.rewrite_deletes(spark, t)
    assert r is not None and r["deleted_rows"] == 5
    got = it.read(spark, t)
    assert got.count() == 45 and got.filter("n % 10 = 1").count() == 0
    head = it.snapshot(t)
    assert all(e.get("content") not in ("eq-deletes", "pos-deletes")
               for e in head["manifest"])
    # physical erasure after expiry: no surviving parquet holds a masked row
    it.expire_snapshots(t, keep_last=1)
    it.vacuum(t, grace_ms=0)
    import pyarrow.parquet as pq

    for e in head["manifest"]:
        tbl = pq.read_table(os.path.join(t, e["path"]))
        assert not any(n % 10 == 1 for n in tbl.column("n").to_pylist())


def test_changelog_reports_each_masked_row_once(spark, tmp_path):
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 20), t)
    it.scrub_where(spark, t, "n < 5")
    it.scrub_where(spark, t, "n < 8")
    log = it.read_changelog(spark, t, 1).collect()
    dels = [(r.url, r._commit_snapshot_id) for r in log if r._change_type == "delete"]
    assert len(dels) == 8 and len(set(dels)) == 8
    assert {u for u, _ in dels} == {f"u{i:04d}" for i in range(8)}
    by_snap = {sid: sum(1 for _, s in dels if s == sid) for sid in {s for _, s in dels}}
    assert by_snap == {2: 5, 3: 3}  # each row reported in the snapshot that masked it


def test_mask_survives_table_relocation(spark, tmp_path):
    src = str(tmp_path / "orig")
    dst = str(tmp_path / "moved")
    it.append(_rows(spark, 0, 20), src)
    it.scrub_where(spark, src, "n = 4")
    shutil.move(src, dst)
    got = it.read(spark, dst)
    assert got.count() == 19 and got.filter("n = 4").count() == 0


def test_datasource_read_applies_pos_masks(spark, tmp_path):
    from kraken_spark.sources.ice_datasource import register

    register(spark)
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 40), t)
    it.scrub_where(spark, t, "n % 5 = 2")
    got = spark.read.format("ice").load(t)
    assert got.count() == 32
    assert got.filter("n % 5 = 2").count() == 0
    assert sorted(r.url for r in got.collect()) == sorted(
        r.url for r in it.read(spark, t).collect()
    )


def test_job_cli_scrub_leg(spark, tmp_path, capsys):
    from kraken_spark.job import main

    t = str(tmp_path / "out")
    it.append(_rows(spark, 0, 30), t)
    rc = main(["--input", t, "--output", t, "--scrub-where", "n >= 25"])
    assert rc == 0
    assert "masked 5 rows" in capsys.readouterr().out
    assert it.read(spark, t).count() == 25
    rc = main(["--input", t, "--output", t, "--table-format", "ice", "--maintain"])
    assert rc == 0
    assert it.read(spark, t).count() == 25
    assert all(e.get("content") not in ("eq-deletes", "pos-deletes")
               for e in it.snapshot(t)["manifest"])


def test_pos_read_plan_is_broadcast_anti_join(spark, tmp_path):
    """Scale guard: positional-mask application must be a BROADCAST hash
    anti-join on (file, pos) — scrub lists are small by construction; a
    shuffled anti-join would re-shuffle the whole table per read at
    100 TB. The address columns come from parquet _metadata (no extra
    scan, no shuffle to derive them)."""
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 50), t)
    it.scrub_where(spark, t, "n in (3, 7)")
    plan = it.read(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # exactly one exchange family: the broadcast of the tiny mask (the
    # corpus side itself must not shuffle for the mask)
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")


def test_incremental_skip_delete_snapshots(spark, tmp_path):
    """Iceberg's streaming-skip-delete-snapshots semantics: a takedown in
    the delta range is skipped (nothing re-delivered, nothing retracted)
    instead of halting the consumer; without the flag it still refuses."""
    t = str(tmp_path / "t")
    it.append(_rows(spark, 0, 10), t)                      # snap 1
    it.delete_keys(spark, t, ["u0003"], key="url")         # snap 2 (MOR)
    it.append(_rows(spark, 10, 15), t)                     # snap 3
    it.rewrite_deletes(spark, t)                           # snap 4 (fold)
    it.scrub_where(spark, t, "n = 11")                     # snap 5 (pos)
    it.append(_rows(spark, 15, 18), t)                     # snap 6
    with pytest.raises(ValueError, match="skip_delete_snapshots"):
        it.read_incremental(spark, t, 1)
    got = it.read_incremental(spark, t, 1, skip_delete_snapshots=True)
    # exactly the appended rows — the fold's rewritten copies of snap-1
    # rows are NOT re-delivered, and no mask retracts anything
    assert {r.url for r in got.collect()} == {f"u{i:04d}" for i in range(10, 18)}


def test_tail_extraction_across_takedown(spark, tmp_path):
    """A takedown on the pages table does not halt the tailing extractor
    when skip_delete_snapshots is on; the next tick processes only the
    genuinely new pages."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline import tail_extraction

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    docs = generate_corpus_df(spark, 3).localCheckpoint(eager=True)
    first = docs.limit(2).localCheckpoint(eager=True)
    it.append(first, pages)
    r = tail_extraction(spark, pages, out, num_partitions=2)
    assert r["processed"] == 2
    victim = first.limit(1).collect()[0].url
    it.delete_keys(spark, pages, [victim], key="url")
    it.append(docs.join(first.select("url"), "url", "left_anti"), pages)
    with pytest.raises(ValueError, match="skip_delete_snapshots"):
        tail_extraction(spark, pages, out, num_partitions=2)
    r2 = tail_extraction(
        spark, pages, out, num_partitions=2, skip_delete_snapshots=True
    )
    assert r2["processed"] == 1
    got = it.read(spark, out).collect()
    assert len(got) == 3 and all(r.cer == 0.0 for r in got)


def test_stream_source_skip_delete_snapshots_option(spark, tmp_path):
    from kraken_spark.sources.ice_datasource import register

    register(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    it.append(_rows(spark, 0, 10), src)
    it.scrub_where(spark, src, "n = 2")
    it.append(_rows(spark, 10, 14), src)
    # without the option the stream fails over the delete snapshot
    q_bad = (
        spark.readStream.format("ice").option("starting", "earliest").load(src)
        .writeStream.format("ice")
        .option("checkpointLocation", str(tmp_path / "ckpt_bad"))
        .trigger(availableNow=True).start(str(tmp_path / "dst_bad"))
    )
    with pytest.raises(Exception, match="delete|stream"):
        q_bad.awaitTermination(120)
        raise AssertionError("stream should have failed over the delete")
    q = (
        spark.readStream.format("ice").option("starting", "earliest")
        .option("skip_delete_snapshots", "true").load(src)
        .writeStream.format("ice")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start(dst)
    )
    q.awaitTermination(120)
    # every appended row delivered once; the mask neither halts nor retracts
    assert it.read(spark, dst).count() == 14


def test_propagate_takedowns_to_derived_table(spark, tmp_path):
    """The downstream half of a GDPR erasure: deletions on the pages
    table (equality takedowns, positional scrubs, COW deletes) land on a
    derived table as ONE merge-on-read commit; merges/recrawls never
    propagate; the watermark in the derived table's own summaries makes
    repeated runs exactly-once-per-deletion."""
    src = str(tmp_path / "pages")
    dst = str(tmp_path / "derived")
    it.append(_rows(spark, 0, 30), src)
    it.append(_rows(spark, 0, 30).withColumn("extra", F.lit("d")), dst)

    # nothing to propagate yet
    r0 = it.propagate_takedowns(spark, src, dst)
    assert r0["snapshot_id"] is None

    it.delete_keys(spark, src, ["u0003"], key="url")       # eq takedown
    it.rewrite_deletes(spark, src)                          # fold: silent
    it.scrub_where(spark, src, "n = 5")                     # positional
    it.rewrite_deletes(spark, src)
    it.delete_where(spark, src, "n = 9")                    # COW delete
    # a recrawl upsert must NOT take the url down downstream
    it.merge_by_key(
        spark, src, _rows(spark, 11, 12).withColumn("n", F.lit(1011)), key="url"
    )

    r = it.propagate_takedowns(spark, src, dst, run_id="p1")
    assert r["propagated_keys"] == 3
    got = it.read(spark, dst)
    assert got.count() == 27
    assert got.filter("url in ('u0003','u0005','u0009')").count() == 0
    assert got.filter("url = 'u0011'").count() == 1  # merge did not propagate

    # second run: watermark makes it a commit-free no-op
    n_snaps = len(it.history(dst))
    r2 = it.propagate_takedowns(spark, src, dst)
    assert r2["snapshot_id"] is None and len(it.history(dst)) == n_snaps

    # a later takedown propagates incrementally
    it.delete_keys(spark, src, ["u0020"], key="url")
    r3 = it.propagate_takedowns(spark, src, dst, run_id="p2")
    assert r3["propagated_keys"] == 1
    assert it.read(spark, dst).count() == 26
    # derived table folds its masks through normal maintenance
    it.rewrite_deletes(spark, dst)
    assert it.read(spark, dst).count() == 26


def test_job_cli_propagate_leg(spark, tmp_path, capsys):
    from kraken_spark.job import main

    src = str(tmp_path / "pages")
    dst = str(tmp_path / "derived")
    it.append(_rows(spark, 0, 10), src)
    it.append(_rows(spark, 0, 10), dst)
    it.delete_keys(spark, src, ["u0004", "u0006"], key="url")
    rc = main(["--input", src, "--output", dst, "--propagate-takedowns"])
    assert rc == 0
    assert "2 url keys taken down" in capsys.readouterr().out
    assert it.read(spark, dst).count() == 8
