"""Copy-on-write MERGE on ice tables (sources/icetable.merge_by_key) —
the recrawl-upsert primitive: fold a new crawl's captures into the pages
table so each url keeps exactly one current row (Iceberg MERGE INTO / COW
semantics: stats-pruned candidate rewrite + atomic swap, with
validate-no-conflicting-appends on the key range).
"""

import datetime

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-merge", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def _ts(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def _t(h):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(hours=h)


def test_merge_plain_upsert(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    s = it.merge_by_key(spark, t, _df(spark, [("b", 20), ("d", 4)]), key="url")
    assert s["replaced_rows"] == 1 and s["inserted_rows"] == 2
    assert it.snapshot(t)["operation"] == "merge"
    got = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert got == {("a", 1), ("b", 20), ("c", 3), ("d", 4)}
    # time travel: the pre-merge state is intact
    old = {(r.url, r.n) for r in it.read(spark, t, snapshot_id=1).collect()}
    assert old == {("a", 1), ("b", 2), ("c", 3)}
    # incremental scans refuse ranges containing the merge (membership moved)
    with pytest.raises(ValueError):
        it.read_incremental(spark, t, 1).collect()


def test_merge_latest_capture_wins(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_ts(spark, [("u1", _t(5), "old1"), ("u2", _t(5), "keep2")]), t)
    # delta: a NEWER capture of u1, a STALE capture of u2, a within-delta
    # recrawl of u3 (both captures in one dump: newest must win), ties favor
    # the delta (u2b at exactly _t(5) would replace — use a distinct url)
    delta = _ts(
        spark,
        [
            ("u1", _t(9), "new1"),
            ("u2", _t(1), "stale2"),
            ("u3", _t(2), "old3"),
            ("u3", _t(3), "new3"),
        ],
    )
    s = it.merge_by_key(spark, t, delta, key="url", latest_by="warc_ts")
    assert s["replaced_rows"] == 1  # only u1
    assert s["inserted_rows"] == 2  # u1 new row + u3 newest
    assert s["dropped_stale_delta_rows"] == 1  # u2's stale capture
    got = {(r.url, r.text) for r in it.read(spark, t).collect()}
    assert got == {("u1", "new1"), ("u2", "keep2"), ("u3", "new3")}


def test_merge_tie_favors_delta(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_ts(spark, [("u", _t(5), "existing")]), t)
    s = it.merge_by_key(
        spark, t, _ts(spark, [("u", _t(5), "delta")]), key="url",
        latest_by="warc_ts",
    )
    assert s["replaced_rows"] == 1
    got = [(r.url, r.text) for r in it.read(spark, t).collect()]
    assert got == [("u", "delta")]


def test_merge_pure_insert_commits_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    before = {e["path"] for e in it.snapshot(t)["manifest"]}
    s = it.merge_by_key(spark, t, _df(spark, [("x", 9), ("y", 10)]), key="url")
    assert s["replaced_rows"] == 0 and s["inserted_rows"] == 2
    snap = it.snapshot(t)
    assert snap["operation"] == "append"  # honest: membership only grew
    assert before <= {e["path"] for e in snap["manifest"]}  # untouched files
    # a tailing incremental consumer keeps working across the pure insert
    delta = {r.url for r in it.read_incremental(spark, t, 1).collect()}
    assert delta == {"x", "y"}


def test_merge_fully_stale_delta_is_commit_free(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_ts(spark, [("u", _t(9), "current")]), t)
    head = it.current_snapshot_id(t)
    s = it.merge_by_key(
        spark, t, _ts(spark, [("u", _t(1), "ancient")]), key="url",
        latest_by="warc_ts",
    )
    assert s is None and it.current_snapshot_id(t) == head
    got = [(r.url, r.text) for r in it.read(spark, t).collect()]
    assert got == [("u", "current")]
    # the staged copies were dropped, not leaked as orphans
    assert it.orphan_data_files(t) == []


def test_merge_empty_table_and_empty_delta(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert it.merge_by_key(spark, t, _df(spark, []), key="url") is None
    s = it.merge_by_key(spark, t, _df(spark, [("a", 1)]), key="url")
    assert s["inserted_rows"] == 1 and s["replaced_rows"] == 0
    assert it.merge_by_key(spark, t, _df(spark, []), key="url") is None
    assert [(r.url, r.n) for r in it.read(spark, t).collect()] == [("a", 1)]


def test_merge_prunes_candidates_by_key_stats(spark, tmp_path):
    """A merge whose delta keys fall in one file's key range rewrites ONLY
    that file — the other append's files survive byte-identical (manifest
    stats pruning, the 10^12-row property)."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a1", 1), ("a2", 2)]).coalesce(1), t)
    it.append(_df(spark, [("z1", 10), ("z2", 20)]).coalesce(1), t)
    a_files = {e["path"] for e in it.snapshot(t, 1)["manifest"]}
    s = it.merge_by_key(spark, t, _df(spark, [("z1", 99)]), key="url")
    assert s["rewritten_files"] == 1
    snap = it.snapshot(t)
    assert a_files <= {e["path"] for e in snap["manifest"]}
    got = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert got == {("a1", 1), ("a2", 2), ("z1", 99), ("z2", 20)}


def test_merge_preserves_hidden_partitioning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("u1", "en", 1), ("u2", "de", 2)], "url string, lang string, n int"
    )
    it.append(df, t, partition_by=["lang"])
    delta = spark.createDataFrame(
        [("u1", "en", 11), ("u3", "fr", 3)], "url string, lang string, n int"
    )
    s = it.merge_by_key(spark, t, delta, key="url")
    assert s["replaced_rows"] == 1
    snap = it.snapshot(t)
    assert snap["partition_spec"] == ["lang"]
    # every file (survivor rewrites AND inserts) stays single-partition
    for e in snap["manifest"]:
        assert e["partition"].startswith("p_lang="), e
    got = {(r.url, r.lang, r.n) for r in it.read(spark, t).collect()}
    assert got == {("u1", "en", 11), ("u2", "de", 2), ("u3", "fr", 3)}


def test_merge_aborts_on_conflicting_concurrent_append(spark, tmp_path):
    """Iceberg's validate-no-conflicting-appends: a rival commit adds a
    file whose key range intersects the delta while the merge is staging —
    committing would leave duplicate keys, so the merge must abort."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("m", 1)]), t)

    real_commit = it._commit
    raced = {"done": False}

    def racing_commit(path, snap):
        if not raced["done"] and snap.get("operation") == "merge":
            raced["done"] = True
            it._commit = real_commit
            try:
                it.append(_df(spark, [("m", 777)]), path)  # rival: same key
            finally:
                it._commit = racing_commit
            raise it.CommitConflict("stolen id")  # forces the re-base path
        return real_commit(path, snap)

    it._commit = racing_commit
    try:
        with pytest.raises(it.CommitConflict):
            it.merge_by_key(spark, t, _df(spark, [("m", 2)]), key="url")
    finally:
        it._commit = real_commit
    # nothing committed by the merge: the rival's row is the current state
    got = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert got == {("m", 1), ("m", 777)}


def test_merge_rebases_over_disjoint_concurrent_append(spark, tmp_path):
    """A rival append OUTSIDE the merge key range is no conflict: the
    retry re-bases and both commits' rows are visible."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("m", 1)]), t)

    real_commit = it._commit
    raced = {"done": False}

    def racing_commit(path, snap):
        if not raced["done"] and snap.get("operation") == "merge":
            raced["done"] = True
            it._commit = real_commit
            try:
                it.append(_df(spark, [("zzz", 777)]), path)  # disjoint key
            finally:
                it._commit = racing_commit
            raise it.CommitConflict("stolen id")
        return real_commit(path, snap)

    it._commit = racing_commit
    try:
        s = it.merge_by_key(spark, t, _df(spark, [("m", 2)]), key="url")
    finally:
        it._commit = real_commit
    assert s["replaced_rows"] == 1
    got = {(r.url, r.n) for r in it.read(spark, t).collect()}
    assert got == {("m", 2), ("zzz", 777)}


def test_job_cli_ingest_pages(spark, tmp_path, capsys):
    """job.main --ingest-pages: recrawl-upsert a dump into the pages table
    from the spark-submit surface."""
    import datetime

    from kraken_spark.job import main

    pages = str(tmp_path / "pages")
    dump1 = str(tmp_path / "dump1")
    dump2 = str(tmp_path / "dump2")
    t0 = datetime.datetime(2026, 1, 1)
    _ts(spark, [("u1", t0, "v1"), ("u2", t0, "v1")]).write.parquet(dump1)
    rc = main(["--input", dump1, "--output", pages, "--ingest-pages"])
    assert rc == 0 and "2 inserted" in capsys.readouterr().out
    # second dump: newer u1, stale u2, new u3
    _ts(
        spark,
        [
            ("u1", t0 + datetime.timedelta(days=1), "v2"),
            ("u2", t0 - datetime.timedelta(days=1), "old"),
            ("u3", t0, "v1"),
        ],
    ).write.parquet(dump2)
    rc = main(["--input", dump2, "--output", pages, "--ingest-pages"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2 inserted" in out and "1 recrawls replaced" in out
    assert "1 stale captures dropped" in out
    got = {(r.url, r.text) for r in it.read(spark, pages).collect()}
    assert got == {("u1", "v2"), ("u2", "v1"), ("u3", "v1")}
