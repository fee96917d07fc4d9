"""Merge-on-read equality deletes (sources/icetable.py delete_keys /
rewrite_deletes): the O(metadata) takedown path. Pins the Iceberg-v2
sequence-number semantics — a delete masks only data files committed
BEFORE it; re-adds after the takedown are visible — plus the interactions
with compaction (mask survives, delete-set-aware grouping), branches
(staged rows unmasked, publish re-stamps), maintenance (expire + vacuum
reclaim folded delete files), and the COW-op guards.
"""

import os

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-mor", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def _data_files(t):
    snap = it.snapshot(t)
    return [e for e in snap["manifest"] if e.get("content") != "eq-deletes"]


def _delete_files(t):
    snap = it.snapshot(t)
    return [e for e in snap["manifest"] if e.get("content") == "eq-deletes"]


def test_delete_keys_masks_without_rewriting(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    before = {(e["path"], e["bytes"]) for e in _data_files(t)}
    s = it.delete_keys(spark, t, ["b", "zz-not-present"], key="url")
    assert s["n_delete_keys"] == 2 and s["delete_key"] == "url"
    # no data file touched: same paths, same bytes
    assert {(e["path"], e["bytes"]) for e in _data_files(t)} == before
    dels = _delete_files(t)
    assert len(dels) == 1 and dels[0]["rows"] == 0 and dels[0]["n_keys"] == 2
    got = {r.url: r.n for r in it.read(spark, t).collect()}
    assert got == {"a": 1, "c": 3}
    # time travel to the pre-delete snapshot still shows the row
    assert {r.url for r in it.read(spark, t, snapshot_id=1).collect()} == {
        "a", "b", "c",
    }


def test_sequence_rule_readd_after_takedown_visible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.delete_keys(spark, t, ["b"], key="url")
    it.append(_df(spark, [("b", 99)]), t)  # recrawl re-adds the url
    got = {r.url: r.n for r in it.read(spark, t).collect()}
    assert got == {"a": 1, "b": 99}, "post-delete append must be unmasked"
    # a SECOND delete masks both generations it pre-dates
    it.delete_keys(spark, t, ["b"], key="url")
    assert {r.url: r.n for r in it.read(spark, t).collect()} == {"a": 1}


def test_stacked_deletes_and_stats_pruned_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.append(_df(spark, [("c", 3), ("d", 4)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    it.delete_keys(spark, t, ["d"], key="url")
    got = {r.url for r in it.read(spark, t).collect()}
    assert got == {"b", "c"}
    # manifest-stats pruning composes with delete application
    got = {r.url for r in it.read(spark, t, where={"url": ("c", "d")}).collect()}
    assert got == {"c"}


def test_delete_keys_single_key_column_enforced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    with pytest.raises(ValueError, match="one equality-delete key"):
        it.delete_keys(spark, t, [1], key="n")


def test_delete_keys_noop_cases(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert it.delete_keys(spark, t, ["a"]) is None  # empty table
    it.append(_df(spark, [("a", 1)]), t)
    assert it.delete_keys(spark, t, []) is None  # empty key list
    assert it.current_snapshot_id(t) == 1


def test_delete_keys_dataframe_input(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    keys = spark.createDataFrame([("a",), ("a",)], "url string")
    s = it.delete_keys(spark, t, keys)
    assert s["n_delete_keys"] == 1  # deduped
    assert {r.url for r in it.read(spark, t).collect()} == {"b"}


def test_cow_ops_refuse_pending_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    with pytest.raises(ValueError, match="rewrite_deletes"):
        it.delete_where(spark, t, "n = 2")
    with pytest.raises(ValueError, match="rewrite_deletes"):
        it.merge_by_key(spark, t, _df(spark, [("b", 20)]), key="url")


def test_rewrite_deletes_folds_and_unblocks(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    it.delete_keys(spark, t, ["b"], key="url")
    s = it.rewrite_deletes(spark, t)
    assert s["deleted_rows"] == 1 and s["folded_delete_files"] == 1
    assert not _delete_files(t)
    assert {r.url for r in it.read(spark, t).collect()} == {"a", "c"}
    # physically gone: sum of manifest rows equals logical rows
    assert sum(e["rows"] for e in _data_files(t)) == 2
    # COW ops unblocked
    assert it.merge_by_key(spark, t, _df(spark, [("a", 10)]), key="url")[
        "replaced_rows"
    ] == 1
    # idempotent: nothing pending
    assert it.rewrite_deletes(spark, t) is None


def test_rewrite_deletes_stats_pruning_skips_disjoint_files(spark, tmp_path):
    """A file whose key range cannot contain any deleted key is left
    byte-untouched by the fold."""
    t = str(tmp_path / "tbl")
    # coalesce(1): one file per append regardless of session parallelism
    it.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1), t)
    it.append(_df(spark, [("x", 8), ("y", 9)]).coalesce(1), t)
    untouched = {
        e["path"]: e["bytes"]
        for e in _data_files(t)
        if (e.get("stats") or {}).get("url", ["", ""])[0] >= "x"
    }
    assert len(untouched) == 1
    it.delete_keys(spark, t, ["a"], key="url")
    s = it.rewrite_deletes(spark, t)
    assert s["rewritten_files"] == 1  # only the a/b file
    after = {e["path"]: e["bytes"] for e in _data_files(t)}
    for p, b in untouched.items():
        assert after.get(p) == b, "key-disjoint file was rewritten"
    assert {r.url for r in it.read(spark, t).collect()} == {"b", "x", "y"}


def test_compact_preserves_masks_and_groups_by_delete_set(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # coalesce(1): exactly one file per append so group sizes are exact
    it.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1), t)  # seq 1
    it.delete_keys(spark, t, ["a"], key="url")  # seq 2: masks only seq-1 files
    it.append(_df(spark, [("a", 10), ("c", 3)]).coalesce(1), t)  # seq 3: re-adds a
    before = {r.url: r.n for r in it.read(spark, t).collect()}
    assert before == {"a": 10, "b": 2, "c": 3}
    s = it.compact(spark, t, target_bytes=1 << 30)
    # the seq-1 file and seq-3 file have DIFFERENT applicable-delete sets:
    # they must not merge (merging would let the delete mask the re-add,
    # or unmask the original) — so nothing qualifies (each group has 1)
    assert s is None
    # now two files with the SAME delete set merge and the mask survives
    it.append(_df(spark, [("d", 4)]).coalesce(1), t)  # seq 4, same set as seq 3
    s = it.compact(spark, t, target_bytes=1 << 30)
    assert s is not None and s["compacted_files"] == 2
    assert {r.url: r.n for r in it.read(spark, t).collect()} == before | {"d": 4}
    # delete file still present and still applied after compaction; the
    # compacted file inherited the group's oldest sequence (3 > delete's 2)
    assert len(_delete_files(t)) == 1
    merged = [e for e in _data_files(t) if "/g0" in e["path"]]
    assert merged and all(e["seq"] == 3 for e in merged)


def test_branch_staged_rows_unmasked_publish_restamps(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.delete_keys(spark, t, ["b"], key="url")
    it.create_branch(t, "wap")
    # the branch audit view shows the MASKED table
    assert {r.url for r in it.read_branch(spark, t, "wap").collect()} == {"a"}
    # staged rows re-adding the deleted key are NOT masked (seq -1)
    it.branch_append(_df(spark, [("b", 99)]), t, "wap")
    got = {r.url: r.n for r in it.read_branch(spark, t, "wap").collect()}
    assert got == {"a": 1, "b": 99}
    # publish re-stamps to the publish commit's sequence: still visible on main
    it.publish_branch(t, "wap")
    got = {r.url: r.n for r in it.read(spark, t).collect()}
    assert got == {"a": 1, "b": 99}
    e = [x for x in _data_files(t) if x.get("seq") == it.current_snapshot_id(t)]
    assert e, "published entries must carry the publish snapshot's seq"


def test_metadata_files_show_delete_content(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    files = it.metadata_table(spark, t, "files").collect()
    data = [r for r in files if r.content == "data"]
    dels = [r for r in files if r.content == "eq-deletes"]
    assert data and len(dels) == 1
    assert dels[0].rows == 0 and dels[0].seq == 2
    assert all(r.seq == 1 for r in data)
    # partitions rollup counts DATA files only
    parts = it.metadata_table(spark, t, "partitions").collect()
    assert sum(r.n_files for r in parts) == len(data)


def test_read_incremental_refuses_delete_range_then_resumes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    it.append(_df(spark, [("b", 2)]), t)
    with pytest.raises(ValueError, match="incremental"):
        it.read_incremental(spark, t, 0).collect()
    # tailing from past the delete works
    got = [r.url for r in it.read_incremental(spark, t, 2).collect()]
    assert got == ["b"]


def test_delete_keys_cas_race_restamps_sequence(spark, tmp_path, monkeypatch):
    """A rival append that wins the first commit attempt forces the CAS
    retry, and the delete entry's sequence must be re-stamped to the NEW
    commit id — so the delete (which happens-after the rival) masks the
    rival's rows too. A stale sequence from the first attempt would
    silently exempt the rival's data."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    orig = it._commit
    state = {"injected": False}

    def inject(path, snap):
        if not state["injected"] and snap.get("operation") == "delete":
            state["injected"] = True
            it.append(_df(spark, [("z", 99)]), t)  # rival lands first
        return orig(path, snap)

    monkeypatch.setattr(it, "_commit", inject)
    s = it.delete_keys(spark, t, ["b", "z"], key="url")
    monkeypatch.undo()
    assert state["injected"]
    # the delete committed AFTER the rival: snapshot 3, and its entry's
    # sequence was re-stamped to 3 on the retry
    assert s["snapshot_id"] == 3
    dels = _delete_files(t)
    assert len(dels) == 1 and dels[0]["seq"] == 3
    # both the original 'b' and the rival's 'z' are masked; 'a' survives
    assert {r.url for r in it.read(spark, t).collect()} == {"a"}


def test_mor_read_plan_is_broadcast_anti_join(spark, tmp_path):
    """Scale guard: the delete application must be a BROADCAST hash
    anti-join (takedown lists are small by construction) — a shuffled
    anti-join would re-shuffle the whole table per read at 100 TB."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [(f"u{i}", i) for i in range(50)]), t)
    it.delete_keys(spark, t, ["u3", "u7"], key="url")
    plan = it.read(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_job_cli_takedown_then_maintain_folds(spark, tmp_path, capsys):
    """job.main --takedown commits the O(metadata) mask; --maintain folds
    it copy-on-write before compacting (the operational takedown flow)."""
    from kraken_spark import job

    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("u0", 0), ("u1", 1)]), t)
    it.append(_df(spark, [("u2", 2)]), t)
    keyfile = tmp_path / "takedown.txt"
    keyfile.write_text("u1\nu2\n")
    rc = job.main(["--input", t, "--output", t, "--takedown", f"@{keyfile}"])
    assert rc == 0
    assert "masked 2 url keys" in capsys.readouterr().out
    assert {r.url for r in it.read(spark, t).collect()} == {"u0"}
    rc = job.main(
        ["--input", t, "--output", t, "--maintain",
         "--keep-snapshots", "1", "--vacuum-grace-ms", "0"]
    )
    assert rc == 0
    assert "folded 1 delete files (2 rows)" in capsys.readouterr().out
    snap = it.snapshot(t)
    assert not [e for e in snap["manifest"] if e.get("content") == "eq-deletes"]
    assert sum(e["rows"] for e in snap["manifest"]) == 1
    assert {r.url for r in it.read(spark, t).collect()} == {"u0"}


def test_job_cli_ice_input_applies_masks(spark, tmp_path, capsys):
    """--input-format ice: a one-shot extraction run reads the pages
    table's last committed snapshot WITH pending takedown masks applied —
    a masked url is never extracted."""
    from kraken_spark import job
    from kraken_spark.corpus import generate_corpus_df

    pages = str(tmp_path / "pages")
    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    it.append(docs, pages)
    victim = docs.select("url").limit(1).collect()[0].url
    it.delete_keys(spark, pages, [victim], key="url")
    rc = job.main(
        ["--input", pages, "--input-format", "ice",
         "--output", str(tmp_path / "out"), "--partitions", "2"]
    )
    assert rc == 0
    assert "committed 3 extraction rows" in capsys.readouterr().out
    out = spark.read.parquet(str(tmp_path / "out"))
    urls = {r.url for r in out.select("url").collect()}
    assert victim not in urls and len(urls) == 3


def test_expire_vacuum_reclaim_folded_delete_file(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    del_path = os.path.join(t, _delete_files(t)[0]["path"])
    assert os.path.exists(del_path)
    it.rewrite_deletes(spark, t)
    # while pre-fold snapshots are retained, the delete file is protected
    assert os.path.normpath(del_path) not in {
        os.path.normpath(p) for p in it.orphan_data_files(t)
    }
    # expiring the pre-fold history reclaims the delete file (only the
    # expired snapshots referenced it)
    it.expire_snapshots(t, keep_last=1)
    assert not os.path.exists(del_path)
    it.vacuum(t, grace_ms=0)
    assert {r.url for r in it.read(spark, t).collect()} == {"b"}
