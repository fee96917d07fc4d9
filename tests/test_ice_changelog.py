"""Changelog scan (sources/icetable.py read_changelog): row-level CDC over
any snapshot range — inserts/deletes through appends, COW deletes, MOR
delete_keys, merges; silence through physical-only rewrites (compaction,
rewrite_deletes). The consumer contract: applying the changelog to the
from-state reproduces the to-state.
"""

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-changelog", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def _changes(spark, t, frm, to=None):
    rows = it.read_changelog(spark, t, frm, to).collect()
    return sorted((r._change_type, r.url, r.n, r._commit_snapshot_id) for r in rows)


def test_appends_are_inserts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.append(_df(spark, [("b", 2)]), t)
    assert _changes(spark, t, 0) == [
        ("insert", "a", 1, 1),
        ("insert", "b", 2, 2),
    ]
    assert _changes(spark, t, 1) == [("insert", "b", 2, 2)]


def test_mor_delete_emits_masked_rows_once(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]), t)
    it.delete_keys(spark, t, ["b", "ghost"], key="url")  # ghost matches nothing
    assert _changes(spark, t, 1) == [("delete", "b", 2, 2)]
    # stacking the same key again: already masked, nothing re-reported
    it.delete_keys(spark, t, ["b"], key="url")
    assert _changes(spark, t, 2) == []
    # folding the masks is physical, not logical: silent
    it.rewrite_deletes(spark, t)
    assert _changes(spark, t, 3) == []


def test_cow_delete_and_merge_changes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    it.delete_where(spark, t, "url = 'b'")
    assert _changes(spark, t, 1, 2) == [("delete", "b", 2, 2)]
    # merge: old version out as delete, new in as insert; pure inserts too
    it.merge_by_key(spark, t, _df(spark, [("a", 10), ("d", 4)]), key="url")
    assert _changes(spark, t, 2, 3) == [
        ("delete", "a", 1, 3),
        ("insert", "a", 10, 3),
        ("insert", "d", 4, 3),
    ]


def test_compaction_is_silent_and_replay_reproduces_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1), t)
    it.append(_df(spark, [("c", 3)]).coalesce(1), t)
    it.compact(spark, t, target_bytes=1 << 30)
    assert it.snapshot(t)["operation"] == "replace"
    assert _changes(spark, t, 2) == []
    it.delete_keys(spark, t, ["a"], key="url")
    # replay the full changelog from genesis: inserts minus deletes == head
    rows = it.read_changelog(spark, t, 0).collect()
    state: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: r._commit_snapshot_id):
        if r._change_type == "insert":
            state[r.url] = r.n
        else:
            state.pop(r.url, None)
    head = {r.url: r.n for r in it.read(spark, t).collect()}
    assert state == head == {"b": 2, "c": 3}


def test_empty_range_and_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    df = it.read_changelog(spark, t, 1)
    assert df.count() == 0
    assert {"url", "n", "_change_type", "_commit_snapshot_id"} <= set(df.columns)


def test_changelog_reports_deletes_after_a_fold(spark, tmp_path):
    """Regression: operation-describing summary keys must not inherit —
    with 'folded_delete_files' leaking forward, every delete committed
    AFTER the first rewrite_deletes was silently skipped by the
    changelog, and positional deletes were misrouted to the equality
    branch via an inherited 'delete_key'."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [(f"u{i}", i) for i in range(10)]), t)
    it.delete_keys(spark, t, ["u1"], key="url")     # snap 2 (eq MOR)
    it.rewrite_deletes(spark, t)                    # snap 3 (fold: silent)
    it.delete_keys(spark, t, ["u2"], key="url")     # snap 4 (eq after fold)
    it.rewrite_deletes(spark, t)                    # snap 5
    it.scrub_where(spark, t, "n = 3")               # snap 6 (pos after fold)
    log = it.read_changelog(spark, t, 1).collect()
    dels = sorted((r.url, r._commit_snapshot_id) for r in log if r._change_type == "delete")
    assert dels == [("u1", 2), ("u2", 4), ("u3", 6)]
    assert not [r for r in log if r._change_type == "insert"]
