"""Branch refs + write-audit-publish on ice tables (sources/icetable:
create_branch / branch_append / read_branch / publish_branch /
drop_branch) — Iceberg's branching/WAP pattern: a corpus tick stages its
output invisibly, audits run against the branch head, and only an
explicit publish fast-forwards main. A failed audit drops the branch and
main never saw a row.
"""

import os
import time

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-branch", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def test_wap_stage_audit_publish(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("base1", 1), ("base2", 2)]), t)
    it.create_branch(t, "audit")
    it.branch_append(_df(spark, [("tick1", 10)]), t, "audit",
                     summary={"run_id": "tick-37"})
    it.branch_append(_df(spark, [("tick2", 20)]), t, "audit")
    # the audit view: base + staged rows
    staged = {r.url for r in it.read_branch(spark, t, "audit").collect()}
    assert staged == {"base1", "base2", "tick1", "tick2"}
    # main is oblivious: reads, history, metadata all unchanged
    assert {r.url for r in it.read(spark, t).collect()} == {"base1", "base2"}
    assert it.current_snapshot_id(t) == 1
    assert [h["operation"] for h in it.history(t)] == ["append"]
    # publish: fast-forward main; the commit is an honest append
    s = it.publish_branch(t, "audit")
    assert s["n_new_rows"] == 2 and s["published_branch"] == "audit"
    snap = it.snapshot(t)
    assert snap["operation"] == "append"
    assert {r.url for r in it.read(spark, t).collect()} == staged
    # a tailing incremental consumer sees the published rows as one delta
    delta = {r.url for r in it.read_incremental(spark, t, 1).collect()}
    assert delta == {"tick1", "tick2"}
    it.drop_branch(t, "audit")
    assert it.list_branches(t) == []


def test_failed_audit_drops_branch_without_a_trace(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("base", 1)]), t)
    it.create_branch(t, "audit")
    it.branch_append(_df(spark, [("bad", 666)]), t, "audit")
    # audit fails -> drop. Main state and history identical to pre-branch.
    it.drop_branch(t, "audit")
    assert {r.url for r in it.read(spark, t).collect()} == {"base"}
    assert it.current_snapshot_id(t) == 1
    # the staged files are now orphans; vacuum reclaims them after grace
    orphans = it.orphan_data_files(t)
    assert orphans  # the dropped tick's files
    v = it.vacuum(t, grace_ms=0)
    assert v["deleted_files"] == len(orphans)
    assert it.orphan_data_files(t) == []


def test_branch_files_survive_vacuum_and_expiry(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_branch(t, "wip")
    it.branch_append(_df(spark, [("staged", 2)]), t, "wip")
    # a LIVE branch's staged files are referenced, not orphans
    assert it.orphan_data_files(t) == []
    v = it.vacuum(t, grace_ms=0)
    assert v["deleted_files"] == 0
    # main churn + aggressive expiry must not reclaim staged branch files
    it.append(_df(spark, [("b", 2)]), t)
    it.append(_df(spark, [("c", 3)]), t)
    it.expire_snapshots(t, keep_last=1)
    staged = {r.url for r in it.read_branch(spark, t, "wip").collect()}
    assert staged == {"a", "staged"}


def test_publish_stale_base_refused_then_rebased(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_branch(t, "audit")
    it.branch_append(_df(spark, [("staged", 9)]), t, "audit")
    it.append(_df(spark, [("rival", 2)]), t)  # main moves under the branch
    with pytest.raises(it.PreconditionFailed):
        it.publish_branch(t, "audit")
    # cherry-pick-style rebase: branch-added files on top of current main
    s = it.publish_branch(t, "audit", rebase=True)
    assert s["n_new_rows"] == 1
    got = {r.url for r in it.read(spark, t).collect()}
    assert got == {"a", "rival", "staged"}


def test_branch_inherits_partition_spec_and_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("u1", "en", 1)], "url string, lang string, n int"
    )
    it.append(df, t, partition_by=["lang"])
    it.create_branch(t, "audit")
    delta = spark.createDataFrame(
        [("u2", "de", 2, 0.5)], "url string, lang string, n int, score double"
    )
    it.branch_append(delta, t, "audit")  # adds a column on the branch
    b = it.branch_snapshot(t, "audit")
    assert b["partition_spec"] == ["lang"]
    for e in b["manifest"]:
        assert e["partition"].startswith("p_lang="), e
    rows = {
        (r.url, r.lang, r.n, r.score)
        for r in it.read_branch(spark, t, "audit").collect()
    }
    assert rows == {("u1", "en", 1, None), ("u2", "de", 2, 0.5)}
    it.publish_branch(t, "audit")
    main = {
        (r.url, r.score) for r in it.read(spark, t).collect()
    }
    assert main == {("u1", None), ("u2", 0.5)}


def test_branch_bookkeeping_and_errors(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_branch(t, "b1")
    with pytest.raises(ValueError):
        it.create_branch(t, "b1")  # already exists
    with pytest.raises(ValueError):
        it.create_branch(t, "no/slash")
    with pytest.raises(it.NoSuchSnapshot):
        it.branch_append(_df(spark, [("x", 1)]), t, "nope")
    assert it.list_branches(t) == ["b1"]
    # branch on an EMPTY table: stage the very first data
    t2 = str(tmp_path / "tbl2")
    os.makedirs(t2, exist_ok=True)
    it.create_branch(t2, "genesis")
    it.branch_append(_df(spark, [("first", 1)]), t2, "genesis")
    it.publish_branch(t2, "genesis")
    assert [r.url for r in it.read(spark, t2).collect()] == ["first"]
