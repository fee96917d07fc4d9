"""Tag refs (sources/icetable.py create_tag/read_tag/drop_tag): immutable
named snapshot pointers — the corpus-release reproducibility primitive.
Pins: exact-state reads, immutability, expire retention of tagged history,
and reclamation after drop.
"""

import os

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-tags", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def test_tag_pins_exact_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    sid = it.create_tag(t, "corpus-v1")
    assert sid == 1 and it.list_tags(t) == {"corpus-v1": 1}
    it.append(_df(spark, [("b", 2)]), t)
    it.delete_keys(spark, t, ["a"], key="url")
    # head moved and later masked 'a'; the tag still reads the v1 state
    assert {r.url for r in it.read_tag(spark, t, "corpus-v1").collect()} == {"a"}
    assert {r.url for r in it.read(spark, t).collect()} == {"b"}


def test_tag_is_immutable_and_explicit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_tag(t, "v1")
    with pytest.raises(ValueError, match="already exists"):
        it.create_tag(t, "v1")
    with pytest.raises(it.NoSuchSnapshot):
        it.create_tag(t, "v2", at_snapshot_id=99)
    with pytest.raises(it.NoSuchSnapshot):
        it.read_tag(spark, t, "nope")
    with pytest.raises(it.NoSuchSnapshot):
        it.drop_tag(t, "nope")


def test_refs_metadata_view(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_tag(t, "corpus-v1")
    it.create_branch(t, "wap")
    it.branch_append(_df(spark, [("b", 2)]), t, "wap")
    refs = {r.name: r for r in it.metadata_table(spark, t, "refs").collect()}
    assert refs["corpus-v1"].type == "tag" and refs["corpus-v1"].snapshot_id == 1
    assert refs["wap"].type == "branch" and refs["wap"].branch_seq == 2
    assert refs["wap"].snapshot_id == 1  # base


def test_expire_retains_tagged_snapshot_until_drop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.create_tag(t, "release")
    for i in range(3):
        it.overwrite(_df(spark, [(f"x{i}", i)]), t)
    # overwrite: snapshot 1's file is referenced ONLY by snapshot 1
    e = it.expire_snapshots(t, keep_last=1)
    assert 1 not in e["expired_snapshots"], "tagged snapshot expired"
    assert {r.url for r in it.read_tag(spark, t, "release").collect()} == {"a"}
    it.vacuum(t, grace_ms=0)  # tagged snapshot's files survive vacuum too
    assert {r.url for r in it.read_tag(spark, t, "release").collect()} == {"a"}
    # dropping the tag releases the history for normal retention
    it.drop_tag(t, "release")
    e = it.expire_snapshots(t, keep_last=1)
    assert 1 in e["expired_snapshots"]
    assert it.list_tags(t) == {}
    with pytest.raises(it.NoSuchSnapshot):
        it.read(spark, t, snapshot_id=1)
