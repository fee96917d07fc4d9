"""Two-level metadata on ice tables (sources/icetable manifest lists —
Iceberg's manifest-list layout): a commit writes O(delta) metadata (one
immutable segment + a snapshot of refs) instead of re-serializing every
file entry; unchanged segments are shared across snapshots; rewrites touch
only the segments they change; expiry/vacuum reclaim unreachable segments.
At 10^6 files per 10^12 rows this is the difference between a ~100 MB and
a ~1 KB snapshot write per corpus tick.
"""

import json
import os

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-manlist", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, n int")


def _raw(t, sid):
    return json.load(open(os.path.join(t, "metadata", f"snap-{sid:011d}.json")))


def _refs(t, sid):
    return [r["path"] for r in _raw(t, sid)["manifest_list"]]


def test_appends_write_o_delta_metadata_and_share_segments(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(5):
        it.append(_df(spark, [(f"u{i}", i)]), t)
    # snapshot k's refs are a strict prefix-preserving superset: every
    # prior segment is reused BY REFERENCE, one new segment per append
    for sid in range(1, 6):
        refs = _refs(t, sid)
        assert len(refs) == sid
        if sid > 1:
            assert refs[:-1] == _refs(t, sid - 1)
        assert "manifest" not in _raw(t, sid)
    # the commit payload grows with ref count, not entry count: the head
    # snapshot json carries zero per-file entries
    head = _raw(t, 5)
    assert all("rows" not in k for k in head)  # only refs, no entries
    assert {r.url for r in it.read(spark, t).collect()} == {
        f"u{i}" for i in range(5)
    }


def test_rollback_and_time_travel_are_ref_copies(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]), t)
    it.append(_df(spark, [("b", 2)]), t)
    it.rollback(t, 1)
    assert _refs(t, 3) == _refs(t, 1)  # shared segment, no metadata copy
    assert {r.url for r in it.read(spark, t).collect()} == {"a"}
    assert {r.url for r in it.read(spark, t, snapshot_id=2).collect()} == {
        "a",
        "b",
    }


def test_rewrites_touch_only_affected_segments(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a1", 1), ("a2", 2)]).coalesce(1), t)
    it.append(_df(spark, [("z1", 10), ("z2", 20)]).coalesce(1), t)
    seg_a, seg_z = _refs(t, 2)
    s = it.delete_where(spark, t, "url = 'z1'", prune={"url": ("z1", "z1")})
    assert s["deleted_rows"] == 1
    refs3 = _refs(t, 3)
    assert seg_a in refs3  # untouched segment reused by reference
    assert seg_z not in refs3  # affected segment replaced
    got = {r.url for r in it.read(spark, t).collect()}
    assert got == {"a1", "a2", "z2"}
    # merge: same property
    s = it.merge_by_key(spark, t, _df(spark, [("z2", 99)]), key="url")
    assert s["replaced_rows"] == 1
    assert seg_a in _refs(t, 4)


def test_legacy_inline_manifest_snapshots_still_work(spark, tmp_path):
    """Pre-manifest-list snapshot jsons (inline "manifest") read and
    append-chain transparently — an in-place format upgrade, no table
    migration required."""
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("old", 1)]), t)
    # rewrite snapshot 1 on disk in the LEGACY inline format
    snap = it.snapshot(t, 1)
    legacy = {k: v for k, v in snap.items() if k not in ("manifest_list", "_segments")}
    legacy["manifest"] = snap["manifest"]
    p = os.path.join(t, "metadata", "snap-00000000001.json")
    os.remove(p)
    json.dump(legacy, open(p, "w"))
    it._SEGMENT_CACHE.clear()
    assert {r.url for r in it.read(spark, t).collect()} == {"old"}
    it.append(_df(spark, [("new", 2)]), t)  # evolves to two-level
    assert "manifest_list" in _raw(t, 2)
    assert {r.url for r in it.read(spark, t).collect()} == {"old", "new"}


def test_expiry_and_vacuum_reclaim_unreachable_segments(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_df(spark, [("a", 1)]).coalesce(1), t)
    it.append(_df(spark, [("b", 2)]).coalesce(1), t)
    it.compact(spark, t, target_bytes=1 << 30)  # head no longer uses old segs
    r = it.expire_snapshots(t, keep_last=1)
    assert r["expired_snapshots"] == [1, 2]
    assert r["deleted_manifests"] >= 1  # pre-compaction segments reclaimed
    # every surviving man- file is referenced by the head
    live = {
        os.path.normpath(os.path.join(t, ref["path"]))
        for ref in _raw(t, 3)["manifest_list"]
    }
    on_disk = {
        os.path.normpath(os.path.join(t, "metadata", fn))
        for fn in os.listdir(os.path.join(t, "metadata"))
        if fn.startswith("man-")
    }
    assert on_disk == live
    assert {r2.url for r2 in it.read(spark, t).collect()} == {"a", "b"}
    # vacuum ages out a stray unreferenced segment
    stray = os.path.join(t, "metadata", "man-deadbeef.json")
    json.dump([], open(stray, "w"))
    os.utime(stray, (1, 1))
    v = it.vacuum(t, grace_ms=0)
    assert v["deleted_manifests"] >= 1 and not os.path.exists(stray)
