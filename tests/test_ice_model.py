"""Model-based property test of the committed-snapshot layer: a random
sequence of table operations (append / compact / delete_where / rollback /
expire_snapshots / vacuum / merge_by_key / merge-on-read delete_keys /
positional scrub_where / rewrite_deletes) is replayed against a trivial
in-memory model of the
logical table state. After EVERY step the committed table must read back
exactly the model's rows, and the layer's structural invariants must hold
— this is the whole-protocol complement to the per-feature tests in
test_icetable.py / test_ice_maintenance.py / test_ice_mor.py. COW ops that
legitimately refuse while MOR masks pend are folded-then-retried, exactly
the operational flow `job.py --maintain` encodes.
"""

import os
import random

import pytest

from kraken_spark.sources import icetable as it


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="test-ice-model", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _read_rows(spark, t):
    return {(r.url, r.n) for r in it.read(spark, t).collect()}


def _read_rows_datasource(spark, t):
    from kraken_spark.sources.ice_datasource import register

    register(spark)
    return {
        (r.url, r.n) for r in spark.read.format("ice").load(t).collect()
    }


def _invariants(spark, t, model_rows):
    # 1. committed read == model — through BOTH faces (the JVM scan and
    # the Python DataSource must agree with the model after every op,
    # masks and evolution included)
    assert _read_rows(spark, t) == model_rows
    assert _read_rows_datasource(spark, t) == model_rows
    # 2. every head-manifest file exists on disk with consistent row counts
    # (with merge-on-read deletes pending, physical rows may exceed the
    # logical state by the masked rows; without, they must match exactly)
    snap = it.snapshot(t)
    n_rows = 0
    pending_deletes = False
    for e in snap["manifest"]:
        full = os.path.join(t, e["path"])
        assert os.path.exists(full), e["path"]
        n_rows += e["rows"]
        pending_deletes |= e.get("content") in ("eq-deletes", "pos-deletes")
    if pending_deletes:
        assert n_rows >= len(model_rows)
    else:
        assert n_rows == len(model_rows)
    # 3. orphans never overlap referenced files
    assert not set(it.orphan_data_files(t)) & {
        os.path.normpath(os.path.join(t, e["path"])) for e in snap["manifest"]
    }
    # 4. history is readable and ends at the head
    h = it.history(t)
    assert h and h[-1]["snapshot_id"] == it.current_snapshot_id(t)


@pytest.mark.parametrize("seed", [11, 23, 47, 81, 95])
def test_random_operation_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl{seed}")
    model: set[tuple] = set()
    snapshots: dict[int, set[tuple]] = {}  # retained snapshot -> state
    next_key = 0

    def do_append():
        nonlocal next_key
        k = rng.randint(1, 3)
        rows = [(f"u{next_key + i}", next_key + i) for i in range(k)]
        next_key += k
        it.append(spark.createDataFrame(rows, "url string, n int"), t)
        model.update(rows)

    do_append()  # genesis
    snapshots[it.current_snapshot_id(t)] = set(model)

    for _ in range(18):
        op = rng.choice(
            ["append", "append", "compact", "delete", "rollback",
             "expire", "vacuum", "merge", "mor_delete", "scrub", "fold"]
        )
        if op == "append":
            do_append()
        elif op == "merge" and model:
            nonlocal_rows = sorted(model)
            upd = [
                (u, n + 1000) for u, n in rng.sample(
                    nonlocal_rows, min(2, len(nonlocal_rows))
                )
            ]
            ins = [(f"m{next_key}", next_key)]
            next_key += 1
            delta = spark.createDataFrame(upd + ins, "url string, n int")
            try:
                it.merge_by_key(spark, t, delta, key="url")
            except ValueError:  # MOR masks pending: fold, retry (--maintain flow)
                it.rewrite_deletes(spark, t)
                it.merge_by_key(spark, t, delta, key="url")
            upd_keys = {u for u, _ in upd}
            model.difference_update({r for r in model if r[0] in upd_keys})
            model.update(upd + ins)
        elif op == "compact":
            it.compact(spark, t, target_bytes=1 << 30)
        elif op == "delete" and model:
            victim = rng.choice(sorted(model))

            def _cow_delete():
                return it.delete_where(
                    spark, t, f"url = '{victim[0]}'",
                    prune={"url": (victim[0], victim[0])},
                )

            try:
                s = _cow_delete()
            except ValueError:  # MOR masks pending: fold, retry
                it.rewrite_deletes(spark, t)
                s = _cow_delete()
            assert s is not None and s["deleted_rows"] == 1
            model.discard(victim)
        elif op == "mor_delete" and model:
            def _take(keys):
                try:
                    return it.delete_keys(spark, t, keys, key="url")
                except ValueError:  # pos masks pending: fold, retry
                    it.rewrite_deletes(spark, t)
                    return it.delete_keys(spark, t, keys, key="url")

            # O(metadata) takedown of a live key — and sometimes a ghost
            # key (a no-match takedown still commits a valid snapshot)
            if rng.random() < 0.25:
                _take([f"ghost{next_key}"])
            else:
                victim = rng.choice(sorted(model))
                _take([victim[0]])
                model.discard(victim)
        elif op == "scrub" and model:
            def _scrub(cond):
                try:
                    return it.scrub_where(spark, t, cond)
                except ValueError:  # eq masks pending: fold, retry
                    it.rewrite_deletes(spark, t)
                    return it.scrub_where(spark, t, cond)

            if rng.random() < 0.25:  # no-match scrub is a commit-free no-op
                assert _scrub(f"url = 'ghostscrub{next_key}'") is None
            else:
                victim = rng.choice(sorted(model))
                s = _scrub(f"url = '{victim[0]}'")
                assert s is not None and s["n_pos_deletes"] == 1
                model.discard(victim)
        elif op == "fold":
            it.rewrite_deletes(spark, t)
        elif op == "rollback" and snapshots:
            sid = rng.choice(sorted(snapshots))
            it.rollback(t, sid)
            model.clear()
            model.update(snapshots[sid])
        elif op == "expire":
            keep = rng.randint(2, 5)
            r = it.expire_snapshots(t, keep_last=keep)
            for sid in r["expired_snapshots"]:
                snapshots.pop(sid, None)
        elif op == "vacuum":
            it.vacuum(t, grace_ms=0)
        snapshots[it.current_snapshot_id(t)] = set(model)
        # drop states whose snapshot can no longer be rolled back to
        snapshots = {
            sid: st
            for sid, st in snapshots.items()
            if os.path.exists(it._snap_path(t, sid))
        }
        _invariants(spark, t, model)

    # closing sweep: full maintenance, then the table still equals the model
    it.compact(spark, t, target_bytes=1 << 30)
    it.expire_snapshots(t, keep_last=1)
    it.vacuum(t, grace_ms=0)
    _invariants(spark, t, model)
