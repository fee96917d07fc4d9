"""Committed-snapshot table format — the Iceberg-semantics layer the north
rule's checkpoint story runs on ("resumable from the last committed
snapshot checkpoint").

This is a from-scratch minimal implementation of the *semantics* Apache
Iceberg gives a Spark pipeline (public design: the Iceberg spec's
snapshot/manifest/optimistic-commit model), not the Iceberg file spec: the
sandbox has no Iceberg runtime jars, and the pipeline only relies on four
properties, all delivered here and proven in tests/test_icetable.py:

1. **Atomic commits.** Data files are written first (distributed, by
   executors, via a normal ``df.write.parquet`` into a unique subdirectory)
   and are INVISIBLE until a snapshot manifest listing them is committed.
   A reader concurrent with a crashed or in-flight writer sees exactly the
   previous snapshot.
2. **Optimistic concurrency.** A commit creates ``metadata/snap-N.json``
   with a hard-link CAS — two writers racing for the same N: one wins,
   the other gets ``CommitConflict`` and retries against the new head
   (data files are already safe, only the cheap metadata step re-runs).
   This is the Iceberg commit protocol in miniature.
3. **Time travel.** Every snapshot is immutable and keeps its full file
   list; ``read(..., snapshot_id=k)`` reconstructs any historical state,
   ``rollback`` makes an old state current by committing a NEW snapshot
   that points at the old file list (history is never rewritten).
4. **Lineage.** Each snapshot carries an operation, a parent pointer, a
   summary (run_id, row/file counts) and optional per-partition lineage
   rows — the metrics contract of SURVEY.md §7.4 at the table layer.

Scale shape: the data path is 100% distributed (executors write parquet
part files; nothing rows-shaped ever moves through the driver). The commit
is a driver-side metadata operation — one directory listing of the new
files plus one JSON write — which is exactly how Iceberg commits work on a
1000-executor cluster. Snapshot JSONs grow with file count, not row count;
at 10^12 rows / ~10^6 files a manifest is ~100 MB of JSON, which is the
point where real Iceberg splits manifests into a manifest *list* — noted
in ``append``'s docstring as the production extension.

On a real cluster the same jobs run against actual Iceberg (see job.py
header); this module is the sandbox's working stand-in with the same
commit semantics, not a toy: crash-atomicity, CAS conflicts, time travel
and resume-from-snapshot are all exercised end-to-end in the tests.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_META = "metadata"
_DATA = "data"
_HINT = "version-hint.text"


class CommitConflict(Exception):
    """Another writer committed the snapshot id this commit targeted."""


class NoSuchSnapshot(Exception):
    pass


class PreconditionFailed(Exception):
    """An append's validation rejected the commit against the current head
    (Iceberg's conflict-validation analog): nothing was committed; the
    already-written data files remain invisible orphans."""


def _meta_dir(path: str) -> str:
    return os.path.join(path, _META)


def _snap_path(path: str, sid: int) -> str:
    return os.path.join(_meta_dir(path), f"snap-{sid:011d}.json")


def current_snapshot_id(path: str) -> int:
    """Head snapshot id (0 = empty/uncreated table). The version hint is a
    fast path; the directory scan is the source of truth so a crash between
    snapshot write and hint update still resolves to the committed head."""
    best = 0
    try:
        for name in os.listdir(_meta_dir(path)):
            if name.startswith("snap-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[5:-5]))
                except ValueError:
                    continue
    except FileNotFoundError:
        return 0
    return best


def snapshot(path: str, sid: int | None = None) -> dict[str, Any]:
    sid = sid if sid is not None else current_snapshot_id(path)
    try:
        with open(_snap_path(path, sid)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise NoSuchSnapshot(f"{path}: snapshot {sid}")


def history(path: str) -> list[dict[str, Any]]:
    """All committed snapshots, oldest first (summaries only, no file lists
    — the audit view)."""
    out = []
    for sid in range(1, current_snapshot_id(path) + 1):
        s = snapshot(path, sid)
        out.append(
            {
                "snapshot_id": s["snapshot_id"],
                "parent_id": s["parent_id"],
                "timestamp_ms": s["timestamp_ms"],
                "operation": s["operation"],
                "n_files": len(s["manifest"]),
                "n_rows": sum(e["rows"] for e in s["manifest"]),
                "summary": s.get("summary", {}),
            }
        )
    return out


def _commit(path: str, snap: dict[str, Any]) -> int:
    """Atomically create snap-N.json (CAS on N via O_EXCL), then move the
    version hint forward. The hint write is a same-filesystem rename, so
    readers never observe a torn pointer."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    sid = snap["snapshot_id"]
    target = _snap_path(path, sid)
    tmp = f"{target}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(snap, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        # hard-link CAS: fails iff snap-N.json exists, and the target
        # appears fully written in one atomic step (no empty-file window a
        # concurrent reader could observe)
        os.link(tmp, target)
    except FileExistsError:
        os.unlink(tmp)
        raise CommitConflict(f"{path}: snapshot {sid} already committed")
    os.unlink(tmp)
    hint_tmp = os.path.join(_meta_dir(path), f".{_HINT}.{uuid.uuid4().hex}")
    with open(hint_tmp, "w") as f:
        f.write(str(sid))
    os.replace(hint_tmp, os.path.join(_meta_dir(path), _HINT))
    return sid


def _list_new_files(table_path: str, data_dir: str) -> list[dict[str, Any]]:
    """Manifest entries for a freshly written parquet directory: one row
    per part file with row count + byte size (footer-only reads — the
    driver never touches row data). Paths are table-relative so a table
    directory is relocatable as a unit."""
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(data_dir, name)
        meta = pq.read_metadata(full)
        entries.append(
            {
                "path": os.path.relpath(full, start=table_path),
                "rows": meta.num_rows,
                "bytes": os.path.getsize(full),
            }
        )
    return entries


def append(
    df: DataFrame,
    path: str,
    operation: str = "append",
    summary: dict[str, Any] | None = None,
    lineage: list[dict[str, Any]] | None = None,
    retries: int = 3,
    precondition=None,
) -> int:
    """Write ``df``'s rows as new data files and commit them as a new
    snapshot; returns the committed snapshot id.

    operation='append' unions the new files with the parent manifest;
    operation='overwrite' makes the new files the whole table. Data files
    are written exactly once — a CAS conflict retries only the metadata
    step against the new head (Iceberg's optimistic retry). At production
    file counts the flat ``manifest`` list becomes a manifest-list tree
    (Iceberg's two-level layout); the commit protocol is unchanged.

    ``precondition``: optional ``(path, parent_sid) -> bool`` validated
    against the head IMMEDIATELY before each commit attempt and
    re-validated on every CAS retry — since the hard-link CAS succeeds
    only if NO snapshot intervened after the check, a commit that lands
    is guaranteed to satisfy the precondition against its true parent
    (Iceberg's validate-on-conflict). On failure raises
    PreconditionFailed; nothing is committed, the written data files stay
    invisible orphans (same crash semantics as a dead writer).
    """
    commit_uuid = uuid.uuid4().hex
    data_dir = os.path.join(path, _DATA, commit_uuid)
    df.write.parquet(data_dir, mode="errorifexists")
    new_files = _list_new_files(path, data_dir)
    last: Exception | None = None
    for _ in range(max(retries, 1)):
        parent = current_snapshot_id(path)
        if precondition is not None and not precondition(path, parent):
            raise PreconditionFailed(f"{path}: append precondition failed at head {parent}")
        base = snapshot(path, parent)["manifest"] if (parent and operation == "append") else []
        snap = {
            "snapshot_id": parent + 1,
            "parent_id": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "schema_json": df.schema.json(),
            "manifest": base + new_files,
            "summary": dict(summary or {}, n_new_files=len(new_files),
                            n_new_rows=sum(e["rows"] for e in new_files)),
        }
        if lineage is not None:
            snap["lineage"] = lineage
        try:
            return _commit(path, snap)
        except CommitConflict as e:  # head moved: rebuild metadata, retry
            last = e
    raise last  # type: ignore[misc]


def overwrite(df: DataFrame, path: str, **kw: Any) -> int:
    return append(df, path, operation="overwrite", **kw)


def rollback(path: str, to_snapshot_id: int) -> int:
    """Commit a NEW snapshot whose file list equals an old snapshot's —
    the table's current state moves back without rewriting history."""
    old = snapshot(path, to_snapshot_id)
    for _ in range(3):
        parent = current_snapshot_id(path)
        snap = {
            "snapshot_id": parent + 1,
            "parent_id": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": "rollback",
            "schema_json": old.get("schema_json", ""),
            "manifest": old["manifest"],
            "summary": {"rolled_back_to": to_snapshot_id},
        }
        try:
            return _commit(path, snap)
        except CommitConflict:
            continue
    raise CommitConflict(f"{path}: rollback lost 3 races")


def read(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    asof_ms: int | None = None,
) -> DataFrame:
    """Committed-state read: exactly the files in the chosen snapshot's
    manifest — uncommitted/orphaned data files are invisible by
    construction. ``snapshot_id`` / ``asof_ms`` select historical states
    (time travel)."""
    if asof_ms is not None:
        sid = 0
        for h in history(path):
            if h["timestamp_ms"] <= asof_ms:
                sid = h["snapshot_id"]
        if sid == 0:
            raise NoSuchSnapshot(f"{path}: no snapshot at or before {asof_ms}")
        snapshot_id = sid
    snap = snapshot(path, snapshot_id)
    files = [os.path.join(path, e["path"]) for e in snap["manifest"]]
    if not files:
        from pyspark.sql.types import StructType

        schema = (
            StructType.fromJson(json.loads(snap["schema_json"]))
            if snap.get("schema_json")
            else "url string"
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


def read_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental append scan (Iceberg's ``incremental read``): exactly
    the rows committed AFTER ``from_snapshot_id`` up to and including
    ``to_snapshot_id`` (default: current head).

    This is how a recurring crawl-processing job tails the pages table:
    each run records the snapshot it processed through, and the next run
    reads only the delta — at 10^12 rows the difference between re-scanning
    the corpus and scanning one crawl's worth of new files. The delta is
    computed driver-side as a manifest set-difference (metadata only, no
    data I/O), then read as a plain distributed parquet scan of just the
    new files.

    Like Iceberg, the incremental scan is only defined over append-only
    history: if any snapshot in the range replaced or removed files
    (overwrite/rollback), added-files-since is not "rows added since" and
    the scan raises ValueError rather than return a wrong delta.
    """
    head = current_snapshot_id(path)
    to_sid = head if to_snapshot_id is None else to_snapshot_id
    if from_snapshot_id > to_sid:
        raise NoSuchSnapshot(
            f"{path}: from {from_snapshot_id} is after to {to_sid}"
        )
    for sid in range(from_snapshot_id + 1, to_sid + 1):
        op = snapshot(path, sid)["operation"]
        if op != "append":
            raise ValueError(
                f"{path}: snapshot {sid} is '{op}' — incremental scan is "
                "only defined over append-only history"
            )
    base = (
        set()
        if from_snapshot_id == 0  # genesis: everything is new
        else {e["path"] for e in snapshot(path, from_snapshot_id)["manifest"]}
    )
    to_snap = snapshot(path, to_sid)
    files = [
        os.path.join(path, e["path"])
        for e in to_snap["manifest"]
        if e["path"] not in base
    ]
    if not files:
        from pyspark.sql.types import StructType

        schema = (
            StructType.fromJson(json.loads(to_snap["schema_json"]))
            if to_snap.get("schema_json")
            else "url string"
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files)


def orphan_data_files(path: str) -> list[str]:
    """Data files no snapshot references (crashed writers, aborted
    commits) — the vacuum candidate list. Safe to delete once no reader
    can still hold the head they were staged under."""
    referenced: set[str] = set()
    for sid in range(1, current_snapshot_id(path) + 1):
        for e in snapshot(path, sid)["manifest"]:
            referenced.add(os.path.normpath(os.path.join(path, e["path"])))
    orphans = []
    data_root = os.path.join(path, _DATA)
    for root, _dirs, names in os.walk(data_root):
        for n in names:
            full = os.path.normpath(os.path.join(root, n))
            if n.endswith(".parquet") and full not in referenced:
                orphans.append(full)
    return sorted(orphans)
