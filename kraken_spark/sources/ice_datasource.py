"""Native Spark DataFrame API face for ice tables: the PySpark Python
DataSource (SPARK-44076, ``pyspark.sql.datasource``) wrapping
``sources/icetable.py`` so the table layer composes with every built-in
Spark surface instead of a library-function one:

    spark.dataSource.register(IceDataSource)
    df  = spark.read.format("ice").load(table_path)          # batch scan
    df.write.format("ice").mode("append").save(table_path)   # CAS commit
    s   = spark.readStream.format("ice").load(table_path)    # tail appends
    s.writeStream.format("ice").option("checkpointLocation", ...) \
        .start(table_path)                                    # exactly-once

Scale shape (what each leg does at 10^12 rows):

- **Batch read** plans driver-side from the snapshot manifest (metadata
  only): one input partition per data file, manifest-stat file skipping
  driven by Spark's OWN filter pushdown channel (``pushFilters`` — an
  `url = '...'` predicate prunes to the one file covering that key range
  on a range-clustered table, before any executor launches). Pending
  merge-on-read equality deletes are applied per file with Iceberg's
  data-sequence rule — the same masking ``icetable.read`` does with a
  broadcast anti-join, here as a per-task key-set filter (delete files
  are tiny by construction). All pushed filters are handed back to Spark
  for row-level re-application: pruning is an optimization, never a
  correctness filter.
- **Batch write** is the Iceberg task/driver split: each executor task
  writes one staged (invisible) parquet file and ships its path back as
  a commit message; the driver turns footer stats into manifest entries
  and runs the same optimistic hard-link-CAS commit as ``append``
  (per-retry data-sequence re-stamping, union-by-name schema evolution,
  O(delta) manifest-list segments). A failed job leaves only invisible
  orphans for ``vacuum``.
- **Stream read** is Iceberg's incremental append scan as a Structured
  Streaming source: offsets are snapshot ids, each micro-batch is
  exactly the files added by the append snapshots in ``(start, end]``,
  'replace' (compaction) snapshots are skipped so maintenance never
  breaks a tailing stream, and membership-changing operations in the
  range fail loudly rather than return a wrong delta.
- **Stream write** commits each micro-batch as ONE atomic snapshot whose
  summary carries the batch id; a retried batch finds its id already in
  history and commits nothing (exactly-once without any sink-side state
  beyond the table's own metadata).

The batch-read fast path remains ``icetable.read`` (Spark's JVM parquet
scan — vectorized, codegen); this face trades that for API composition
(arbitrary snapshot/tag/branch via options, pushdown-driven pruning) and
is the only way to get the *streaming* legs. Reference analog: kraken has
no table layer; this mirrors Apache Iceberg's Spark integration surface
(public semantics), reimplemented from scratch over the repo's own
commit protocol.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


@dataclass(frozen=True)
class IceFilePartition(InputPartition):
    """One data file + the equality-delete files that mask its rows
    (empty for files newer than every delete, per the sequence rule) +
    the positional-delete files that name it (masking by row ordinal)."""

    file: str
    delete_files: tuple = ()
    delete_key: str = ""
    pos_delete_files: tuple = ()
    rel: str = ""


@dataclass(frozen=True)
class IceScanPartition(InputPartition):
    """A BUNDLE of file-scans planned into one task (Iceberg's split
    planning): one partition per data file means one task per file — at
    10^6 files that is 10^6 task launches for a full scan. Files sharing
    a delete-mask group are bin-packed up to ``split_bytes`` instead."""

    files: tuple  # of IceFilePartition


@dataclass
class IceCommitMessage(WriterCommitMessage):
    """Table-relative paths of the parquet files one task staged."""

    files: list = field(default_factory=list)


def _resolve_snapshot(options: dict) -> tuple[str, dict[str, Any]]:
    """(table_path, snapshot dict) from reader options: ``path`` plus at
    most one of ``snapshot_id`` / ``asof_ms`` / ``tag`` / ``branch``."""
    from kraken_spark.sources import icetable as it

    path = options.get("path")
    if not path:
        raise ValueError("ice: .load(<table path>) or option('path', ...) required")
    if options.get("branch"):
        return path, it.branch_snapshot(path, options["branch"])
    sid: int | None = None
    if options.get("tag"):
        sid = it.tag_snapshot_id(path, options["tag"])
    elif options.get("snapshot_id"):
        sid = int(options["snapshot_id"])
    elif options.get("asof_ms"):
        asof = int(options["asof_ms"])
        for h in it.history(path):
            if h["timestamp_ms"] <= asof:
                sid = h["snapshot_id"]
        if sid is None:
            raise it.NoSuchSnapshot(f"{path}: no snapshot at or before {asof}")
    else:
        head = it.current_snapshot_id(path)
        if not head:
            raise ValueError(f"ice: {path} has no committed snapshot")
        sid = head
    return path, it.snapshot(path, sid)


def _schema_of(snap: dict[str, Any]) -> StructType:
    import json

    if not snap.get("schema_json"):
        raise ValueError("ice: snapshot has no schema (pre-evolution table?)")
    return StructType.fromJson(json.loads(snap["schema_json"]))


def _project_and_mask(
    table: "pa.Table",
    schema: StructType,
    delete_files: tuple,
    delete_key: str,
    pos_delete_files: tuple = (),
    rel: str = "",
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: project a scanned file to the SNAPSHOT schema
    (evolution: missing columns read as null, extra columns dropped —
    the ``_read_files`` contract) and apply the file's positional and
    equality delete masks, then yield Arrow batches in Spark's expected
    layout. Positional masks go FIRST: their addresses are raw-file row
    ordinals."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = pc.cast(col, f.type)
        else:
            col = pa.nulls(table.num_rows, f.type)
        cols.append(col)
    out = pa.Table.from_arrays(cols, schema=target)
    if pos_delete_files:
        masked: set[int] = set()
        for p in pos_delete_files:
            t = pq.read_table(p, columns=["file_path", "pos"])
            fps = t.column("file_path").to_pylist()
            poss = t.column("pos").to_pylist()
            masked.update(po for fp, po in zip(fps, poss) if fp == rel)
        if masked:
            keep = ~np.isin(np.arange(out.num_rows), np.fromiter(masked, dtype=np.int64))
            out = out.filter(pa.array(keep))
    if delete_files:
        keys = pa.concat_tables(
            pq.read_table(p, columns=[delete_key]) for p in delete_files
        ).column(delete_key)
        key_col = out.column(delete_key)
        if keys.type != key_col.type:
            keys = pc.cast(keys, key_col.type)
        out = out.filter(
            pc.invert(pc.is_in(key_col, value_set=keys.combine_chunks()))
        )
    yield from out.combine_chunks().to_batches()


def _read_data_file(
    part: IceFilePartition, schema: StructType
) -> Iterator["pa.RecordBatch"]:
    import pyarrow.parquet as pq

    names = {f.name for f in schema.fields}
    pf = pq.ParquetFile(part.file)
    want = [c for c in pf.schema_arrow.names if c in names]
    yield from _project_and_mask(
        pf.read(columns=want),
        schema,
        part.delete_files,
        part.delete_key,
        part.pos_delete_files,
        part.rel,
    )


def _filters_to_ranges(filters: list) -> dict[str, tuple]:
    """Fold pushed-down Spark filters into per-column (lo, hi) manifest
    ranges (None = unbounded). Strict vs non-strict inequality does not
    matter for file PRUNING — bounds are kept conservative."""
    ranges: dict[str, list] = {}

    def _narrow(col: str, lo: Any, hi: Any) -> None:
        cur = ranges.setdefault(col, [None, None])
        try:
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi
        except TypeError:  # mixed-type bounds: give up on this column
            ranges[col] = [None, None]

    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:  # nested columns: not prunable
            continue
        col = attr[0]
        if isinstance(f, EqualTo):
            _narrow(col, f.value, f.value)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            _narrow(col, f.value, None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            _narrow(col, None, f.value)
        elif isinstance(f, In) and f.value:
            try:
                _narrow(col, min(f.value), max(f.value))
            except TypeError:
                continue
    return {
        c: (lo, hi) for c, (lo, hi) in ranges.items() if lo is not None or hi is not None
    }


class IceBatchReader(DataSourceReader):
    """Snapshot scan planned as bin-packed file bundles (one task per
    ~``split_bytes``, option, default 128 MiB — Iceberg's split
    planning; ``split_bytes=1`` forces one file per task).
    Manifest-stat pruning comes from
    (a) the always-available ``where`` option — a JSON dict of
    ``{"col": [lo, hi]}`` ranges (null = unbounded) — and/or (b) Spark's
    own filter pushdown via :class:`IcePushdownReader`, selected with
    ``.option("pushdown", "true")``. Pushdown is a separate class because
    merely DEFINING ``pushFilters`` makes Spark refuse the reader unless
    ``spark.sql.python.filterPushdown.enabled`` is set (it is in
    ``session.get_spark``; a vanilla session needs the base reader)."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self._options = dict(options)
        self._schema = schema
        self._ranges: dict[str, tuple] = {}
        if options.get("where"):
            import json

            self._ranges = {
                c: (lo, hi) for c, (lo, hi) in json.loads(options["where"]).items()
            }

    def partitions(self) -> Sequence[InputPartition]:
        from kraken_spark.sources import icetable as it

        path, snap = _resolve_snapshot(self._options)
        data, dels = it._split_entries(snap["manifest"])
        data = it._prune_entries(data, self._ranges or None)
        eq_dels, pos_dels = it._eq_pos(dels)
        key = eq_dels[0]["key"] if eq_dels else ""
        pos_by_file: dict = {}
        for d in pos_dels:
            for f in d.get("files", []):
                pos_by_file.setdefault(f, set()).add(d["path"])
        split_bytes = int(self._options.get("split_bytes", 128 << 20))
        # bin-pack per delete-mask group so a bundle shares one mask load
        groups: dict[tuple, list[tuple[dict, "IceFilePartition"]]] = {}
        for e in data:
            dpaths = tuple(
                os.path.join(path, p)
                for p in it._applicable_deletes(eq_dels, e)
            )
            ppaths = tuple(
                os.path.join(path, p)
                for p in sorted(pos_by_file.get(e["path"], ()))
            )
            fp = IceFilePartition(
                file=os.path.join(path, e["path"]),
                delete_files=dpaths,
                delete_key=key if dpaths else "",
                pos_delete_files=ppaths,
                rel=e["path"] if ppaths else "",
            )
            groups.setdefault((dpaths, ppaths), []).append((e, fp))
        parts: list[InputPartition] = []
        for _, members in sorted(groups.items()):
            bundle: list[IceFilePartition] = []
            size = 0
            for e, fp in members:
                if bundle and size + e.get("bytes", 0) > split_bytes:
                    parts.append(IceScanPartition(files=tuple(bundle)))
                    bundle, size = [], 0
                bundle.append(fp)
                size += e.get("bytes", 0)
            if bundle:
                parts.append(IceScanPartition(files=tuple(bundle)))
        return parts

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        assert isinstance(partition, IceScanPartition)
        for fp in partition.files:
            yield from _read_data_file(fp, self._schema)


class IcePushdownReader(IceBatchReader):
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        pushed = _filters_to_ranges(filters)
        for c, rng in pushed.items():  # intersect with any manual ranges
            cur = self._ranges.get(c)
            if cur is None:
                self._ranges[c] = rng
            else:
                lo = max((b for b in (cur[0], rng[0]) if b is not None), default=None)
                hi = min((b for b in (cur[1], rng[1]) if b is not None), default=None)
                self._ranges[c] = (lo, hi)
        # every filter is returned for row-level re-application: the
        # source only PRUNES FILES with them (conservative by design)
        return filters


class IceStreamReader(DataSourceStreamReader):
    """Snapshot-id offsets; each batch = the append snapshots' added
    files in ``(start, end]`` (replace skipped, other ops refused) —
    ``read_incremental`` as a Structured Streaming source."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self._options = dict(options)
        self._schema = schema
        self._path = options.get("path") or ""
        if not self._path:
            raise ValueError("ice: .load(<table path>) required")
        # a stream tails MAIN's append history; time-travel options would
        # make schema() and partitions() disagree about what is read
        for opt in ("branch", "tag", "snapshot_id", "asof_ms"):
            if options.get(opt):
                raise ValueError(
                    f"ice stream: option {opt!r} is batch-only — use "
                    "'starting'/'starting_snapshot_id' to position a stream"
                )

    def initialOffset(self) -> dict:
        from kraken_spark.sources import icetable as it

        opt = self._options
        if opt.get("starting_snapshot_id"):
            sid = int(opt["starting_snapshot_id"])
        elif opt.get("starting", "latest").lower() == "earliest":
            sid = 0
        else:  # 'latest': only appends after stream start
            sid = it.current_snapshot_id(self._path)
        return {"snapshot_id": sid}

    def latestOffset(self) -> dict:
        from kraken_spark.sources import icetable as it

        return {"snapshot_id": it.current_snapshot_id(self._path)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from kraken_spark.sources import icetable as it

        skip_deletes = str(
            self._options.get("skip_delete_snapshots", "")
        ).lower() in ("true", "1")
        parts: list[InputPartition] = []
        for sid in range(int(start["snapshot_id"]) + 1, int(end["snapshot_id"]) + 1):
            snap = it.snapshot(self._path, sid)
            op = snap["operation"]
            if op == "replace":  # compaction adds no logical rows
                continue
            if op == "delete" and skip_deletes:
                # Iceberg's streaming-skip-delete-snapshots: a takedown
                # never halts the stream; its added files (masks or
                # rewritten copies of already-delivered rows) are not
                # delivered, and the stream never retracts
                continue
            if op != "append":
                raise ValueError(
                    f"ice stream: snapshot {sid} is '{op}' — a stream is "
                    "only defined over append/replace history"
                    + (
                        " (option skip_delete_snapshots=true tails across "
                        "takedowns)"
                        if op == "delete"
                        else ""
                    )
                )
            parent_paths = (
                {e["path"] for e in it.snapshot(self._path, snap["parent_id"])["manifest"]}
                if snap["parent_id"]
                else set()
            )
            parts.extend(
                IceFilePartition(file=os.path.join(self._path, e["path"]))
                for e in snap["manifest"]
                if e["path"] not in parent_paths
                and e.get("content") != "eq-deletes"
            )
        return parts

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        assert isinstance(partition, IceFilePartition)
        yield from _read_data_file(partition, self._schema)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


def _write_task_file(
    path: str, iterator: Iterator["pa.RecordBatch"]
) -> IceCommitMessage:
    """Executor side of both writers: stage one parquet file of this
    task's batches under data/ (invisible until the driver commits)."""
    import pyarrow.parquet as pq

    writer = None
    rel = os.path.join("data", f"ds-{uuid.uuid4().hex}.parquet")
    full = os.path.join(path, rel)
    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                os.makedirs(os.path.dirname(full), exist_ok=True)
                writer = pq.ParquetWriter(full, batch.schema)
            writer.write_batch(batch)
    finally:
        if writer is not None:
            writer.close()
    return IceCommitMessage(files=[rel] if writer is not None else [])


def _entries_for_files(path: str, rels: list[str]) -> list[dict[str, Any]]:
    """Driver side: manifest entries (rows/bytes/footer stats) for staged
    files — footer-only reads, the ``_list_new_files`` contract."""
    import pyarrow.parquet as pq

    from kraken_spark.sources import icetable as it

    entries = []
    for rel in sorted(rels):
        full = os.path.join(path, rel)
        meta = pq.read_metadata(full)
        entries.append(
            {
                "path": rel,
                "rows": meta.num_rows,
                "bytes": os.path.getsize(full),
                "stats": it._file_column_stats(meta),
                "partition": "",
            }
        )
    return entries


def _collect_rels(messages: list) -> list[str]:
    rels: list[str] = []
    for m in messages:
        if m is not None:
            rels.extend(m.files)
    return rels


def _refuse_partition_spec(path: str) -> None:
    from kraken_spark.sources import icetable as it

    head = it.current_snapshot_id(path)
    if head and it.snapshot(path, head).get("partition_spec"):
        raise ValueError(
            "ice: this table has a hidden-partitioning spec — the "
            "DataSource writer stages unclustered files and would break "
            "the layout; write with icetable.append(partition_by=...) "
        )


def _head_sort_order(path: str) -> list:
    """The table-level sort order must SURVIVE a DataSource write even
    though this writer cannot range-cluster its own staged files (it sees
    whatever partitioning Spark hands each task): recording [] would
    silently strip the order from the inheritance chain and every later
    ``icetable.append`` would stop clustering."""
    from kraken_spark.sources import icetable as it

    head = it.current_snapshot_id(path)
    return it.snapshot(path, head).get("sort_order") or [] if head else []


class IceBatchWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self._path = options.get("path") or ""
        if not self._path:
            raise ValueError("ice: .save(<table path>) required")
        self._schema = schema
        self._overwrite = overwrite
        _refuse_partition_spec(self._path)

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> IceCommitMessage:
        return _write_task_file(self._path, iterator)

    def commit(self, messages: list) -> None:
        from kraken_spark.sources import icetable as it

        it._commit_new_files(
            self._path,
            _entries_for_files(self._path, _collect_rels(messages)),
            self._schema,
            operation="overwrite" if self._overwrite else "append",
            summary={"writer": "datasource"},
            sort_by=_head_sort_order(self._path) or None,
        )

    def abort(self, messages: list) -> None:
        # staged files are invisible by construction; reclaim eagerly
        for rel in _collect_rels(messages):
            try:
                os.unlink(os.path.join(self._path, rel))
            except OSError:
                pass


class IceStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming sink: one atomic snapshot per micro-batch,
    keyed by batch id in the snapshot summary. A retried batch finds its
    id in history and commits nothing (its staged files become invisible
    orphans for ``vacuum``). The sole writer state is the table's own
    metadata — the ``streaming.py`` foreachBatch wrapper's guarantee,
    native to ``writeStream.format("ice")``."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self._path = options.get("path") or ""
        if not self._path:
            raise ValueError("ice: .start(<table path>) required")
        self._schema = schema
        # the exactly-once key scopes batch ids to ONE query: without it,
        # two anonymous queries writing the same table could collide on a
        # batch id and silently drop data. Spark's conf-level default
        # checkpoint does not reach these options, so require it here.
        self._query = options.get("queryname") or options.get("checkpointlocation") or ""
        if not self._query:
            raise ValueError(
                "ice sink: set .option('checkpointLocation', ...) (or "
                ".queryName(...)) — it scopes the sink's exactly-once "
                "batch-id bookkeeping to this query"
            )
        _refuse_partition_spec(self._path)

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> IceCommitMessage:
        return _write_task_file(self._path, iterator)

    def _already_committed(self, batch_id: int) -> bool:
        from kraken_spark.sources import icetable as it

        for h in reversed(it.history(self._path)):
            s = h.get("summary", {})
            if (
                s.get("stream_batch_id") == batch_id
                and s.get("stream_query", "") == self._query
            ):
                return True
        return False

    def commit(self, messages: list, batchId: int) -> None:  # noqa: N803
        from kraken_spark.sources import icetable as it

        rels = _collect_rels(messages)
        if not rels or self._already_committed(batchId):
            return
        it._commit_new_files(
            self._path,
            _entries_for_files(self._path, rels),
            self._schema,
            summary={
                "writer": "datasource-stream",
                "stream_batch_id": batchId,
                "stream_query": self._query,
            },
            sort_by=_head_sort_order(self._path) or None,
            # re-validated on every CAS retry: exactly-once even if a
            # zombie attempt of the same batch races this commit
            precondition=lambda p, parent: not self._already_committed(batchId),
        )

    def abort(self, messages: list, batchId: int) -> None:  # noqa: N803
        for rel in _collect_rels(messages):
            try:
                os.unlink(os.path.join(self._path, rel))
            except OSError:
                pass


class IceDataSource(DataSource):
    """``spark.dataSource.register(IceDataSource)`` then use format
    ``"ice"`` with read / write / readStream / writeStream."""

    @classmethod
    def name(cls) -> str:
        return "ice"

    def schema(self) -> StructType:
        _, snap = _resolve_snapshot(self.options)
        return _schema_of(snap)

    def reader(self, schema: StructType) -> IceBatchReader:
        if str(self.options.get("pushdown", "")).lower() in ("true", "1"):
            return IcePushdownReader(self.options, schema)
        return IceBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> IceStreamReader:
        return IceStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> IceBatchWriter:
        return IceBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> IceStreamWriter:
        return IceStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Register the ``ice`` format. Also exports any --py-files zips on
    the PYTHONPATH the driver-side DataSource runners are spawned with:
    the streaming source's planner worker unpickles the source BY MODULE
    REFERENCE, and under a zip-only `spark-submit --py-files` deploy the
    worker's interpreter cannot import kraken_spark otherwise (the
    includes channel covers executors and the batch planner, but not the
    streaming runner). ``sc.environment`` is captured into the function's
    env at registration, so this must happen first."""
    sc = spark.sparkContext
    paths = [
        p for p in (sc._conf.get("spark.submit.pyFiles", "") or "").split(",") if p
    ]
    try:
        from pyspark.core.files import SparkFiles

        root = SparkFiles.getRootDirectory()
        for fn in sc._python_includes or []:
            full = os.path.join(root, fn)
            if os.path.exists(full):
                paths.append(full)
    except Exception:
        pass
    if paths:
        cur = sc.environment.get("PYTHONPATH") or os.environ.get("PYTHONPATH", "")
        sc.environment["PYTHONPATH"] = os.pathsep.join(
            dict.fromkeys(paths + ([cur] if cur else []))
        )
    spark.dataSource.register(IceDataSource)
