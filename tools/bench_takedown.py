"""Takedown-latency micro-benchmark: MOR equality-delete vs COW rewrite.

Measures the latency of the three single-url takedown strategies the ice
table layer offers (sources/icetable.py), on the same range-clustered
pages table:

  1. ``delete_keys``       — merge-on-read equality delete: one tiny key
                             parquet + one metadata commit, no data file
                             touched (Iceberg v2's fast takedown).
  2. ``delete_where`` +prune — copy-on-write, manifest-stat pruned: only
                             the file(s) whose url range covers the target
                             are rewritten.
  3. ``delete_where`` full — copy-on-write with no prune hint: every file
                             whose range matches is a rewrite candidate
                             (on a range-clustered table the stats still
                             narrow it; on an unsorted table this is the
                             rewrite-everything worst case, also timed).

Also times the read-side cost of a pending MOR mask (the broadcast
anti-join every scan pays until ``rewrite_deletes`` folds it) and the
fold itself.  Prints ONE JSON line; numbers land in BASELINE.md.

At 10^12 rows the MOR/COW gap is the difference between a takedown that
finishes in seconds and one that rewrites TBs; this micro-benchmark
evidences the gap at small scale on the real code paths.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("TAKEDOWN_ROWS", "131072"))
N_FILES = int(os.environ.get("TAKEDOWN_FILES", "64"))
PAYLOAD = 2048  # bytes of text per row — data volume must dominate the
# fixed commit overhead or the COW-rewrite slope is invisible at test scale


def _mk_table(spark, path: str, sort: bool) -> None:
    from pyspark.sql import functions as F

    from kraken_spark.sources import icetable as it

    df = (
        spark.range(N_ROWS)
        .select(
            F.format_string("https://site%04d.example/p%07d", (F.col("id") / 1000).cast("int"), F.col("id")).alias("url"),
            F.repeat(F.lit("x"), PAYLOAD).alias("text"),
            (F.col("id") % 211).cast("int").alias("n"),
        )
    )
    it.append(df, path, sort_by=["url"] if sort else None)


def _measure(spark, root: str, n_rows: int) -> dict[str, object]:
    """One size point: MOR delete / masked read / fold, COW pruned / full."""
    from kraken_spark.sources import icetable as it

    global N_ROWS
    N_ROWS = n_rows
    mid = n_rows // 2
    target = "https://site%04d.example/p%07d" % (mid // 1000, mid)
    r: dict[str, object] = {"rows": n_rows}

    t_mor = os.path.join(root, f"mor{n_rows}")
    _mk_table(spark, t_mor, sort=True)
    base_count = it.read(spark, t_mor).count()
    t0 = time.monotonic()
    it.read(spark, t_mor).count()
    r["read_clean_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    s = it.delete_keys(spark, t_mor, [target], key="url")
    r["mor_delete_s"] = round(time.monotonic() - t0, 3)
    assert s is not None and s["n_delete_keys"] == 1
    t0 = time.monotonic()
    masked = it.read(spark, t_mor).count()
    r["read_masked_s"] = round(time.monotonic() - t0, 3)
    assert masked == base_count - 1, (masked, base_count)
    t0 = time.monotonic()
    it.rewrite_deletes(spark, t_mor)
    r["fold_rewrite_s"] = round(time.monotonic() - t0, 3)
    assert it.read(spark, t_mor).count() == base_count - 1

    # MOR positional scrub: the no-key row-removal primitive. The commit
    # is O(metadata) like the equality delete; the identifying scan is
    # stats-prunable (flat with a prune hint, O(candidates) without)
    t_pos = os.path.join(root, f"pos{n_rows}")
    _mk_table(spark, t_pos, sort=True)
    t0 = time.monotonic()
    s = it.scrub_where(
        spark, t_pos, f"url = '{target}'", prune={"url": (target, target)}
    )
    r["scrub_pruned_s"] = round(time.monotonic() - t0, 3)
    assert s is not None and s["n_pos_deletes"] == 1
    assert it.read(spark, t_pos).count() == base_count - 1
    t_pos2 = os.path.join(root, f"posfull{n_rows}")
    _mk_table(spark, t_pos2, sort=False)
    t0 = time.monotonic()
    s = it.scrub_where(spark, t_pos2, f"url = '{target}'")
    r["scrub_fullscan_s"] = round(time.monotonic() - t0, 3)
    assert s is not None and it.read(spark, t_pos2).count() == base_count - 1

    # COW, manifest-stat pruned: the sorted layout means ONE file covers
    # the target url's range — the takedown rewrites only that file
    t_cow = os.path.join(root, f"cow{n_rows}")
    _mk_table(spark, t_cow, sort=True)
    t0 = time.monotonic()
    s = it.delete_where(
        spark, t_cow, f"url = '{target}'", prune={"url": (target, target)}
    )
    r["cow_pruned_s"] = round(time.monotonic() - t0, 3)
    assert s is not None
    r["cow_pruned_files_rewritten"] = s["rewritten_files"]
    assert it.read(spark, t_cow).count() == base_count - 1

    # COW, no prune hint, unsorted layout: every file is a candidate —
    # the rewrite-everything worst case that grows with table size
    t_cow3 = os.path.join(root, f"cowfull{n_rows}")
    _mk_table(spark, t_cow3, sort=False)
    t0 = time.monotonic()
    s = it.delete_where(spark, t_cow3, f"url = '{target}'")
    r["cow_full_s"] = round(time.monotonic() - t0, 3)
    r["cow_full_files_rewritten"] = s["rewritten_files"]
    assert s is not None and it.read(spark, t_cow3).count() == base_count - 1
    return r


def main() -> None:
    from kraken_spark.session import get_spark

    spark = get_spark(app="bench-takedown", cores=8, shuffle_partitions=N_FILES)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="kraken_spark_takedown_")
    base_rows = N_ROWS  # _measure mutates the module global
    try:
        # one warm-up pass so JVM/python-worker spin-up is not billed
        _measure(spark, os.path.join(root, "warm"), base_rows // 8)

        small = _measure(spark, root, base_rows)
        big = _measure(spark, root, base_rows * 4)
        out: dict[str, object] = {
            "metric": "takedown_latency", "unit": "sec", "files": N_FILES,
            "at_n": small, "at_4n": big,
            # the scale story: a 4x bigger table should leave the MOR
            # commit ~flat while the full COW rewrite grows ~linearly
            "mor_slope_4x": round(
                float(big["mor_delete_s"]) / max(float(small["mor_delete_s"]), 1e-9), 2
            ),
            "cow_full_slope_4x": round(
                float(big["cow_full_s"]) / max(float(small["cow_full_s"]), 1e-9), 2
            ),
            "mor_vs_cow_full_speedup_at_4n": round(
                float(big["cow_full_s"]) / max(float(big["mor_delete_s"]), 1e-9), 2
            ),
            "scrub_pruned_slope_4x": round(
                float(big["scrub_pruned_s"]) / max(float(small["scrub_pruned_s"]), 1e-9), 2
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
