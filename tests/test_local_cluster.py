"""Multi-executor deploy evidence (north rule: "run via spark-submit
--py-files on a multi-executor cluster"): the extraction job runs under
``local-cluster[2,2,2048]`` — two REAL executor JVMs with their own python
workers, not local-mode threads — with the package shipped ONLY as the
--py-files zip (executors import kraken_spark and load every trained asset
through the zipimporter). This is the closest a single box gets to a real
cluster: separate processes, real serialization, real executor-side module
resolution. CER must stay 0 per url across executors.

Runs in a clean subprocess (a second SparkContext can't coexist with the
suite's module-scoped sessions) with cwd OUTSIDE the repo so the source
tree can't shadow the zip on the driver either.
"""

import subprocess
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_extraction_on_local_cluster_via_pyfiles(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    script = textwrap.dedent(
        f"""
        import sys
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local-cluster[2,2,2048]")
            .config("spark.submit.pyFiles", {str(z)!r})
            .config("spark.executor.memory", "2g")
            .config("spark.sql.shuffle.partitions", "4")
            .appName("lc-e2e")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.addPyFile({str(z)!r})
        sys.path.insert(0, {str(z)!r})  # driver imports from the zip too
        import kraken_spark
        assert ".zip" in kraken_spark.__file__, kraken_spark.__file__
        from kraken_spark.corpus import generate_corpus_df
        from kraken_spark.pipeline import plan_extraction

        docs = generate_corpus_df(spark, 8)
        rows = plan_extraction(docs, num_partitions=4).select(
            "url", "cer", "partition_id"
        ).collect()
        assert len(rows) == 8, len(rows)
        assert all(r.cer == 0.0 for r in rows), [
            (r.url, r.cer) for r in rows if r.cer != 0.0
        ]
        # the work really spread over executor JVMs: driver + 2 executors
        n = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        assert n == 3, n
        spark.stop()
        print("LC_E2E_OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # outside the repo: no source-tree shadowing
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "LC_E2E_OK" in r.stdout


def test_ice_datasource_on_local_cluster_via_pyfiles(tmp_path):
    """The format("ice") DataSource under REAL executor JVMs with the
    package shipped only as the --py-files zip: write (task-staged files,
    driver CAS commit), MOR-masked read, and the streaming source->sink
    loop all run with executor-side zip imports."""
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    script = textwrap.dedent(
        f"""
        import os
        import sys

        # spark-submit --py-files exports the zip on PYTHONPATH for the
        # DRIVER-side python workers too (the streaming source's planner
        # runs in one); a bare subprocess must mirror that
        os.environ["PYTHONPATH"] = {str(z)!r} + os.pathsep + os.environ.get(
            "PYTHONPATH", ""
        )
        from pyspark.sql import SparkSession, functions as F

        spark = (
            SparkSession.builder.master("local-cluster[2,2,2048]")
            .config("spark.submit.pyFiles", {str(z)!r})
            .config("spark.executor.memory", "2g")
            .config("spark.sql.shuffle.partitions", "4")
            .appName("lc-ice-ds")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.addPyFile({str(z)!r})
        sys.path.insert(0, {str(z)!r})
        import kraken_spark
        assert ".zip" in kraken_spark.__file__, kraken_spark.__file__
        from kraken_spark.sources import icetable as it
        from kraken_spark.sources.ice_datasource import register

        register(spark)
        t = {str(tmp_path)!r} + "/tbl"
        df = spark.range(200).select(
            F.format_string("u%04d", F.col("id")).alias("url"),
            F.col("id").cast("int").alias("n"),
        )
        df.write.format("ice").mode("append").save(t)      # executor-staged write
        it.delete_keys(spark, t, ["u0007"], key="url")      # MOR mask
        got = spark.read.format("ice").load(t)              # DataSource read
        assert got.count() == 199, got.count()
        assert got.filter("url = 'u0007'").count() == 0
        # streaming loop across executor JVMs
        dst = {str(tmp_path)!r} + "/dst"
        q = (
            spark.readStream.format("ice").option("starting", "earliest")
            .option("skip_delete_snapshots", "true").load(t)
            .writeStream.format("ice")
            .option("checkpointLocation", {str(tmp_path)!r} + "/ckpt")
            .trigger(availableNow=True).start(dst)
        )
        q.awaitTermination(180)
        assert it.read(spark, dst).count() == 200  # appends only, no retraction
        n = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        assert n == 3, n
        spark.stop()
        print("LC_ICE_DS_OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "LC_ICE_DS_OK" in r.stdout


def test_line_parallel_on_local_cluster_via_pyfiles(tmp_path):
    """The line-parallel loaded-model plan under REAL executor JVMs with
    the zip-only deploy: its extra hops vs the fused plan (line-salted
    repartition between two Arrow stages, then a groupBy.applyInArrow
    assembly) all cross real executor boundaries here, and the rows must
    still match the fused plan exactly (text/cer/counts). The model file
    is passed by filesystem path — the single-box analog of shipping it
    with spark-submit --files."""
    import os

    from kraken_spark.kernels.rec_train import ASSET

    if not os.path.exists(ASSET):
        import pytest

        pytest.skip("trained recognizer asset missing")
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    script = textwrap.dedent(
        f"""
        import sys
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local-cluster[2,2,2048]")
            .config("spark.submit.pyFiles", {str(z)!r})
            .config("spark.executor.memory", "2g")
            .config("spark.sql.shuffle.partitions", "4")
            .appName("lc-lp")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.sparkContext.addPyFile({str(z)!r})
        sys.path.insert(0, {str(z)!r})
        import kraken_spark
        assert ".zip" in kraken_spark.__file__, kraken_spark.__file__
        from kraken_spark.corpus import generate_corpus_df
        from kraken_spark.pipeline import plan_extraction
        from kraken_spark.pipeline_lines import plan_extraction_line_parallel

        docs = generate_corpus_df(spark, 6).localCheckpoint(eager=True)
        cols = ["url", "text", "n_lines", "n_regions", "cer"]
        fused = sorted(plan_extraction(
            docs, num_partitions=4,
            kraken_model_path={str(ASSET)!r}).select(cols).collect())
        lp = sorted(plan_extraction_line_parallel(
            docs, num_partitions=4, kraken_model_path={str(ASSET)!r},
            line_partitions=4).select(cols).collect())
        assert len(fused) == 6 and fused == lp
        n = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        assert n == 3, n
        spark.stop()
        print("LC_LP_OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "LC_LP_OK" in r.stdout
