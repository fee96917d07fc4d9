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
