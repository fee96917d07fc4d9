"""The literal north-rule invocation: `spark-submit --master
local-cluster[2,2,2048] --py-files kraken_spark.zip job.py --input ...
--output ... --table-format ice --metrics ...` as a real subprocess of the
spark-submit binary — two executor JVMs, the package and trained assets
shipped only in the zip, output and metrics committed as ice snapshots.

Asserts on the job's own success line plus a read-back of both tables
(local-cluster teardown prints benign shutdown-hook noise and can taint
the exit code, so the committed state is the truth checked).
"""

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not found"
)
def test_job_cli_under_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    # the submitted script is job.py AS PACKAGED — extracted from the zip,
    # not read from the source tree
    entry = tmp_path / "job_entry.py"
    with zipfile.ZipFile(z) as zf:
        entry.write_bytes(zf.read("kraken_spark/job.py"))

    # stage a small input corpus (plain parquet pages table)
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.session import get_spark

    s = get_spark(app="ss-gen", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    generate_corpus_df(s, 6).write.mode("overwrite").parquet(
        str(tmp_path / "in")
    )

    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=2g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(z),
            str(entry),
            "--input", str(tmp_path / "in"),
            "--output", str(tmp_path / "out"),
            "--table-format", "ice",
            "--metrics", str(tmp_path / "metrics"),
            "--run-id", "ss1",
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert "committed 6 extraction rows" in r.stdout, (
        r.stdout[-2000:] + r.stderr[-2000:]
    )

    from kraken_spark.sources import icetable as it

    out = it.read(s, str(tmp_path / "out"))
    assert out.count() == 6
    assert out.where("cer != 0.0").count() == 0
    h = it.history(str(tmp_path / "out"))
    assert [x["summary"].get("run_id") for x in h] == ["ss1"]
    m = it.read(s, str(tmp_path / "metrics")).collect()
    assert sum(x.n_docs for x in m) == 6
    assert all(x.mean_cer == 0.0 for x in m)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not found"
)
def test_stream_under_spark_submit_pyfiles(tmp_path):
    """`spark-submit --py-files ... job.py --stream`: the continuous
    extraction leg under the literal production invocation. This is also
    the proof of the PYTHONPATH claim in test_local_cluster: the
    streaming source's planner runs in a fresh driver-side python worker,
    and spark-submit's own --py-files handling (not our code) must make
    kraken_spark importable there."""
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    entry = tmp_path / "job_entry.py"
    with zipfile.ZipFile(z) as zf:
        entry.write_bytes(zf.read("kraken_spark/job.py"))

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.session import get_spark
    from kraken_spark.sources import icetable as it

    s = get_spark(app="ss-stream-gen", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    docs = generate_corpus_df(s, 4).localCheckpoint(eager=True)
    it.append(docs, str(tmp_path / "pages"))

    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=2g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(z),
            str(entry),
            "--input", str(tmp_path / "pages"),
            "--output", str(tmp_path / "out"),
            "--stream",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--partitions", "2",
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert "stream drained" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
    out = it.read(s, str(tmp_path / "out")).collect()
    assert len(out) == 4 and all(x.cer == 0.0 for x in out)
    assert it.snapshot(str(tmp_path / "out"))["summary"]["stream_batch_id"] == 0
