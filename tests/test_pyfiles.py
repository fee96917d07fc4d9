"""spark-submit --py-files packaging (tools/build_pyfiles.py): the zip is
deterministic, and a clean subprocess with ONLY the zip on PYTHONPATH (cwd
outside the repo, so the source tree can't shadow it) imports the package
and loads every trained asset through the zipimporter — the deploy path
where __file__-relative asset reads don't exist on disk.
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_zip_deterministic_and_complete(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z1, z2 = tmp_path / "a.zip", tmp_path / "b.zip"
    names = build_pyfiles.build(z1)
    build_pyfiles.build(z2)
    assert z1.read_bytes() == z2.read_bytes()
    for required in [
        "kraken_spark/job.py",
        "kraken_spark/assets/bpe_merges.json",
        "kraken_spark/assets/quality_clf.json",
        "kraken_spark/assets/blla_learned.safetensors",
        "kraken_spark/assets/ro_learned.safetensors",
    ]:
        assert required in names
    assert not any("test" in n or "__pycache__" in n for n in names)


def test_assets_load_from_zip_deploy(tmp_path):
    sys.path.insert(0, str(ROOT / "tools"))
    try:
        import build_pyfiles
    finally:
        sys.path.pop(0)
    z = tmp_path / "kraken_spark.zip"
    build_pyfiles.build(z)
    script = textwrap.dedent(
        """
        import kraken_spark, sys
        assert ".zip" in kraken_spark.__file__, kraken_spark.__file__
        from kraken_spark.kernels.seg_train import load_weights
        from kraken_spark.kernels.ro_train import load_mlp
        from kraken_spark.kernels.quality_train import load_model
        from kraken_spark.functions.text import _bpe
        W = load_weights()
        assert W is not None and set(W) == {"w0", "b0", "u", "v", "b1"}
        mlp = load_mlp()
        assert mlp is not None and mlp.w1.size > 0
        m = load_model()
        assert m["weights_q"].shape[0] > 0
        tok = _bpe()
        assert tok.count("the table") == 2
        print("ZIP-DEPLOY-OK")
        """
    )
    env = dict(os.environ, PYTHONPATH=str(z))
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
    )
    assert out.returncode == 0, out.stderr
    assert "ZIP-DEPLOY-OK" in out.stdout
