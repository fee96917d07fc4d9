"""ketos-roadd analog (kernels/ro_train.attach_ro_model — reference
ketos/ro.py:261-313): nest the reading-order pair-MLP inside a
segmentation weights container as an aux model, with both loaders reading
the combined file and the env-var dispatch driving inference from it."""

from __future__ import annotations

import json

import numpy as np
import pytest

from kraken_spark.kernels import ro as ro_mod
from kraken_spark.kernels import seg_train
from kraken_spark.kernels.modelio import read_safetensors
from kraken_spark.kernels.ro import HIDDEN, OrderMLP
from kraken_spark.kernels.ro_train import (RO_PREFIX, attach_ro_model,
                                           load_mlp, save_mlp)


def _mk_mlp(seed: int) -> OrderMLP:
    rng = np.random.Generator(np.random.PCG64(seed))
    return OrderMLP(rng.normal(size=(HIDDEN, 16)).astype(np.float32),
                    rng.normal(size=HIDDEN).astype(np.float32),
                    rng.normal(size=HIDDEN).astype(np.float32),
                    float(rng.normal()))


def _mlp_equal(a: OrderMLP, b: OrderMLP) -> bool:
    return (a.w1.tobytes() == b.w1.tobytes()
            and a.b1.tobytes() == b.b1.tobytes()
            and a.w2.tobytes() == b.w2.tobytes()
            and abs(a.b2 - b.b2) < 1e-7)


@pytest.fixture
def seg_path(tmp_path):
    W = seg_train.init_weights(np.random.Generator(np.random.PCG64(11)))
    p = str(tmp_path / "seg.safetensors")
    seg_train.save_weights(W, p)
    return p


def test_attach_combines_and_both_loaders_read(seg_path, tmp_path):
    mlp = _mk_mlp(1)
    rp = str(tmp_path / "ro.safetensors")
    save_mlp(mlp, rp)
    out = attach_ro_model(seg_path, rp, str(tmp_path / "combined.safetensors"))

    got = load_mlp(out)
    assert got is not None and _mlp_equal(got, mlp)
    # seg loader reads the combined file unchanged (extra aux keys ignored)
    seg_a = seg_train.load_weights(seg_path)
    seg_b = seg_train.load_weights(out)
    for k in seg_a:
        assert seg_a[k].tobytes() == seg_b[k].tobytes(), k
    _, meta = read_safetensors(out)
    assert meta["ro_level"] == "baselines" and meta["ro_n_classes"] == "2"

    # re-attach replaces the aux net; a combined file donates its RO net
    mlp2 = _mk_mlp(2)
    rp2 = str(tmp_path / "ro2.safetensors")
    save_mlp(mlp2, rp2)
    out2 = attach_ro_model(out, rp2, str(tmp_path / "combined2.safetensors"))
    assert _mlp_equal(load_mlp(out2), mlp2)
    t2, _ = read_safetensors(out2)
    assert sum(k.startswith(RO_PREFIX) for k in t2) == 4
    out3 = attach_ro_model(seg_path, out2, str(tmp_path / "from_combined.safetensors"))
    assert _mlp_equal(load_mlp(out3), mlp2)


def test_attach_refusals(seg_path, tmp_path):
    rp = str(tmp_path / "ro.safetensors")
    save_mlp(_mk_mlp(3), rp)
    with pytest.raises(ValueError, match="not a segmentation"):
        attach_ro_model(rp, rp, str(tmp_path / "x.safetensors"))
    with pytest.raises(ValueError, match="not a reading-order"):
        attach_ro_model(seg_path, seg_path, str(tmp_path / "y.safetensors"))
    with pytest.raises(ValueError, match="level"):
        attach_ro_model(seg_path, rp, str(tmp_path / "z.safetensors"),
                        level="words")


def test_learned_mlp_env_path_dispatch(seg_path, tmp_path, monkeypatch):
    """KRAKEN_SPARK_RO_NET=<combined file> drives the inference-side RO
    from the roadd output instead of the shipped asset."""
    mlp = _mk_mlp(4)
    rp = str(tmp_path / "ro.safetensors")
    save_mlp(mlp, rp)
    out = attach_ro_model(seg_path, rp, str(tmp_path / "combined.safetensors"))

    monkeypatch.setattr(ro_mod, "_LEARNED_CACHE", [None])
    monkeypatch.setenv("KRAKEN_SPARK_RO_NET", out)
    got = ro_mod.learned_mlp()
    assert got is not None and _mlp_equal(got, mlp)

    monkeypatch.setattr(ro_mod, "_LEARNED_CACHE", [None])
    monkeypatch.setenv("KRAKEN_SPARK_RO_NET", "constructed")
    assert ro_mod.learned_mlp() is None


def test_roadd_cli_leg(seg_path, tmp_path, capsys):
    from kraken_spark.job import main

    rp = str(tmp_path / "ro.safetensors")
    save_mlp(_mk_mlp(5), rp)
    out = str(tmp_path / "combined.safetensors")
    rc = main(["--input", f"{seg_path},{rp}", "--output", out, "--roadd",
               "--ro-level", "baselines"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["output"] == out and rep["level"] == "baselines"
    assert load_mlp(out) is not None

    with pytest.raises(SystemExit):
        main(["--input", seg_path, "--output", out, "--roadd"])
