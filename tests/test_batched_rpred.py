"""Cross-line batched recognition (rpred_parity.recognize_lines +
torchvgsl.forward_batch) must agree with the per-line API — the round-5
throughput work (width-bucketed GEMM batching of the BiLSTM recurrence,
the analog of the reference's queue batching, lib/vgsl/rpred.py:100-124)
may never change a prediction.

Parity contract: prediction strings and cut spans EXACT; confidences to
float tolerance (the batched recurrence turns per-timestep GEMVs into
GEMMs, which may round differently at the ulp level — the same tolerance
class as rec_train's pinned batched==per-line forward)."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import png
from kraken_spark.kernels.modelio import load_kraken_model
from kraken_spark.kernels.rpred_parity import LoadedRecognizer

RES = "/root/reference/tests/resources"


@pytest.fixture(scope="module")
def line_img():
    return png.decode_png(open(f"{RES}/000236.png", "rb").read())


def _assert_parity(per, bat):
    assert len(per) == len(bat)
    for p, b in zip(per, bat):
        assert p["prediction"] == b["prediction"]
        assert [tuple(c) for c in p["cuts"]] == [tuple(c) for c in b["cuts"]]
        assert np.allclose(p["confidences"], b["confidences"], atol=1e-5)


def test_bbox_model_batched_equals_per_line(line_img):
    """overfit.mlmodel (bbox seg_type, 3-deep BiLSTM stack): five
    different-width boxes through one batch == five per-line calls."""
    rec = LoadedRecognizer(load_kraken_model(f"{RES}/overfit.mlmodel")[0])
    lines = [{"bbox": [0, 0, x1, 156]} for x1 in (700, 1100, 1600, 2100, 2544)]
    per = [rec.recognize_bbox(line_img, ln["bbox"], pad=16, scale_cuts=True)
           for ln in lines]
    bat = rec.recognize_lines(line_img, lines, pad=16, scale_cuts=True)
    _assert_parity(per, bat)
    assert any(p["prediction"] for p in per)


def test_baseline_model_batched_equals_per_line(line_img):
    """overfit_bl.safetensors (baseline seg_type, legacy polygons): mixed
    widths, batch smaller than the line count exercises chunking."""
    rec = LoadedRecognizer(load_kraken_model(f"{RES}/overfit_bl.safetensors")[0])
    lines = [
        {"bbox": [0, 0, x1, 156],
         "baseline": [[0, 10], [x1 - 1, 10]],
         "boundary": [[0, 0], [x1 - 1, 0], [x1 - 1, 155], [0, 155]]}
        for x1 in (600, 900, 1400, 2000, 2544)
    ]
    per = [rec.recognize_baseline(line_img, ln["baseline"], ln["boundary"],
                                  pad=16, scale_cuts=True) for ln in lines]
    bat = rec.recognize_lines(line_img, lines, pad=16, scale_cuts=True,
                              batch_size=2)
    _assert_parity(per, bat)
    assert any(p["prediction"] for p in per)


def test_batched_handles_invalid_and_blank_lines(line_img):
    """Out-of-bounds and blank lines emit empty records at their input
    positions, exactly like the per-line API."""
    rec = LoadedRecognizer(load_kraken_model(f"{RES}/overfit.mlmodel")[0])
    blank = np.full_like(line_img, 255)
    lines = [{"bbox": [0, 0, 1200, 156]},
             {"bbox": [-5, -5, 10**6, 10**6]},
             {"bbox": [0, 0, 1800, 156]}]
    bat = rec.recognize_lines(line_img, lines, pad=16)
    assert bat[0]["prediction"] and bat[2]["prediction"]
    # clamped out-of-range box ends up whole-page; parity with per-line
    per1 = rec.recognize_bbox(
        line_img, [0, 0, line_img.shape[1], line_img.shape[0]], pad=16)
    assert bat[1]["prediction"] == per1["prediction"]
    empty = rec.recognize_lines(blank, [{"bbox": [0, 0, 500, 156]}], pad=16)
    assert empty[0] == {"prediction": "", "cuts": [], "confidences": []}


def test_trained_asset_batched_equals_per_line_on_corpus():
    """The in-repo trained recognizer over real synthetic-corpus lines:
    the production path stages.extract_document now batches — its records
    must match per-line recognition line for line."""
    import os

    from kraken_spark.corpus import generate_corpus_table
    from kraken_spark.kernels import binarize, imgio
    from kraken_spark.kernels.blla import segment_blla
    from kraken_spark.kernels.rec_train import ASSET

    if not os.path.exists(ASSET):
        pytest.skip("trained recognizer asset absent")
    rec = LoadedRecognizer(load_kraken_model(ASSET)[0])
    rows = generate_corpus_table(3).to_pylist()
    checked = 0
    for row in rows:
        img = png.to_grayscale(imgio.decode_image(row["html"]))
        mask = binarize.nlbin(img)
        seg = segment_blla(mask, url=row["url"])
        per = []
        for ln in seg["lines"]:
            if not ln.get("baseline"):
                continue
            per.append(rec.recognize_baseline(
                img, ln["baseline"], ln["boundary"], scale_cuts=True))
        bat = rec.recognize_lines(
            img, [ln for ln in seg["lines"] if ln.get("baseline")],
            scale_cuts=True, batch_size=7)
        _assert_parity(per, bat)
        checked += len(per)
    assert checked >= 20


def test_forward_batch_falls_back_without_batchable_tail():
    """A net whose tail isn't batchable (transposed LSTM) routes through
    the per-line forward — same results, no exception."""
    from kraken_spark.kernels.torchvgsl import TorchVGSL

    rng = np.random.Generator(np.random.PCG64(5))
    hid, cls = 8, 6
    W = {}
    for n, feat in (("L_0", 16), ("L_1", 2 * hid)):
        for sfx in ("", "_reverse"):
            W[f"{n}.layer.weight_ih_l0{sfx}"] = rng.normal(0, 0.1, (4 * hid, feat)).astype(np.float32)
            W[f"{n}.layer.weight_hh_l0{sfx}"] = rng.normal(0, 0.1, (4 * hid, hid)).astype(np.float32)
            W[f"{n}.layer.bias_ih_l0{sfx}"] = rng.normal(0, 0.1, 4 * hid).astype(np.float32)
            W[f"{n}.layer.bias_hh_l0{sfx}"] = rng.normal(0, 0.1, 4 * hid).astype(np.float32)
    W["O_2.lin.weight"] = rng.normal(0, 0.1, (cls, 2 * hid)).astype(np.float32)
    W["O_2.lin.bias"] = rng.normal(0, 0.1, cls).astype(np.float32)
    net = TorchVGSL("[1,1,0,16 Lby8 Lbx8 O1c6]", W)
    assert net._tail_split() is None
    xs = [rng.random((16, 1, w)).astype(np.float32) for w in (9, 13)]
    per = [net.forward(x) for x in xs]
    bat = net.forward_batch(xs)
    for p, b in zip(per, bat):
        assert np.array_equal(p, b)
