"""Forced alignment (kernels/align.py) and multimodal feature kernels.

Alignment parity model: aligning the recognizer's own prediction back onto
the line must reproduce recognition's cuts exactly (the reference's
test_align.py checks record shape; our deterministic recognizer lets us
assert exact geometry)."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import binarize, lineextract, pageseg, png, render
from kraken_spark.kernels.align import ctc_viterbi_align, forced_align
from kraken_spark.kernels.codec import Codec
from kraken_spark.kernels.recognizer import build_recognizer, recognize_line

MODEL = build_recognizer()
CODEC = Codec(MODEL.codec)


def _lines_of(doc_idx: int):
    d = render.render_document(42, doc_idx)
    img = png.to_grayscale(d["img"])
    mask = binarize.nlbin(img)
    seg = pageseg.segment(mask, url="u")
    return mask, seg["lines"]


@pytest.mark.parametrize("doc_idx", [0, 1, 2])
def test_forced_align_reproduces_recognition_cuts(doc_idx):
    mask, lines = _lines_of(doc_idx)
    assert lines
    for l in lines:
        strip, _ = lineextract.extract_line(mask, l)
        rec = recognize_line(MODEL, CODEC, strip, base_dir="L", bidi_reordering=False)
        ali = forced_align(MODEL, CODEC, strip, rec["prediction"])
        assert ali is not None
        assert ali["prediction"] == rec["prediction"]
        assert ali["cuts"] == rec["cuts"]
        assert all(c > 0.0 for c in ali["confidences"])


def test_forced_align_rejects_unalignable():
    mask, lines = _lines_of(0)
    strip, _ = lineextract.extract_line(mask, lines[0])
    assert forced_align(MODEL, CODEC, strip, "x" * 500) is None
    assert forced_align(MODEL, CODEC, np.zeros((0, 0), np.uint8), "ab") is None


def test_ctc_viterbi_align_simple():
    # 4 frames, 3 classes (0=blank): force "1,2" through a clear trellis
    logits = np.array(
        [[0.0, 5.0, 0.0], [5.0, 0.0, 0.0], [0.0, 0.0, 5.0], [5.0, 0.0, 0.0]],
        dtype=np.float32,
    )
    ali = ctc_viterbi_align(logits, [1, 2])
    assert ali is not None
    (l1, s1, e1, p1), (l2, s2, e2, p2) = ali
    assert (l1, s1) == (1, 0) and (l2, s2) == (2, 2)
    assert p1 > 0.9 and p2 > 0.9
    # impossible: more labels than frames
    assert ctc_viterbi_align(logits, [1, 2, 1, 2, 1]) is None


def test_block_mean_resize_and_embedding():
    from kraken_spark.operators.multimodal import (
        block_mean_resize,
        dhash64,
        page_embedding,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    r = block_mean_resize(img, 4, 4)
    assert r.shape == (4, 4)
    # 2x2 block means of a row-major ramp
    assert abs(float(r[0, 0]) - np.mean(img[:2, :2])) < 1e-5
    e = page_embedding(img)
    assert e.shape == (64,)
    assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5
    h1 = dhash64(img)
    h2 = dhash64(img[:, ::-1].copy())  # horizontal flip inverts every bit
    assert h1 != h2
    d = render.render_document(42, 0)
    g = png.to_grayscale(d["img"])
    assert dhash64(g) == dhash64(g)  # deterministic
    assert -(1 << 63) <= dhash64(g) < (1 << 63)
