"""In-repo trained reading-order MLP (kernels/ro_train.py): the committed
asset must load and drive neural_reading_order, training must be
reproducible, and the learned comparator must order held-out pages EXACTLY
— including the 2-column LTR/RTL pages where the constructed y-then-x
comparator provably cannot (golden order is column-major)."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import render, ro, ro_train


def _order_of(d, mlp):
    cls = 1 if d["base_dir"] == "R" else 0
    boxes = [tuple(l["bbox"]) for l in d["lines"]]
    h, w = d["img"].shape
    feats = ro.extract_element_features(boxes, [cls] * len(boxes), w=w, h=h)
    return ro.greedy_order_decode(mlp.pair_probs(feats))


def test_asset_present_and_live():
    mlp = ro_train.load_mlp()
    assert mlp is not None, f"missing committed asset {ro_train.ASSET}"
    assert mlp.w1.shape == (ro.HIDDEN, 16)
    ro._LEARNED_CACHE[0] = None
    assert ro.learned_mlp() is not None


def test_learned_orders_heldout_pages_exactly():
    """Evaluation seeds are disjoint from the 883xxx training seeds."""
    mlp = ro_train.load_mlp()
    n2col = 0
    for seed in (1234, 7, 42, 99):
        for i in range(6):
            d = render.render_document(seed, i)
            n2col += d["ncols"] == 2
            assert _order_of(d, mlp) == list(range(len(d["lines"]))), (seed, i)
    assert n2col >= 3  # the sweep genuinely exercises 2-column pages


def test_learned_beats_constructed_on_two_column():
    """The constructed top-to-bottom comparator interleaves columns; the
    trained MLP realizes the column-major golden order on the same page."""
    mlp = ro_train.load_mlp()
    con = ro.build_order_mlp()
    seen = 0
    for seed in (1234, 7, 42):
        for i in range(8):
            d = render.render_document(seed, i)
            if d["ncols"] != 2 or len({l["col"] for l in d["lines"]}) < 2:
                continue
            seen += 1
            gold = list(range(len(d["lines"])))
            assert _order_of(d, mlp) == gold, (seed, i)
            assert _order_of(d, con) != gold, (seed, i)
    assert seen >= 2


def test_rtl_flips_column_order():
    """On an RTL 2-column page the right column precedes — the class
    feature must flip the learned column sign. Construct a synthetic
    4-box page and check both directions."""
    mlp = ro_train.load_mlp()
    h, w = 1600, 1200
    left_top = (64, 64, 560, 80)
    left_bot = (64, 100, 560, 116)
    right_top = (660, 64, 1150, 80)
    right_bot = (660, 100, 1150, 116)
    boxes = [left_top, left_bot, right_top, right_bot]

    def order(cls):
        feats = ro.extract_element_features(boxes, [cls] * 4, w=w, h=h)
        return ro.greedy_order_decode(mlp.pair_probs(feats))

    assert order(0) == [0, 1, 2, 3]  # LTR: left column first
    assert order(1) == [2, 3, 0, 1]  # RTL: right column first


def test_training_is_reproducible():
    data = ro_train.training_set(n_docs=2)
    m1 = ro_train.train_ro(steps=10, data=data, seed=5)
    m2 = ro_train.train_ro(steps=10, data=data, seed=5)
    assert np.array_equal(m1.w1, m2.w1) and np.array_equal(m1.w2, m2.w2)


def test_constructed_fallback(monkeypatch):
    monkeypatch.setenv("KRAKEN_SPARK_RO_NET", "constructed")
    ro._LEARNED_CACHE[0] = None
    assert ro.learned_mlp() is None
    # neural_reading_order still works through the constructed comparator
    assert ro.neural_reading_order([(0, 0, 10, 10), (0, 20, 10, 30)]) == [0, 1]
    monkeypatch.delenv("KRAKEN_SPARK_RO_NET")
    ro._LEARNED_CACHE[0] = None
