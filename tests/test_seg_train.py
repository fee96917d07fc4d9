"""In-repo trained segmentation net (kernels/seg_train.py): the committed
asset must load, the numpy backprop must match numeric gradients, training
must be bit-reproducible, and the LEARNED weights (not the constructed
fallback) must drive the reference-vectorizer path to byte-identical
extraction — converting the last constructed-weight stand-in (the
reference's blla.mlmodel is an LFS stub) into trained-weight evidence."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import seg_train
from kraken_spark.kernels.seg_train import (ASSET, C0, C1, K0, KH, KV,
                                            forward, init_weights,
                                            load_weights, train)


def test_asset_present_and_well_formed():
    W = load_weights()
    assert W is not None, f"missing committed asset {ASSET}"
    assert W["w0"].shape == (C0, K0, K0)
    assert W["u"].shape == (C1, C0, KV)
    assert W["v"].shape == (C1, C0, KH)
    assert all(np.isfinite(W[k]).all() for k in W)


def test_learned_net_is_live_in_blla_ref():
    from kraken_spark.kernels import blla

    blla._LEARNED_CACHE[0] = None
    assert blla.learned_weights() is not None


def test_backward_matches_numeric_gradient():
    """Central-difference check of the hand-written backprop on a tiny
    input, every parameter family."""
    rng = np.random.Generator(np.random.PCG64(3))
    W = init_weights(rng)
    x = (rng.random((12, 14)) < 0.3).astype(np.float64)
    t = np.stack([(rng.random((12, 14)) < 0.1), (rng.random((12, 14)) < 0.4)]).astype(
        np.float64
    )

    def loss_of(Wq):
        y = forward(x, Wq)
        eps = 1e-9
        return -float(
            (t * np.log(y + eps) + (1 - t) * np.log(1 - y + eps)).sum()
        )

    y, cache = forward(x, W, want_grad_cache=True)
    dz1 = y - t  # unweighted BCE, sum reduction
    g = seg_train._backward(x.shape, W, cache, dz1)
    h = 1e-6
    for key, idx in (
        ("w0", (0, 3, 3)),
        ("w0", (1, 0, 6)),
        ("b0", (0,)),
        ("u", (0, 1, 2)),
        ("v", (1, 0, 24)),
        ("b1", (1,)),
    ):
        Wp = {k: v.copy() for k, v in W.items()}
        Wp[key][idx] += h
        Wm = {k: v.copy() for k, v in W.items()}
        Wm[key][idx] -= h
        num = (loss_of(Wp) - loss_of(Wm)) / (2 * h)
        ana = g[key][idx]
        assert abs(num - ana) <= 1e-4 * max(1.0, abs(num)), (key, idx, num, ana)


def test_training_is_bit_reproducible():
    pages = seg_train.training_pages(n_straight=1, n_curved=1)
    W1 = train(steps=4, batch=2, pages=pages, seed=11)
    W2 = train(steps=4, batch=2, pages=pages, seed=11)
    for k in W1:
        assert np.array_equal(W1[k], W2[k]), k


def test_learned_weights_cer_zero_sample():
    """End-to-end byte-identical extraction THROUGH THE LEARNED WEIGHTS on
    seeds the trainer never saw (training seeds are 881xxx/882xxx)."""
    from kraken_spark.kernels import blla, png, render
    from kraken_spark.stages import extract_document

    blla._LEARNED_CACHE[0] = None
    assert blla.learned_weights() is not None
    for seed, i in ((1234, 0), (42, 3), (99, 7)):
        d = render.render_document(seed, i)
        out = extract_document(
            png.encode_png(d["img"]), f"u{seed}_{i}", d["lang"],
            gt_text=d["text"], segmenter="blla_ref",
        )
        assert out["cer"] == 0.0, (seed, i, out["cer"])


def test_constructed_fallback_still_works(monkeypatch):
    """KRAKEN_SPARK_BLLA_NET=constructed forces the constructed net — the
    documented fallback when the asset is absent."""
    from kraken_spark.kernels import blla, png, render
    from kraken_spark.stages import extract_document

    monkeypatch.setenv("KRAKEN_SPARK_BLLA_NET", "constructed")
    blla._LEARNED_CACHE[0] = None
    assert blla.learned_weights() is None
    d = render.render_document(1234, 0)
    out = extract_document(
        png.encode_png(d["img"]), "u", d["lang"],
        gt_text=d["text"], segmenter="blla_ref",
    )
    assert out["cer"] == 0.0
    monkeypatch.delenv("KRAKEN_SPARK_BLLA_NET")
    blla._LEARNED_CACHE[0] = None


def test_infer_forward_matches_training():
    """The float32 shifted-add inference forward must agree with the
    float64 training forward to well under the vectorizer's threshold
    resolution, and make identical 0.17/0.5 threshold decisions on a real
    page."""
    from kraken_spark.kernels import render
    from kraken_spark.kernels.blla import _pool_or
    from kraken_spark.kernels.seg_train import forward_infer

    W = load_weights()
    d = render.render_document(1234, 0)
    x = _pool_or(d["ink"].astype(bool), 2).astype(np.float64)
    y64 = forward(x, W)
    y32 = forward_infer(x, W)
    assert np.abs(y64 - y32).max() < 1e-4
    assert np.array_equal(y64[0] > 0.17, y32[0] > 0.17)
    assert np.array_equal(y64[1] > 0.5, y32[1] > 0.5)


def test_gt_maps_geometry():
    from kraken_spark.kernels import render

    d = render.render_document(1234, 0)
    x, tb, tr = seg_train.gt_maps(d)
    assert x.shape == tb.shape == tr.shape
    # every golden baseline midpoint is covered by the baseline target
    for l in d["lines"]:
        (x0, yb), (x1, _) = l["baseline"]
        assert tb[yb // 2, ((x0 + x1) // 2) // 2] == 1.0
    assert tr.sum() > tb.sum() > 0


def test_ketos_segtest_analog(tmp_path):
    """--test-segmenter: serialize a real extraction's geometry to ALTO,
    re-segment the same page images, and report object-level baseline
    P/R/F1 against the markup — the same segmenter reproduces its own
    ground truth exactly; the legacy pageseg path still matches within
    tolerance (both are CER-0 paths over the same lines)."""
    import json

    import pyspark.sql.functions as F

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.session import get_spark
    from kraken_spark.sources.arrow_dataset import xml_pairs_df
    from kraken_spark.training import test_segmenter_on_pairs

    spark = get_spark(app="tests-segtest", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2, segmenter="blla")
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pairs_path = str(tmp_path / "pairs.parquet")
    (alto.join(docs.select("url", "html"), "url")
     .select("url", F.encode("document", "UTF-8").alias("xml"),
             F.col("html").alias("image"))
     .write.parquet(pairs_path))

    # CLI leg: blla re-segmentation reproduces its own ground truth
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--input", pairs_path, "--output", str(tmp_path / "na"),
                   "--test-segmenter"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["n_pages"] == 4 and rep["segmenter"] == "blla"
    assert rep["f1"] == 1.0 and rep["macro_f1"] == 1.0, rep
    assert rep["n_detected"] == rep["n_golden"] == rep["n_matched"] > 0
    # pixel block present for the heatmap path; the baseline-class IoU is
    # quantization-limited against VECTORIZED-output GT (a 1-2 px baseline
    # offset dominates a ~3-pooled-row band union — see
    # test_pixel_metrics_against_golden_geometry for the true-GT >=0.9 pin)
    px = rep["pixel"]
    assert px["baseline"]["accuracy"] >= 0.9 and px["baseline"]["iou"] >= 0.15
    assert px["region"]["accuracy"] >= 0.9 and px["region"]["iou"] >= 0.8
    assert 0.0 < px["mean_iou"] <= 1.0
    # the reference's native soft detection metric (resample + falloff +
    # optimal assignment). Self-reproduction reads ~0.976, NOT 1.0: the
    # point-score falloff punishes baseline-extent differences from the
    # ALTO round trip that the greedy 50%-overlap rule forgives — the
    # stricter reference semantics, kept honest here
    det = rep["detection"]
    assert 0.95 <= det["f1"] < 1.0 and det["precision"] == det["recall"]

    # cross-path control: the legacy bbox segmenter against blla GT
    rep2 = test_segmenter_on_pairs(xml_pairs_df(spark, pairs_path),
                                   segmenter="pageseg")
    assert rep2["n_pages"] == 4
    assert "pixel" not in rep2  # no heatmap head on the legacy path
    assert rep2["f1"] >= 0.8, rep2
    assert 0.5 <= rep2["detection"]["f1"] <= 1.0, rep2["detection"]


def test_pixel_metrics_against_golden_geometry():
    """The reference segtest's native metric on TRUE ground truth: the
    trained net's thresholded baseline heatmap vs the renderer's golden
    baselines rasterized exactly like the training targets — IoU >= 0.9.
    (Against VECTORIZED-output GT the same metric reads ~0.25: with a
    ~3-pooled-row band a 1-2 px baseline offset dominates the union —
    quantization sensitivity, not net quality; the e2e segtest bands
    account for it.)"""
    from kraken_spark.kernels import binarize, blla, render
    from kraken_spark.kernels.seg_metrics import (pixel_class_counts,
                                                 pixel_metrics_of,
                                                 rasterize_baselines)

    W = blla.learned_weights()
    if W is None:
        pytest.skip("learned segmentation asset absent")
    for seed, di in ((42, 0), (4242, 1)):
        d = render.render_document(seed, di)
        if d["oversized"]:
            continue
        mask = binarize.nlbin(d["img"])
        maps = blla.compute_segmentation_map_learned(mask, W)
        h, w = mask.shape
        gt = blla._pool_or(
            rasterize_baselines([l["baseline"] for l in d["lines"]], h, w), 2)
        hh = min(maps.shape[1], gt.shape[0])
        ww = min(maps.shape[2], gt.shape[1])
        m = pixel_metrics_of(
            pixel_class_counts(maps[0, :hh, :ww] >= 0.5, gt[:hh, :ww]))
        assert m["iou"] >= 0.9, (seed, di, m)
        assert m["accuracy"] >= 0.99, (seed, di, m)


def test_spark_segtrain_analog(tmp_path):
    """--train-segmenter: distributed data-parallel segmenter training on
    XML ground-truth pairs — the per-(step, page)-keyed crop draws keep
    the gradient partitioning-independent; a short run reduces the loss;
    the CLI leg writes weights that load and forward."""
    import json as _json

    import numpy as np
    import pyspark.sql.functions as F

    from kraken_spark import training
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.kernels import seg_train
    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.session import get_spark
    from kraken_spark.sources.arrow_dataset import xml_pairs_df

    spark = get_spark(app="tests-segtrain", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2, segmenter="blla")
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pairs_path = str(tmp_path / "pairs.parquet")
    (alto.join(docs.select("url", "html"), "url")
     .select("url", F.encode("document", "UTF-8").alias("xml"),
             F.col("html").alias("image"))
     .write.parquet(pairs_path))

    pages1 = training.seg_pages_from_pairs(
        xml_pairs_df(spark, pairs_path).repartition(1)).cache()
    pages2 = training.seg_pages_from_pairs(
        xml_pairs_df(spark, pairs_path).repartition(2)).cache()
    W = seg_train.init_weights(np.random.Generator(np.random.PCG64(3)))
    l1, g1, n1 = training.spark_seg_gradient(pages1, W, step=2,
                                             crops_per_page=2)
    l2, g2, n2 = training.spark_seg_gradient(pages2, W, step=2,
                                             crops_per_page=2)
    assert n1 == n2 == 4 * 2
    assert abs(l1 - l2) < 1e-9 * max(1.0, abs(l1))
    for k in g1:
        denom = max(1e-12, np.abs(g1[k]).max())
        assert np.abs(g1[k] - g2[k]).max() / denom < 1e-9, k

    # CLI leg: short run from random init reduces the weighted BCE
    out = str(tmp_path / "seg.safetensors")
    rc = main(["--input", pairs_path, "--output", out,
               "--train-segmenter", "--train-steps", "6"])
    assert rc == 0
    Wt = seg_train.load_weights(out)
    assert Wt is not None and set(Wt) == {"w0", "b0", "u", "v", "b1"}
    y = seg_train.forward_infer(np.zeros((64, 64), dtype=np.float32), Wt)
    assert y.shape == (2, 64, 64)

    rep = training.train_segmenter_from_pairs(
        spark, xml_pairs_df(spark, pairs_path),
        str(tmp_path / "seg2.safetensors"), steps=6)
    assert rep["n_pages"] == 4
    assert rep["loss_after"] < rep["loss_before"], rep


def test_segtrain_degenerate_pages_skipped(tmp_path):
    """Compile-path totality for segtrain: a 2-pixel-high page image and
    a garbage image row are skipped by the GT-map builder, never crashing
    the gradient task; the good page still trains."""
    import pyspark.sql.functions as F  # noqa: F401

    from kraken_spark import training
    from kraken_spark.kernels import png, render
    from kraken_spark.kernels.serialize import serialize
    from kraken_spark.session import get_spark
    from kraken_spark.stages import extract_document

    spark = get_spark(app="tests-segtrain-deg", cores=2,
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    d = render.render_document(1234, 3)
    row = extract_document(png.encode_png(d["img"]), "good", d["lang"],
                           gt_text=d["text"])
    good_xml = serialize(row, "alto").encode()
    tiny = png.encode_png(np.full((2, 400), 255, dtype=np.uint8))
    pairs = spark.createDataFrame(
        [("good", bytearray(good_xml), bytearray(png.encode_png(d["img"]))),
         ("tiny", bytearray(good_xml), bytearray(tiny)),
         ("junk", bytearray(b"<not-xml"), bytearray(b"\x00\x01"))],
        "url string, xml binary, image binary")
    pages = training.seg_pages_from_pairs(pairs).cache()
    assert [r.url for r in pages.select("url").collect()] == ["good"]
    W = seg_train.init_weights(np.random.Generator(np.random.PCG64(2)))
    loss, g, n = training.spark_seg_gradient(pages, W, crops_per_page=1)
    assert n == 1 and np.isfinite(loss)
