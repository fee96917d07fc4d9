"""DefaultAugmenter analog (kernels/augment.py — reference
lib/dataset/recognition.py:55-87): component behavior, gate statistics,
keyed determinism, and partitioning-independence of the augmented
distributed gradient."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import augment as aug


def _line_img(seed: int = 0, h: int = 48, w: int = 200) -> np.ndarray:
    """Ink band with an empty margin wider than any blur window, so
    reflect padding never mixes content across the boundary."""
    rng = np.random.Generator(np.random.PCG64(seed))
    img = np.zeros((h, w), dtype=np.float32)
    img[h // 3: 2 * h // 3, 6: w - 6] = rng.uniform(
        0.4, 1.0, (2 * h // 3 - h // 3, w - 12)).astype(np.float32)
    return img


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from kraken_spark.session import get_spark

    s = get_spark(app="tests-augment", cores=2, shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_random_erase_zeroes_one_fifth():
    img = np.ones((40, 100), dtype=np.float32)
    out = aug.random_erase(img, np.random.Generator(np.random.PCG64(7)))
    erased = (out == 0.0).sum()
    assert abs(erased - 0.2 * img.size) / img.size < 0.02
    # one contiguous rectangle: the zero rows/cols form single runs
    zr = np.nonzero((out == 0).any(axis=1))[0]
    assert (np.diff(zr) == 1).all()


def test_gaussian_blur_preserves_mass_reduces_variance():
    img = _line_img(1)
    for k, s in ((3, 0.8), (5, 1.7)):
        out = aug.gaussian_blur(img, k, s)
        # reflect padding conserves total mass up to float error
        assert abs(out.sum() - img.sum()) / img.sum() < 1e-4
        assert out.var() < img.var()
    # sigma->0 approaches identity
    tight = aug.gaussian_blur(img, 3, 0.05)
    assert np.abs(tight - img).max() < 1e-4


def test_warp_identity_and_rotation():
    img = _line_img(2)
    assert np.abs(aug.warp_homography(img, np.eye(3)) - img).max() < 1e-6
    # a delta spot rotates about the center to where the matrix sends it
    spot = np.zeros((41, 41), dtype=np.float32)
    spot[20, 30] = 1.0
    Hm = aug._rotation_h(41, 41, 90.0)
    out = aug.warp_homography(spot, Hm)
    yx = np.unravel_index(np.argmax(out), out.shape)
    exp = Hm @ np.array([30.0, 20.0, 1.0])  # (x, y, 1)
    assert abs(yx[1] - exp[0]) <= 1 and abs(yx[0] - exp[1]) <= 1
    assert abs(out.sum() - 1.0) < 1e-3  # bilinear mass preserved in-bounds


def test_perspective_keeps_content_shrinks_inward():
    img = np.ones((40, 120), dtype=np.float32)
    rng = np.random.Generator(np.random.PCG64(3))
    Hm = aug._perspective_h(40, 120, rng)
    out = aug.warp_homography(img, Hm)
    assert out.max() <= 1.0 + 1e-6 and out.sum() < img.sum() + 1e-3
    assert out.sum() > 0.5 * img.sum()  # distortion 0.2 is mild


def test_pipeline_gate_statistics_and_determinism():
    img = _line_img(4)
    changed = 0
    for key in range(400):
        a = aug.augment_line(img, aug.rng_for(0, key))
        b = aug.augment_line(img, aug.rng_for(0, key))
        assert a.tobytes() == b.tobytes()  # keyed: bit-reproducible
        if a.tobytes() != img.tobytes():
            changed += 1
    # P(any change) = 0.5 * (1 - 0.8^3) ~ 0.244; band around it
    assert 0.15 < changed / 400 < 0.35
    # different step -> different draw for at least some keys
    assert any(
        aug.augment_line(img, aug.rng_for(1, key)).tobytes()
        != aug.augment_line(img, aug.rng_for(0, key)).tobytes()
        for key in range(50))


def test_outputs_stay_in_range_and_shape():
    img = _line_img(5)
    for key in range(60):
        out = aug.augment_line(img, aug.rng_for(2, key))
        assert out.shape == img.shape and out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0


def test_augmented_spark_gradient_partition_independent(spark):
    """With augmentation on, the per-(step, line)-keyed RNG keeps the
    distributed gradient independent of partitioning (1 vs 3 tasks)."""
    from kraken_spark import training
    from kraken_spark.kernels import rec_train as rt

    df1 = training.generate_line_rows(spark, 990101, 3, partitions=1)
    df3 = training.generate_line_rows(spark, 990101, 3, partitions=3)
    W = rt.init_weights(np.random.Generator(np.random.PCG64(17)))
    l1, g1, n1 = training.spark_gradient(df1, W, batch=8, augment_step=5)
    l3, g3, n3 = training.spark_gradient(df3, W, batch=8, augment_step=5)
    assert n1 == n3 > 0
    assert abs(l1 - l3) < 1e-6 * max(1.0, abs(l1))
    for k in g1:
        denom = max(1e-8, np.abs(g1[k]).max())
        assert np.abs(g1[k] - g3[k]).max() / denom < 1e-5, k
    # and augmentation actually perturbs the gradient vs the clean pass
    lc, gc, _ = training.spark_gradient(df1, W, batch=8)
    assert any(np.abs(gc[k] - g1[k]).max() > 0 for k in gc)


def test_augmented_fine_tune_improves_degraded_robustness(spark):
    """The point of --augment, evidenced: fine-tuning the committed
    recognizer WITH augmentation (on clean lines) cuts the loss on
    BLURRED copies of those lines far more than the same fine-tune
    without it — blur is in the augmenter's transform family, so the
    augmented model generalizes to it. All draws are seeded, so the
    margins are deterministic on a given host; bands are kept wide.
    (Measured: asset 124.98 -> 73.9 augmented vs 119.5 plain.)"""
    import pyarrow as pa

    from kraken_spark import training
    from kraken_spark.kernels import rec_train as rt
    from kraken_spark.kernels.modelio import load_kraken_model

    if not __import__("os").path.exists(rt.ASSET):
        pytest.skip("trained recognizer asset absent")
    df = training.generate_line_rows(spark, 990301, 4, partitions=2).cache()
    b = load_kraken_model(rt.ASSET)[0]
    W0 = {k: np.asarray(v, dtype=np.float32).copy()
          for k, v in b.weights.items()}

    def blur_df(d):
        def gen(batches):
            for batch in batches:
                rows = batch.to_pylist()
                for r in rows:
                    img = np.frombuffer(r["patch"], dtype=np.float32
                                        ).reshape(r["height"], r["width"])
                    r["patch"] = aug.gaussian_blur(img, 5, 1.5).astype(
                        np.float32).tobytes()
                yield pa.RecordBatch.from_pylist(rows, schema=batch.schema)
        return d.mapInArrow(gen, training.LINES_SCHEMA)

    bl = blur_df(df).cache()
    l_base, _, n = training.spark_gradient(bl, W0, batch=8)
    Wa = training.train_spark(df, steps=10, batch=8, lr=5e-4,
                              W={k: v.copy() for k, v in W0.items()},
                              augment=True)
    Wn = training.train_spark(df, steps=10, batch=8, lr=5e-4,
                              W={k: v.copy() for k, v in W0.items()},
                              augment=False)
    l_aug, _, _ = training.spark_gradient(bl, Wa, batch=8)
    l_plain, _, _ = training.spark_gradient(bl, Wn, batch=8)
    assert l_aug < 0.8 * l_plain, (l_aug / n, l_plain / n)
    assert l_aug < 0.8 * l_base, (l_aug / n, l_base / n)


def test_warp_joint_moves_input_and_targets_together():
    x = np.zeros((40, 40), dtype=np.float64)
    tb = np.zeros_like(x)
    tr = np.zeros_like(x)
    x[20, 10] = 1.0
    tb[20, 10] = 1.0
    tr[18:23, 8:13] = 1.0
    Hm = np.array([[1, 0, 5.0], [0, 1, 3.0], [0, 0, 1]])  # translate +5,+3
    wx, wtb, wtr = aug._warp_joint(x, tb, tr, Hm)
    assert wx[23, 15] > 0.99 and wtb[23, 15] == 1.0
    assert wtr[23, 15] == 1.0 and wtr[2, 2] == 0.0
    assert set(np.unique(wtb)) <= {0.0, 1.0}  # masks stay binary


def test_augment_seg_determinism_and_stats():
    rng0 = np.random.Generator(np.random.PCG64(1))
    x = (rng0.random((60, 80)) < 0.2).astype(np.float64)
    tb = (rng0.random((60, 80)) < 0.05).astype(np.float64)
    tr = np.zeros_like(x)
    tr[10:50, 10:70] = 1.0
    changed = 0
    for key in range(300):
        a = aug.augment_seg(x, tb, tr, aug.rng_for(0, key))
        b = aug.augment_seg(x, tb, tr, aug.rng_for(0, key))
        for u, v in zip(a, b):
            assert u.tobytes() == v.tobytes()
        ax, atb, atr = a
        assert 0.0 <= ax.min() and ax.max() <= 1.0
        assert set(np.unique(atb)) <= {0.0, 1.0}
        assert set(np.unique(atr)) <= {0.0, 1.0}
        if ax.tobytes() != x.tobytes():
            changed += 1
    # P(any transform) = 0.5 * (1 - 0.8^3) ~ 0.244 (color branch no-op)
    assert 0.14 < changed / 300 < 0.36, changed / 300


def test_augment_seg_geometry_is_shared():
    """When a geometric branch fires, input and baseline target must move
    under the SAME homography — the ink/target correlation survives."""
    x = np.zeros((64, 64), dtype=np.float64)
    tb = np.zeros_like(x)
    tr = np.zeros_like(x)
    x[30:34, 10:54] = 1.0   # an ink band
    tb[31:33, 10:54] = 1.0  # its baseline band (subset of the ink)
    hits = 0
    for key in range(200):
        ax, atb, _ = aug.augment_seg(x, tb, tr, aug.rng_for(3, key))
        if atb.tobytes() == tb.tobytes():
            continue  # no geometric branch fired
        hits += 1
        # every surviving target pixel sits on warped ink (>0.25 bilinear)
        on = atb == 1.0
        assert on.sum() == 0 or (ax[on] > 0.25).mean() > 0.95, key
    assert hits > 10  # the geometric branches actually fire


def test_augmented_seg_gradient_partition_independent(spark, tmp_path):
    """segtrain --augment keeps partitioning-independence: page-keyed
    augmentation draws, 1-vs-2-partition gradient agreement."""
    import pyspark.sql.functions as F

    from kraken_spark import training
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.kernels import seg_train
    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.sources.arrow_dataset import xml_pairs_df

    docs = generate_corpus_df(spark, 3).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2, segmenter="blla")
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pairs_path = str(tmp_path / "pairs.parquet")
    (alto.join(docs.select("url", "html"), "url")
     .select("url", F.encode("document", "UTF-8").alias("xml"),
             F.col("html").alias("image"))
     .write.parquet(pairs_path))

    p1 = training.seg_pages_from_pairs(
        xml_pairs_df(spark, pairs_path).repartition(1)).cache()
    p2 = training.seg_pages_from_pairs(
        xml_pairs_df(spark, pairs_path).repartition(2)).cache()
    W = seg_train.init_weights(np.random.Generator(np.random.PCG64(9)))
    l1, g1, n1 = training.spark_seg_gradient(p1, W, step=4,
                                             crops_per_page=2, augment=True)
    l2, g2, n2 = training.spark_seg_gradient(p2, W, step=4,
                                             crops_per_page=2, augment=True)
    assert n1 == n2 > 0
    assert abs(l1 - l2) < 1e-9 * max(1.0, abs(l1))
    for k in g1:
        denom = max(1e-12, np.abs(g1[k]).max())
        assert np.abs(g1[k] - g2[k]).max() / denom < 1e-9, k
    # augmentation perturbs at least one step's gradient vs clean
    diffs = 0.0
    for st in range(4, 8):
        _, ga, _ = training.spark_seg_gradient(p1, W, step=st,
                                               crops_per_page=2, augment=True)
        _, gc, _ = training.spark_seg_gradient(p1, W, step=st,
                                               crops_per_page=2)
        diffs += sum(np.abs(ga[k] - gc[k]).max() for k in ga)
    assert diffs > 0
