"""Multimodal query-plan tests: LSH page-kNN recall vs exact brute force,
and the dedup scale guards (Jaccard df cap, SimHash no-explode plan).
"""

from __future__ import annotations

import pytest

pyspark = pytest.importorskip("pyspark")

import pyspark.sql.functions as F  # noqa: E402

from kraken_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-mm", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _bruteforce_page_knn(spark, sf, k=3):
    """Exact top-k cosine per page over the same tile embeddings —
    the recall reference for the LSH-bucketed x_page_knn."""
    from kraken_spark.operators.multimodal import x_doc_embeddings

    emb = x_doc_embeddings(spark, sf)
    dot = (
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    a = emb.select(F.col("url").alias("a_url"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("url").alias("b_url"), F.col("embedding").alias("b_emb"))
    from pyspark.sql import Window

    w = Window.partitionBy("a_url").orderBy(F.desc("cos"), "b_url")
    return (
        a.crossJoin(b)
        .filter(F.col("a_url") != F.col("b_url"))
        .withColumn("cos", F.round(F.expr(dot), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a_url", "b_url")
    )


def test_page_knn_lsh_recall(spark):
    """The LSH-bucketed x_page_knn must recover most of the exact top-3
    neighbor pairs (tile embeddings of same-layout pages sit at high
    cosine, where hyperplane LSH agreement is strong)."""
    from kraken_spark.operators.multimodal import x_page_knn

    exact = {(r.a_url, r.b_url) for r in _bruteforce_page_knn(spark, SF).collect()}
    got = {(r.a_url, r.b_url) for r in x_page_knn(spark, SF).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, f"page-kNN LSH recall {recall:.2f} < 0.7"


def test_page_knn_plan_has_no_cartesian(spark):
    """The candidate join must be an equi-join on (tbl, bucket) — no
    CartesianProduct / BroadcastNestedLoopJoin in the physical plan."""
    from kraken_spark.operators.multimodal import x_page_knn

    plan = x_page_knn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_df_cap_drops_hot_shingles(spark, tmp_path, monkeypatch):
    """A shingle present in more than DF_CAP documents must not generate
    candidate pairs: docs sharing ONLY boilerplate stay un-paired, while
    genuine near-duplicates still pair."""
    import kraken_spark.functions.dedup as dd

    monkeypatch.setattr(dd, "DF_CAP", 4)
    boiler = "all rights reserved worldwide under the berne convention " * 4
    uniq = [f"document number {i} body {'x%d ' % i * 30}" for i in range(8)]
    rows = [(i, boiler + uniq[i], "en", "t", len(boiler)) for i in range(8)]
    # two true near-dups sharing a long rare tail
    tail = " ".join(f"zq{i}" for i in range(120))
    rows.append((100, "alpha " + tail, "en", "t", 10))
    rows.append((101, "alphb " + tail, "en", "t", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    pairs = dd.dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (100, 101) in got, "true near-dup pair lost by the df cap"
    # boilerplate shingles have df=8 > 4 -> no pair among docs 0..7
    assert all(a >= 100 for a, b in got), f"hot-shingle pairs leaked: {got}"


def test_audio_features_real_wav(spark):
    """Audio modality end-to-end on REAL RIFF/WAV PCM bytes: pure-tone
    clips with closed-form RMS/ZCR, dominant-frequency recovery, and a
    garbage blob that must yield a guard row, not a crash."""
    import numpy as np

    from kraken_spark.kernels.wav import sine_clip, write_wav
    from kraken_spark.operators.multimodal import audio_features

    sr = 16000
    # 1000 Hz divides the 512-sample frame size evenly (32 cycles/frame)
    a = sine_clip(1000.0, 1.0, sr, amplitude=0.6)
    b = sine_clip(2500.0, 1.0, sr, amplitude=0.6)
    stereo = write_wav(
        np.repeat(0.25 * np.sin(2 * np.pi * 500.0 * np.arange(sr) / sr), 2),
        sr, channels=2)
    docs = spark.createDataFrame(
        [("a", a), ("b", b), ("c", a), ("s", stereo), ("junk", b"<html>no")],
        "url string, html binary",
    )
    rows = {r.url: r for r in audio_features(docs).collect()}
    assert len(rows) == 5
    assert not rows["junk"].decode_ok and rows["junk"].n_frames == 0
    ok = [rows[k] for k in ("a", "b", "c", "s")]
    assert all(r.decode_ok and r.sample_rate == sr and r.duration_s == 1.0
               and r.n_frames == 31 for r in ok)
    # closed-form: RMS of a full-period sine = A/sqrt(2); ZCR = 2*f0/sr
    assert rows["a"].rms == pytest.approx(0.6 / np.sqrt(2), abs=1e-4)
    assert rows["a"].zcr == pytest.approx(2 * 1000 / sr, abs=1e-3)
    assert rows["s"].rms == pytest.approx(0.25 / np.sqrt(2), abs=1e-4)
    # dominant frequency recovered from the FFT (bin width sr/512 = 31.25 Hz)
    assert abs(rows["a"].dominant_hz - 1000.0) <= 31.25
    assert abs(rows["b"].dominant_hz - 2500.0) <= 31.25
    assert abs(rows["s"].dominant_hz - 500.0) <= 31.25
    # determinism: identical bytes -> identical features
    assert rows["a"].rms == rows["c"].rms
    assert rows["a"].dominant_hz == rows["c"].dominant_hz


def test_wav_codec_roundtrip():
    """WAV kernel: every supported encoding round-trips within its
    quantization error; extra chunks and stereo downmix handled."""
    import struct

    import numpy as np
    import pytest as _pytest

    from kraken_spark.kernels.wav import WavError, read_wav, write_wav

    rng = np.random.default_rng(7)
    x = np.clip(rng.standard_normal(777) * 0.3, -1, 1)
    # int encodes are asymmetric by spec (scale 2^(b-1)-1 up, 2^(b-1)
    # down) so the bound is ~(1+|x|)/2^(b-1), not 1/(2^(b-1)-1)
    for bits, tol in ((8, 1 / 64), (16, 1 / 16384), (32, 1e-9), (-32, 1e-7)):
        sr, y = read_wav(write_wav(x, 8000, bits=bits))
        assert sr == 8000 and len(y) == len(x)
        assert np.max(np.abs(y - x)) <= tol + 1e-12
    # stereo: L/R average
    inter = np.empty(200)
    inter[0::2], inter[1::2] = 0.5, -0.1
    _, mono = read_wav(write_wav(inter, 8000, bits=-32, channels=2))
    assert np.allclose(mono, 0.2, atol=1e-7)
    # a LIST chunk between fmt and data must be skipped
    blob = bytearray(write_wav(x[:10], 8000))
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    blob = blob[:36] + extra + blob[36:]
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    sr, y = read_wav(bytes(blob))
    assert sr == 8000 and len(y) == 10
    # 24-bit: hand-pack a known triple (-1 -> 0xFFFFFF sign-extended)
    fmt24 = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    data24 = b"\xff\xff\xff" + b"\x00\x00\x40"  # -1/2^23, +2^22/2^23
    wav24 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt24) + 8 + len(data24))
             + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt24)) + fmt24
             + b"data" + struct.pack("<I", len(data24)) + data24)
    _, y24 = read_wav(wav24)
    assert y24[0] == _pytest.approx(-1 / 2 ** 23)
    assert y24[1] == _pytest.approx(0.5)
    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"OggS" + b"\0" * 40):
        with _pytest.raises(WavError):
            read_wav(bad)


def test_simhash_plan_has_no_bit_explode(spark):
    """The SimHash plan must contain exactly one generator (the word
    explode) — the per-bit explode would multiply shuffle volume 32x."""
    from kraken_spark.functions.dedup import dedup_simhash

    plan = dedup_simhash(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") <= 1


def test_apng_codec_roundtrip_and_compose():
    """APNG kernel: frame round-trip, sub-rect composition with dispose
    ops (none/background/previous), and truncation/garbage rejection."""
    import struct

    import numpy as np
    import pytest as _pytest

    from kraken_spark.kernels.png import (_chunk, _compress_frame, _SIGNATURE,
                                          decode_apng, encode_apng, is_apng)

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, (24, 17), dtype=np.uint8) for _ in range(6)]
    blob = encode_apng(frames, delay_ms=40)
    assert is_apng(blob)
    out, delays = decode_apng(blob)
    assert len(out) == 6
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))
    assert delays == [0.04] * 6
    # RGB frames
    rgb = [rng.integers(0, 255, (8, 9, 3), dtype=np.uint8) for _ in range(2)]
    out_rgb, _ = decode_apng(encode_apng(rgb))
    assert all(np.array_equal(a, b) for a, b in zip(out_rgb, rgb))
    # plain PNG is not an animation
    from kraken_spark.kernels.png import encode_png
    assert not is_apng(encode_png(frames[0]))
    with _pytest.raises(ValueError):
        decode_apng(encode_png(frames[0]))

    # hand-build: full first frame w/ dispose 2 (previous), then a sub-rect
    # frame at (2,3) with dispose 0 -> third frame must see frame1 restored
    # under a fresh sub-rect
    def fctl(seq, w, h, x, y, dispose):
        return _chunk(b"fcTL",
                      struct.pack(">IIIIIHHBB", seq, w, h, x, y, 1, 10, dispose, 0))

    f0 = np.full((10, 10), 100, np.uint8)
    sub = np.full((4, 4), 7, np.uint8)
    sub2 = np.full((4, 4), 250, np.uint8)
    raw = (_SIGNATURE
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0))
           + _chunk(b"acTL", struct.pack(">II", 3, 0))
           + fctl(0, 10, 10, 0, 0, 0)
           + _chunk(b"IDAT", _compress_frame(f0))
           + fctl(1, 4, 4, 3, 2, 2)
           + _chunk(b"fdAT", struct.pack(">I", 2) + _compress_frame(sub))
           + fctl(3, 4, 4, 5, 6, 0)
           + _chunk(b"fdAT", struct.pack(">I", 4) + _compress_frame(sub2))
           + _chunk(b"IEND", b""))
    got, _ = decode_apng(raw)
    assert np.array_equal(got[0], f0)
    # frame 1: sub composited over f0
    exp1 = f0.copy(); exp1[2:6, 3:7] = 7
    assert np.array_equal(got[1], exp1)
    # frame 2: dispose=2 reverted sub region to f0, then sub2 at (5,6)
    exp2 = f0.copy(); exp2[6:10, 5:9] = 250
    assert np.array_equal(got[2], exp2)
