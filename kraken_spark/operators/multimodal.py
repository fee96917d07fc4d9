"""Multimodal / alignment queries over the binary page-image column.

The training-data-pipeline operators a 100 TB corpus needs beyond the
reference's own surface (task brief): treating the `html BINARY` column as
an opaque image payload with typed metadata and running decode /
feature-extract / resize inside Arrow-batched UDFs. Unlike the stubbed
decode the brief allows, this engine ships a real pure-numpy PNG codec, so
the whole chain is real and tested:

- x_image_features: one decode pass emitting the 64-dim tile-intensity
  embedding per page (8x8 block means — the embedding feeding ANN/cosine
  queries, exposed array-typed via x_doc_embeddings), the 64x64
  block-mean thumbnail PNG (the "resize/frame-sample" plumbing: schema,
  batching, binary-out UDF), AND the 64-bit perceptual dHash with its
  collision-cluster size (image near-dup dedup, the visual analog of
  functions/dedup.py).
- x_forced_align: CTC trellis alignment of the recognized text back onto
  each line (kernels/align.py; /root/reference/kraken/align.py:42-85),
  reporting cut agreement with recognition — 1.0 everywhere on the corpus.
- x_frame_sample: binary media clips -> frame explode -> stride-2 frame
  sampler -> per-frame features (the video frame-sampling plumbing; the
  page codec stands in for a video decoder, which this container lacks).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..corpus import corpus_for
from .extraction import _ordered


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return corpus_for(spark, sf)


def block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize via integral image — exact block means for any
    size ratio, O(n), pure numpy."""
    h, w = img.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img, axis=0, dtype=np.float64), axis=1)
    ys = np.linspace(0, h, out_h + 1).round().astype(np.int64)
    xs = np.linspace(0, w, out_w + 1).round().astype(np.int64)
    a = ii[ys[:-1]][:, xs[:-1]]
    b = ii[ys[:-1]][:, xs[1:]]
    c = ii[ys[1:]][:, xs[:-1]]
    d = ii[ys[1:]][:, xs[1:]]
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return ((d - b - c + a) / np.maximum(areas, 1)).astype(np.float32)


def page_embedding(img: np.ndarray, grid: int = 8) -> np.ndarray:
    """Normalized tile-intensity embedding (grid x grid block means,
    zero-mean, unit-norm)."""
    e = block_mean_resize(img, grid, grid).ravel() / 255.0
    e = e - e.mean()
    n = float(np.linalg.norm(e))
    return (e / n if n > 0 else e).astype(np.float32)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 8x9 block means, bit = left<right."""
    g = block_mean_resize(img, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 63)  # signed 64-bit for BIGINT columns


def _doc_embeddings_raw(spark, sf) -> DataFrame:
    """Decode page -> 64-dim embedding column, UNORDERED: the mapInArrow
    stays on the corpus's natural partitioning so downstream consumers
    (the LSH signature stage in x_page_knn) compute in parallel. Only the
    registered x_doc_embeddings output applies the single-partition
    deterministic ordering."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import png

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("lang", pa.string()),
                pa.field("embedding", pa.list_(pa.float32())),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                img = png.to_grayscale(png.decode_png(r["html"]))
                out.append(
                    {
                        "url": r["url"],
                        "lang": r["lang"],
                        "embedding": page_embedding(img).tolist(),
                    }
                )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    return _docs(spark, sf).mapInArrow(
        fn, schema="url string, lang string, embedding array<float>"
    )


def x_doc_embeddings(spark, sf):
    """Decode page -> 64-dim embedding column (array<float>)."""
    return _ordered(_doc_embeddings_raw(spark, sf), "url")


def x_image_features(spark, sf):
    """Decode each page ONCE and emit every multimodal feature family
    (driver-window consolidation of x_doc_embeddings + x_thumbnails +
    the former x_phash_dedup): the 64-dim tile-intensity embedding
    (serialized to JSON — the driver's canonicalization cannot sort array
    cells; the array-typed form feeding ANN lives in x_doc_embeddings/
    x_page_knn), the 64x64 block-mean thumbnail PNG (reported as size +
    md5 so the binary round-trip is value-checked without shipping bytes
    through the driver's sorter), and the 64-bit perceptual dHash with its
    cluster size (n_same_phash: a window count over the hash — the
    perceptual-dedup signal, one tiny shuffle on the 8-byte key)."""
    import hashlib

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import png

        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("lang", pa.string()),
                pa.field("src_w", pa.int32()),
                pa.field("src_h", pa.int32()),
                pa.field("emb_json", pa.string()),
                pa.field("emb_norm", pa.float64()),
                pa.field("thumb_bytes", pa.int32()),
                pa.field("thumb_md5", pa.string()),
                pa.field("phash", pa.int64()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                img = png.to_grayscale(png.decode_png(r["html"]))
                emb = page_embedding(img)
                th = np.clip(block_mean_resize(img, 64, 64), 0, 255).astype(np.uint8)
                tb = png.encode_png(th)
                out.append(
                    {
                        "url": r["url"],
                        "lang": r["lang"],
                        "src_w": img.shape[1],
                        "src_h": img.shape[0],
                        "emb_json": "[" + ",".join(f"{v:.6f}" for v in emb) + "]",
                        "emb_norm": round(float(np.linalg.norm(emb)), 6),
                        "thumb_bytes": len(tb),
                        "thumb_md5": hashlib.md5(tb).hexdigest(),
                        "phash": dhash64(img),
                    }
                )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    from pyspark.sql import Window

    feats = _docs(spark, sf).mapInArrow(
        fn,
        schema="url string, lang string, src_w int, src_h int, emb_json string, "
        "emb_norm double, thumb_bytes int, thumb_md5 string, phash bigint",
    )
    return _ordered(
        feats.withColumn(
            "n_same_phash", F.count("*").over(Window.partitionBy("phash"))
        ),
        "url",
    )


def x_forced_align(spark, sf):
    """Recognize each page, then force-align the recognized text back onto
    every line; report per-url alignment coverage and cut agreement
    (1.0/1.0 on the corpus — asserted in tests)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import binarize, lineextract, pageseg, png
        from ..kernels.align import forced_align
        from ..stages import _get_model

        model, codec = _get_model()
        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("n_lines", pa.int32()),
                pa.field("n_aligned", pa.int32()),
                pa.field("cut_agreement", pa.float64()),
            ]
        )
        for batch in batches:
            out = []
            for r in batch.to_pylist():
                url = r["url"]
                try:
                    img = png.to_grayscale(png.decode_png(r["html"]))
                    mask = binarize.nlbin(img)
                    seg = pageseg.segment(mask, url=url)
                    from ..kernels.recognizer import recognize_line

                    n_lines = len(seg["lines"])
                    n_aligned = 0
                    agree = 0
                    total = 0
                    for l in seg["lines"]:
                        strip, _ = lineextract.extract_line(mask, l)
                        rec = recognize_line(
                            model, codec, strip, base_dir="L", bidi_reordering=False
                        )
                        if not rec["prediction"]:
                            continue
                        ali = forced_align(model, codec, strip, rec["prediction"])
                        if ali is None:
                            continue
                        n_aligned += 1
                        total += len(rec["cuts"])
                        agree += sum(
                            1 for a, b in zip(ali["cuts"], rec["cuts"]) if a == b
                        )
                    out.append(
                        {
                            "url": url,
                            "n_lines": n_lines,
                            "n_aligned": n_aligned,
                            "cut_agreement": agree / total if total else None,
                        }
                    )
                except Exception:
                    out.append(
                        {
                            "url": url,
                            "n_lines": 0,
                            "n_aligned": 0,
                            "cut_agreement": None,
                        }
                    )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    return _ordered(
        _docs(spark, sf).mapInArrow(
            fn,
            schema="url string, n_lines int, n_aligned int, cut_agreement double",
        ),
        "url",
    )


def x_page_knn(spark, sf):
    """ANN over the pipeline's OWN page embeddings: decode -> 64-dim tile
    embedding -> multi-table hyperplane-LSH candidate generation (the
    similarity operators' bucketed join, functions/similarity._lsh_tables)
    -> exact cosine rerank, top-3 per page. No crossJoin anywhere: the
    candidate set per page is its LSH bucket population, so the pair count
    stays ~N*bucket_size instead of the N^2 cartesian a brute-force page
    kNN costs at corpus scale. Recall vs exact brute force is pinned in
    tests/test_multimodal.py (same-layout pages sit at high cosine, where
    hyperplane LSH recall is strong).

    Plan shape (100 TB): the signature stage runs over the UNORDERED
    embedding DF (_doc_embeddings_raw) so the 24 plane-dot aggregates and
    the band explode parallelize across the corpus's input partitions —
    no single-partition exchange below the bucket join's shuffle
    (guarded by tests/test_plan_shapes.py)."""
    from ..functions.similarity import BUCKET_CAP, _lsh_tables

    emb = _doc_embeddings_raw(spark, sf)
    # bucket_cap bounds the self-join to cap^2 pairs per bucket even on a
    # degenerate corpus (near-constant embeddings -> one giant bucket);
    # capped rows carry bucket_truncated, surfaced per query page below
    tabled = _lsh_tables(emb, bucket_cap=BUCKET_CAP, order_col="url")
    a = tabled.select(
        F.col("url").alias("a_url"),
        F.col("lang").alias("a_lang"),
        F.col("embedding").alias("a_emb"),
        "tbl",
        F.col("bucket").alias("ab"),
        F.col("bucket_truncated").alias("a_trunc"),
    )
    b = tabled.select(
        F.col("url").alias("b_url"),
        F.col("lang").alias("b_lang"),
        F.col("embedding").alias("b_emb"),
        "tbl",
        F.col("bucket").alias("bb"),
        F.col("bucket_truncated").alias("b_trunc"),
    )
    pairs = (
        a.join(
            b,
            (a.tbl == b.tbl) & (F.col("ab") == F.col("bb")) & (F.col("a_url") != F.col("b_url")),
        )
        .select(
            "a_url", "a_lang", "a_emb", "b_url", "b_lang", "b_emb",
            (F.col("a_trunc") | F.col("b_trunc")).alias("trunc"),
        )
        .groupBy("a_url", "b_url")
        .agg(
            F.first("a_lang").alias("a_lang"),
            F.first("a_emb").alias("a_emb"),
            F.first("b_lang").alias("b_lang"),
            F.first("b_emb").alias("b_emb"),
            F.max("trunc").alias("trunc"),
        )
    )
    dot = (
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a_url").orderBy(F.desc("cos"), "b_url")
    return _ordered(
        pairs.withColumn("cos", F.round(F.expr(dot), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        # candidates_truncated: this page's candidate set touched a capped
        # bucket — the top-3 may be partial (no silent cap)
        .select("a_url", "a_lang", "b_url", "b_lang", "cos", "rk",
                F.col("trunc").alias("candidates_truncated")),
        "a_url",
        "rk",
    )


def x_frame_sample(spark, sf):
    """Video-style frame sampling over real animated-media blobs (task
    brief: multimodal columns as binary + typed metadata, decode /
    frame-sample as Arrow-batched UDFs): consecutive corpus pages are
    transcoded into 4-frame animated-PNG clips (APNG acTL/fcTL/fdAT,
    kernels/png.encode_apng — a real multi-frame container standard), the
    clip is decoded with full compose semantics (sub-rect placement +
    dispose ops, png.decode_apng), every 2nd composited frame is sampled
    (the standard stride sampler), and each sampled frame gets the tile
    embedding + dHash features. Emits per-clip frame counts and
    per-sampled-frame feature stats. A production deployment swaps the
    APNG codec for a hardware video codec without touching the plan."""
    from typing import Iterator as _It

    def pack(batches: _It[pa.RecordBatch]) -> _It[pa.RecordBatch]:
        from ..kernels import png

        schema = pa.schema(
            [
                pa.field("clip_url", pa.string()),
                pa.field("n_frames", pa.int32()),
                pa.field("media", pa.binary()),
            ]
        )
        from ..kernels import gif

        for batch in batches:
            out = []
            for r in batch.to_pylist():
                # transcode the member pages into ONE animated clip —
                # alternating by doc index between the two real container
                # standards: APNG (acTL/fcTL/fdAT, kernels/png.py) and
                # animated GIF (GCE frames + GIF-LZW, kernels/gif.py);
                # both compose to identical frames, so the downstream
                # features are container-invariant
                imgs = [png.to_grayscale(png.decode_png(f["html"]))
                        for f in r["frames"]]
                doc_idx = int(r["first_url"].rsplit("-", 1)[-1])
                if doc_idx % 2:
                    media = gif.encode_gif([{"img": im} for im in imgs])
                else:
                    media = png.encode_apng(imgs)
                out.append(
                    {
                        "clip_url": r["first_url"] + "/clip",
                        "n_frames": len(imgs),
                        "media": media,
                    }
                )
            if out:
                yield pa.RecordBatch.from_pylist(out, schema=schema)

    def sample(batches: _It[pa.RecordBatch]) -> _It[pa.RecordBatch]:
        from ..kernels import png

        schema = pa.schema(
            [
                pa.field("clip_url", pa.string()),
                pa.field("frame_idx", pa.int32()),
                pa.field("n_frames", pa.int32()),
                pa.field("frame_h", pa.int32()),
                pa.field("frame_w", pa.int32()),
                pa.field("emb_norm", pa.float64()),
                pa.field("dhash", pa.int64()),
            ]
        )
        from ..kernels import gif

        for batch in batches:
            out = []
            for r in batch.to_pylist():
                media = bytes(r["media"])
                if media[:6] in (b"GIF87a", b"GIF89a"):
                    frames = gif.gif_frames(media)
                else:
                    frames, _delays = png.decode_apng(media)
                for i in range(0, len(frames), 2):  # stride-2 frame sampler
                    img = png.to_grayscale(frames[i])
                    emb = page_embedding(img)
                    out.append(
                        {
                            "clip_url": r["clip_url"],
                            "frame_idx": i,
                            "n_frames": r["n_frames"],
                            "frame_h": img.shape[0],
                            "frame_w": img.shape[1],
                            "emb_norm": round(float(np.linalg.norm(emb)), 6),
                            "dhash": dhash64(img),
                        }
                    )
            yield pa.RecordBatch.from_pylist(out, schema=schema)

    # Clip membership is a pure function of the url (page index // 4 within
    # lang), so clip identity is independent of partitioning and core count;
    # the groupBy shuffles on the clip key — bounded 4 frames per group.
    page_idx = F.regexp_extract("url", r"page-(\d+)$", 1).cast("long")
    keyed = _docs(spark, sf).select(
        "url",
        "html",
        "lang",
        (page_idx / 4).cast("long").alias("clip_no"),
        page_idx.alias("page_idx"),
    ).filter(F.col("page_idx").isNotNull())
    # ^ documents whose urls don't carry a page index (e.g. curved-* docs)
    # are not clip members — without the filter they'd all collapse into
    # one unbounded null-keyed group per lang
    grouped = keyed.groupBy("lang", "clip_no").agg(
        F.min("url").alias("first_url"),
        F.sort_array(F.collect_list(F.struct("page_idx", "html"))).alias("frames"),
    )
    clips = grouped.select("first_url", "frames").mapInArrow(
        pack, schema="clip_url string, n_frames int, media binary"
    )
    return _ordered(
        clips.mapInArrow(
            sample,
            schema="clip_url string, frame_idx int, n_frames int, frame_h int, "
            "frame_w int, emb_norm double, dhash bigint",
        ),
        "clip_url",
        "frame_idx",
    )


def audio_features(docs: DataFrame, frame: int = 512) -> DataFrame:
    """Audio-modality features over real RIFF/WAV PCM blobs (task brief:
    audio as binary + typed metadata). The decode is the pure-numpy WAV
    reader in kernels/wav.py (8/16/24/32-bit int and float PCM, stereo
    downmix); features per clip are duration, RMS energy, zero-crossing
    rate, and the dominant-frequency bin from an FFT over fixed-size
    frames. Malformed/non-WAV blobs yield a guard row (decode_ok=false)
    instead of failing the task — at 100 TB a single bad container must
    never kill a stage.

    Library function + pytest (not a driver query: the 50-entry catalog is
    full; the distributed path is exercised in tests/test_multimodal.py).
    """

    def fn(pdfs):
        import pandas as pd

        from ..kernels.wav import WavError, read_wav

        cols = ["url", "decode_ok", "sample_rate", "duration_s", "n_frames",
                "rms", "zcr", "dominant_hz"]
        for pdf in pdfs:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    sr, pcm = read_wav(bytes(r["html"] or b""))
                except WavError:
                    rows.append({"url": r["url"], "decode_ok": False,
                                 "sample_rate": 0, "duration_s": 0.0,
                                 "n_frames": 0, "rms": 0.0, "zcr": 0.0,
                                 "dominant_hz": 0.0})
                    continue
                frames = pcm[: (len(pcm) // frame) * frame].reshape(-1, frame)
                rms = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
                zcr = (float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
                       if len(pcm) > 1 else 0.0)
                if frames.size:
                    spec = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
                    dom_hz = float((np.argmax(spec[1:]) + 1) * sr / frame)
                else:
                    dom_hz = 0.0
                rows.append({"url": r["url"], "decode_ok": True,
                             "sample_rate": int(sr),
                             "duration_s": round(len(pcm) / sr, 6) if sr else 0.0,
                             "n_frames": int(frames.shape[0]),
                             "rms": round(rms, 6), "zcr": round(zcr, 6),
                             "dominant_hz": round(dom_hz, 3)})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("url", "html").mapInPandas(
        fn,
        schema="url string, decode_ok boolean, sample_rate int, "
        "duration_s double, n_frames int, rms double, zcr double, "
        "dominant_hz double",
    )


QUERIES = {
    "x_image_features": (x_image_features, None),
    "x_page_knn": (x_page_knn, None),
    "x_forced_align": (x_forced_align, None),
    "x_frame_sample": (x_frame_sample, None),
}
