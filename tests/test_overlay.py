"""Overlay renderers (kernels/overlay.py + operators/serialization.
overlay_extractions) — the reference contrib visualization scripts'
semantics: geometry drawn semi-transparently over the page, PNG-encodable
output, map-only Spark face."""

from __future__ import annotations

import numpy as np
import pytest

from kraken_spark.kernels import overlay, png


def test_polyline_and_polygon_masks():
    m = overlay._polyline_mask(20, 30, [[2, 5], [12, 5]])
    assert m[5, 2] and m[5, 12] and m[5, 7]
    assert m.sum() == 11
    pm = overlay._polygon_mask(20, 30, [[5, 5], [15, 5], [15, 15], [5, 15]])
    assert pm[10, 10] and not pm[2, 2]
    assert abs(pm.sum() - 100) <= 25  # ~10x10 fill, raster tolerance
    assert overlay._polygon_mask(20, 30, [[1, 1], [2, 2]]).sum() == 0


def test_overlay_segmentation_marks_geometry():
    img = np.full((40, 60), 200, dtype=np.uint8)
    seg = {"lines": [{"baseline": [[5, 20], [50, 20]],
                      "boundary": [[5, 12], [50, 12], [50, 24], [5, 24]]}],
           "regions": [{"boundary": [[2, 2], [58, 2], [58, 30], [2, 30]]}]}
    out = overlay.overlay_segmentation(img, seg)
    assert out.shape == (40, 60, 3) and out.dtype == np.uint8
    r, g, b = (int(out[20, 25, c]) for c in range(3))
    assert r > g and r > b  # baseline stroke is red-dominant
    rg = out[5, 40]  # region-only pixel: green-shifted
    assert int(rg[1]) > int(rg[2])
    # untouched corner stays the page gray
    assert (out[38, 58] == 200).all() or (out[39, 59] == 200).all()
    # PNG round trip
    back = png.decode_png(png.encode_png(out))
    assert back.shape == out.shape and (back == out).all()


def test_overlay_heatmap_scales_and_reddens():
    img = np.full((20, 20), 128, dtype=np.uint8)
    hm = np.zeros((10, 10))
    hm[2, 3] = 1.0  # maps to page pixels (4:6, 6:8)
    out = overlay.overlay_heatmap(img, hm, alpha=0.5)
    hot = out[4, 6]
    cold = out[0, 0]
    assert int(hot[0]) > int(cold[0]) and int(hot[1]) < int(cold[1])
    assert (cold == 128).all()


def test_overlay_alignment_cycles_colors():
    img = np.full((20, 60), 255, dtype=np.uint8)
    line = {"bbox": [0, 5, 59, 15],
            "cuts": [[2, 10], [12, 20], [22, 30]]}
    out = overlay.overlay_alignment(img, line, alpha=0.5)
    c0, c1 = out[10, 5], out[10, 15]
    assert not (c0 == c1).all()  # adjacent cuts get different colors
    assert (out[2, 2] == 255).all()  # outside the bbox untouched


def test_overlay_extractions_spark_face(tmp_path):
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.operators.serialization import overlay_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-overlay", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_corpus_df(spark, 2).localCheckpoint(eager=True)
    ext = plan_extraction(docs, num_partitions=2, segmenter="blla")
    for kind in ("segmentation", "heatmap", "alignment", "recognition"):
        rows = overlay_extractions(docs, ext, kind=kind).collect()
        assert len(rows) == 2, kind
        for r in rows:
            assert r.kind == kind and r.n_bytes == len(r.png) > 0
            im = png.decode_png(bytes(r.png))
            assert im.ndim == 3 and im.shape[2] == 3, kind
    with pytest.raises(ValueError, match="overlay kind"):
        overlay_extractions(docs, ext, kind="nope")


def test_overlay_cli_leg(tmp_path):
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-overlay-cli", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = str(tmp_path / "docs.parquet")
    generate_corpus_df(spark, 2).write.parquet(docs_path)
    out = str(tmp_path / "out")
    rc = main(["--input", docs_path, "--output", out,
               "--overlay", "segmentation"])
    assert rc == 0
    rows = spark.read.parquet(out + "_overlay_segmentation").collect()
    assert len(rows) == 2
    for r in rows:
        im = png.decode_png(bytes(r.png))
        assert im.ndim == 3 and im.shape[2] == 3


def test_extraction_cli_segmenter_and_direction(tmp_path):
    """The kraken CLI's segment options through the job: --segmenter picks
    the segmentation path for the extraction run and --text-direction
    forces the principal direction (CER stays 0 on both paths)."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-cli-seg", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = str(tmp_path / "docs.parquet")
    generate_corpus_df(spark, 2).write.parquet(docs_path)

    out1 = str(tmp_path / "out_blla")
    assert main(["--input", docs_path, "--output", out1,
                 "--segmenter", "blla"]) == 0
    r1 = spark.read.parquet(out1).select("url", "cer", "n_lines").collect()
    assert all(r.cer == 0.0 and r.n_lines > 0 for r in r1)

    out2 = str(tmp_path / "out_dir")
    assert main(["--input", docs_path, "--output", out2,
                 "--text-direction", "horizontal-lr"]) == 0
    assert spark.read.parquet(out2).count() == 2


def test_no_segmentation_mode(tmp_path):
    """The kraken ocr -s/--no-segmentation analog: each input image is
    one text line (trimmed to its ink extent), recognized through the
    shared tail — CER 0 on padded line crops; blank images recognize
    empty; the CLI flag drives it end-to-end."""
    from kraken_spark.corpus import generate_corpus_df  # noqa: F401
    from kraken_spark.job import main
    from kraken_spark.kernels import render
    from kraken_spark.session import get_spark
    from kraken_spark.stages import extract_document

    rows = []
    for seed, i in ((1234, 0), (42, 1)):
        d = render.render_document(seed, i)
        for li in (0, 1):
            l = d["lines"][li]
            x0, y0, x1, y1 = l["bbox"]
            h, w = d["img"].shape
            crop = d["img"][max(y0 - 3, 0): min(y1 + 3, h),
                            max(x0 - 3, 0): min(x1 + 3, w)]
            out = extract_document(png.encode_png(crop), f"u{seed}_{i}_{li}",
                                   d["lang"], gt_text=l["text"],
                                   no_segmentation=True)
            assert out["n_lines"] == 1 and out["cer"] == 0.0, (seed, i, li)
            rows.append((f"line://{seed}/{i}/{li}",
                         bytearray(png.encode_png(crop)), l["text"],
                         d["lang"]))
    blank = extract_document(
        png.encode_png(np.full((40, 200), 255, dtype=np.uint8)), "blank",
        "en", gt_text="", no_segmentation=True)
    assert blank["text"] == "" and not blank["guard_tripped"]

    spark = get_spark(app="tests-noseg", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    import datetime

    docs_path = str(tmp_path / "lines.parquet")
    spark.createDataFrame(
        [(u, datetime.datetime(2026, 1, 1), bytes(b), t, lg)
         for u, b, t, lg in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(docs_path)
    out = str(tmp_path / "out")
    assert main(["--input", docs_path, "--output", out,
                 "--no-segmentation"]) == 0
    got = spark.read.parquet(out).select("url", "cer", "n_lines").collect()
    assert len(got) == 4 and all(r.cer == 0.0 and r.n_lines == 1 for r in got)


def test_nlbin_cli_knobs(tmp_path):
    """kraken binarize hyperparameters through the job CLI: defaults keep
    CER 0; an extreme --threshold visibly changes the extraction (the
    knob genuinely reaches the kernel)."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.job import main
    from kraken_spark.session import get_spark

    spark = get_spark(app="tests-nlbin-cli", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = str(tmp_path / "docs.parquet")
    generate_corpus_df(spark, 2).write.parquet(docs_path)

    out1 = str(tmp_path / "out_default")
    assert main(["--input", docs_path, "--output", out1,
                 "--threshold", "0.5", "--escale", "1.0"]) == 0
    r1 = spark.read.parquet(out1).select("cer", "n_lines").collect()
    assert all(r.cer == 0.0 and r.n_lines > 0 for r in r1)

    out2 = str(tmp_path / "out_extreme")
    assert main(["--input", docs_path, "--output", out2,
                 "--threshold", "0.99"]) == 0
    r2 = spark.read.parquet(out2).select("n_lines").collect()
    assert sum(r.n_lines for r in r2) < sum(r.n_lines for r in r1)
