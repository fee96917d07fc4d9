"""Line-parallel loaded-model extraction (pipeline_lines.py) must match
the fused plan row-for-row: predictions/cuts/geometry EXACT, confidences
to float tolerance (the tests/test_batched_rpred.py contract — chunk
composition differs between plans, which only moves GEMM rounding at the
ulp level). wall_ms/partition_id are timing/placement metrics and are
excluded."""

from __future__ import annotations

import os

import numpy as np
import pytest

from kraken_spark.kernels.rec_train import ASSET as REC_ASSET

pytestmark = pytest.mark.skipif(
    not os.path.exists(REC_ASSET), reason="trained recognizer asset missing")


@pytest.fixture(scope="module")
def spark():
    from kraken_spark.session import get_spark

    s = get_spark(app="tests-line-parallel", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows_by_url(df):
    return {r["url"]: r.asDict(recursive=True) for r in df.collect()}


def _assert_row_parity(a: dict, b: dict):
    for k in ("wall_ms", "partition_id"):
        a.pop(k), b.pop(k)
    la, lb = a.pop("lines"), b.pop("lines")
    assert a == b
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        cx, cy = x.pop("confidences"), y.pop("confidences")
        assert x == y
        assert np.allclose(cx or [], cy or [], atol=1e-5)


def test_line_parallel_matches_fused_plan(spark):
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.pipeline_lines import plan_extraction_line_parallel

    docs = generate_corpus_df(spark, 8).localCheckpoint(eager=True)
    fused = _rows_by_url(plan_extraction(
        docs, num_partitions=4, segmenter="blla",
        kraken_model_path=REC_ASSET))
    lp = _rows_by_url(plan_extraction_line_parallel(
        docs, num_partitions=4, segmenter="blla",
        kraken_model_path=REC_ASSET, line_partitions=8))
    assert set(fused) == set(lp)
    assert any(r["n_lines"] > 0 for r in fused.values())
    for url in fused:
        _assert_row_parity(fused[url], lp[url])


def test_line_parallel_handles_preseg_and_garbage(spark):
    """Non-image payloads (XML: complete in prepare) and garbage bytes
    (guard-tripped complete row) flow through the line-parallel plan
    exactly like the fused one."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.pipeline_lines import plan_extraction_line_parallel

    docs = generate_corpus_df(spark, 2).localCheckpoint(eager=True)
    alto = serialize_extractions(
        plan_extraction(docs, num_partitions=2), "alto").collect()
    mixed = spark.createDataFrame(
        [(r.url + "#alto", bytearray(r.document.encode("utf-8")), "", "en")
         for r in alto]
        + [("garbage://1", bytearray(b"\x00\x01notapng"), "", "en"),
           ("nullhtml://1", None, "", "en")],
        "url string, html binary, text string, lang string",
    ).localCheckpoint(eager=True)
    fused = _rows_by_url(plan_extraction(
        mixed, num_partitions=2, kraken_model_path=REC_ASSET))
    lp = _rows_by_url(plan_extraction_line_parallel(
        mixed, num_partitions=2, kraken_model_path=REC_ASSET,
        line_partitions=4))
    assert set(fused) == set(lp)
    assert fused["garbage://1"]["guard_tripped"]
    # NULL html must survive BOTH plans as a guard row, not a task abort
    # (the payload sniff runs before _prepare_one's try)
    assert fused["nullhtml://1"]["guard_tripped"]
    assert lp["nullhtml://1"]["guard_tripped"]
    for url in fused:
        _assert_row_parity(fused[url], lp[url])


def test_line_parallel_vertical_direction_parity(spark):
    """Vertical pages (rotate-segment-unrotate geometry, cut spans mapped
    through the page-y axis in assembly) stay row-identical through the
    line-parallel split."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.pipeline_lines import plan_extraction_line_parallel

    docs = generate_corpus_df(spark, 3).localCheckpoint(eager=True)
    fused = _rows_by_url(plan_extraction(
        docs, num_partitions=2, text_direction="vertical",
        kraken_model_path=REC_ASSET))
    lp = _rows_by_url(plan_extraction_line_parallel(
        docs, num_partitions=2, text_direction="vertical",
        kraken_model_path=REC_ASSET, line_partitions=4))
    assert set(fused) == set(lp)
    for url in fused:
        _assert_row_parity(fused[url], lp[url])


def test_line_parallel_requires_model_path(spark):
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline_lines import plan_extraction_line_parallel

    with pytest.raises(ValueError, match="loaded-model"):
        plan_extraction_line_parallel(generate_corpus_df(spark, 1))


def test_run_extraction_line_parallel_commits_same_rows(spark, tmp_path):
    """run_extraction(line_parallel=True) — the job.py --line-parallel
    path — persists the same extraction rows as the fused plan (text,
    counts, cer), end-to-end through the parquet sink."""
    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline import run_extraction

    docs = generate_corpus_df(spark, 4).localCheckpoint(eager=True)
    out_a = str(tmp_path / "fused")
    out_b = str(tmp_path / "lp")
    run_extraction(docs, out_path=out_a, kraken_model_path=REC_ASSET)
    run_extraction(docs, out_path=out_b, kraken_model_path=REC_ASSET,
                   line_parallel=True)
    key = ["url", "text", "n_lines", "n_regions", "cer", "guard_tripped"]
    a = sorted(spark.read.parquet(out_a).select(key).collect())
    b = sorted(spark.read.parquet(out_b).select(key).collect())
    assert a == b and len(a) == 4


def _run_lp_stages(html, text, monkeypatch=None):
    """Drive the line-parallel stage functions in-process (no Spark):
    _prepare_one -> make_recognize_map -> make_assemble; returns the one
    assembled page row as a dict."""
    import pyarrow as pa

    from kraken_spark.pipeline_lines import (_PREP_ARROW, _prepare_one,
                                             make_assemble,
                                             make_recognize_map)

    rows = _prepare_one(html, "http://z/p0", "en", text, "pageseg",
                        None, REC_ASSET, False, 1.0, None)
    batch = pa.RecordBatch.from_pylist(rows, schema=_PREP_ARROW)
    rec_batches = list(make_recognize_map(REC_ASSET, 1.0)(iter([batch])))
    out = make_assemble()(pa.Table.from_batches(rec_batches))
    rows = out.to_pylist()
    assert len(rows) == 1
    return rows[0]


def test_zero_area_line_tensor_guards_whole_page(monkeypatch):
    """A degenerate (zero-area) line tensor makes the fused path raise
    inside recognize_lines -> whole page guard-tripped. In the split plan
    the crop-local prep now runs in the RECOGNIZE stage: the line must be
    flagged `failed` and assembly must emit exactly the fused plan's
    guard-tripped empty page row."""
    import numpy as np

    from kraken_spark.kernels import png, render
    from kraken_spark.kernels.rpred_parity import LoadedRecognizer
    from kraken_spark.stages import extract_document

    monkeypatch.setattr(
        LoadedRecognizer, "_prep_baseline_u8_from_crop",
        lambda self, *a, **k: (np.empty((48, 0), dtype=np.uint8), 10))
    monkeypatch.setattr(
        LoadedRecognizer, "_prep_bbox_u8_from_crop",
        lambda self, *a, **k: (np.empty((48, 0), dtype=np.uint8), 10))
    d = render.render_document(1234, 0)
    html, text = png.encode_png(d["img"]), d["text"]
    fused = extract_document(html, "http://z/p0", "en", text,
                             "pageseg", None, REC_ASSET)
    assert fused["guard_tripped"] and fused["n_lines"] == 0
    row = _run_lp_stages(html, text)
    assert row["guard_tripped"] and row["n_lines"] == 0
    for k in ("url", "text", "n_lines", "n_regions", "cer",
              "guard_tripped", "lines"):
        assert row[k] == fused[k], k


def test_recognition_failure_guards_page_not_silent_empty(monkeypatch):
    """A forward/decode exception in the line stage must NOT leave silent
    empty predictions (guard_tripped=False) — assembly must emit the fused
    plan's guard-tripped empty row for the affected page (round-5 advice:
    the two plans stay row-identical under failure)."""
    from kraken_spark.kernels import png, render
    from kraken_spark.kernels.torchvgsl import TorchVGSL
    from kraken_spark.stages import extract_document

    def boom(self, *a, **k):
        raise RuntimeError("forward failed")

    monkeypatch.setattr(TorchVGSL, "forward_batch", boom)
    monkeypatch.setattr(TorchVGSL, "forward", boom)
    d = render.render_document(1234, 1)
    html, text = png.encode_png(d["img"]), d["text"]
    fused = extract_document(html, "http://z/p0", "en", text,
                             "pageseg", None, REC_ASSET)
    assert fused["guard_tripped"] and fused["cer"] == 1.0
    row = _run_lp_stages(html, text)
    assert row["guard_tripped"] and row["cer"] == 1.0
    for k in ("url", "text", "n_lines", "n_regions", "cer",
              "guard_tripped", "lines"):
        assert row[k] == fused[k], k


def test_u8_prep_roundtrip_is_bit_exact():
    """The uint8 transport form reproduces the float prep bit-for-bit
    (the quantization points in rpred_parity._prep_bbox/_prep_baseline
    are uint8 by construction)."""
    from kraken_spark.kernels import png
    from kraken_spark.kernels.modelio import load_kraken_model
    from kraken_spark.kernels.rpred_parity import LoadedRecognizer

    res = "/root/reference/tests/resources"
    if not os.path.exists(f"{res}/000236.png"):
        pytest.skip("reference resources missing")
    img = png.decode_png(open(f"{res}/000236.png", "rb").read())
    rec = LoadedRecognizer(load_kraken_model(f"{res}/overfit.mlmodel")[0])
    bbox = [0, 0, 1200, 156]
    ts, bw = rec._prep_bbox(img, bbox)
    u8, bw2 = rec._prep_bbox_u8(img, bbox)
    assert bw == bw2
    assert (u8.astype(np.float32) / 255.0 == ts).all()
