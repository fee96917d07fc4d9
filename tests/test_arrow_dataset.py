"""Binary line-dataset export tests, mirroring the reference's dataset
validation (test_arrow_dataset.py _validate_ds): reference-compatible
schema + 'lines' metadata record, line counts, empty-line skipping,
deterministic split masks, decodable line images, and the sharded scale
path."""

import json

import pyarrow as pa
import pytest

pyspark = pytest.importorskip("pyspark")

from kraken_spark.session import get_spark  # noqa: E402
from kraken_spark.sources.arrow_dataset import (build_binary_dataset,
                                                line_dataset,
                                                read_binary_dataset,
                                                write_ipc_shards)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-arrow-ds", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    from kraken_spark.corpus import corpus_for

    return corpus_for(spark, "sf0.001")


def test_build_binary_dataset_reference_format(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "dataset.arrow")
    counts = build_binary_dataset(docs, out)
    table, meta = read_binary_dataset(out)
    # reference schema shape
    assert table.schema.names == ["lines", "train", "validation", "test"]
    lines_ty = table.schema.field("lines").type
    assert {f.name for f in lines_ty} == {"text", "im", "language"}
    # metadata record matches the reference's fields
    assert meta["type"] == "kraken_recognition_baseline"
    assert meta["im_mode"] == "L" and meta["legacy_polygons"] is False
    assert meta["counts"]["all"] == len(table) == counts["all"]
    assert counts["all"] > 0
    assert meta["counts"]["train"] + meta["counts"]["validation"] + \
        meta["counts"]["test"] == counts["all"]
    # masks are one-hot per row
    tr = table.column("train").to_pylist()
    va = table.column("validation").to_pylist()
    te = table.column("test").to_pylist()
    assert all(t + v + x == 1 for t, v, x in zip(tr, va, te))
    # split proportions roughly follow (0.8, 0.1, 0.1)
    assert sum(tr) > sum(va) and sum(tr) > sum(te)
    # no empty text lines (skip_empty_lines default)
    texts = [str(line["text"]) for line in table.column("lines").to_pylist()]
    assert all(texts)
    # every line image is a decodable PNG crop
    from kraken_spark.kernels import png

    im = table.column("lines").to_pylist()[0]["im"]
    arr = png.decode_png(im)
    assert arr.ndim == 2 and arr.size > 0
    assert sorted(meta["languages"])


def test_line_dataset_split_deterministic(spark, docs):
    a = line_dataset(docs).select("url", "line_idx", "train").collect()
    b = line_dataset(docs).select("url", "line_idx", "train").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_write_ipc_shards(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds_shards"))
    counts = write_ipc_shards(line_dataset(docs), out)
    manifest = json.load(open(f"{out}/manifest.json"))
    assert manifest["counts"]["all"] == counts["all"] > 0
    total = 0
    for shard in manifest["shards"]:
        with pa.memory_map(shard, "rb") as src:
            t = pa.ipc.open_file(src).read_all()
        assert t.schema.names == ["lines", "train", "validation", "test"]
        total += len(t)
    assert total == counts["all"]


# ------------------------------------------------------------ ketos compile
def _mini_alto(image_name: str, lines, width=220, height=120,
               split_tags=()) -> bytes:
    """Minimal ALTO with per-line BASELINE/boundary/text and optional
    split TAGREFS (the reference stores dataset splits as ALTO tags)."""
    tag_defs = "".join(
        f'<OtherTag ID="SP{i}" TYPE="split" LABEL="{s}"/>'
        for i, s in enumerate(("train", "validation", "test")))
    body = []
    for i, (text, x0, y0, x1, y1) in enumerate(lines):
        refs = ""
        if i < len(split_tags) and split_tags[i] is not None:
            refs = f' TAGREFS="SP{("train", "validation", "test").index(split_tags[i])}"'
        pts = f"{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"
        body.append(
            f'<TextLine ID="l{i}" HPOS="{x0}" VPOS="{y0}" '
            f'WIDTH="{x1 - x0}" HEIGHT="{y1 - y0}" '
            f'BASELINE="{x0},{y1 - 1} {x1},{y1 - 1}"{refs}>'
            f'<Shape><Polygon POINTS="{pts}"/></Shape>'
            f'<String CONTENT="{text}" HPOS="{x0}" VPOS="{y0}" '
            f'WIDTH="{x1 - x0}" HEIGHT="{y1 - y0}"/></TextLine>')
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v4#">'
        "<Description><MeasurementUnit>pixel</MeasurementUnit>"
        f"<sourceImageInformation><fileName>{image_name}</fileName>"
        "</sourceImageInformation></Description>"
        f"<Tags>{tag_defs}</Tags>"
        f'<Layout><Page ID="p0" WIDTH="{width}" HEIGHT="{height}" '
        'PHYSICAL_IMG_NR="0"><PrintSpace HPOS="0" VPOS="0" '
        f'WIDTH="{width}" HEIGHT="{height}">'
        f'<TextBlock ID="b0" HPOS="0" VPOS="0" WIDTH="{width}" '
        f'HEIGHT="{height}">{"".join(body)}</TextBlock>'
        "</PrintSpace></Page></Layout></alto>"
    ).encode("utf-8")


def _mini_page_png() -> bytes:
    import numpy as np

    from kraken_spark.kernels import png

    img = np.full((120, 220), 210, dtype=np.uint8)
    img[20:40, 10:200] = 40   # line 0 ink band
    img[50:70, 10:200] = 40   # line 1
    img[80:100, 10:200] = 40  # line 2
    return png.encode_png(img)


_MINI_LINES = [("alpha beta", 10, 18, 200, 42),
               ("gamma", 10, 48, 200, 72),
               ("delta eps", 10, 78, 200, 102)]


def test_xml_line_dataset_pairs(spark):
    """(url, xml, image) pairs -> line dataset: geometry cropped from the
    page image, texts from the markup, markup split tags honored, untagged
    lines hash-split."""
    from kraken_spark.kernels import png
    from kraken_spark.sources.arrow_dataset import xml_line_dataset

    xml = _mini_alto("page0.png", _MINI_LINES,
                     split_tags=("train", "test", None))
    pairs = spark.createDataFrame(
        [("doc://0", bytearray(xml), bytearray(_mini_page_png()))],
        "url string, xml binary, image binary")
    rows = {r.line_idx: r for r in xml_line_dataset(pairs).collect()}
    assert len(rows) == 3
    assert [rows[i].text for i in range(3)] == [t for t, *_ in _MINI_LINES]
    assert rows[0].train and not rows[0].test
    assert rows[1].test and not rows[1].train
    assert sum([rows[2].train, rows[2].validation, rows[2].test]) == 1
    for r in rows.values():
        arr = png.decode_png(r.im)
        assert arr.shape == (24, 190)      # the line's bbox crop
        assert (arr < 100).any()           # ink made it into the crop


def test_xml_line_dataset_from_extraction_roundtrip(spark, docs):
    """Serialize a real extraction to ALTO, compile the (alto, page image)
    pairs back into a dataset: every ground-truth line of the CER-0 corpus
    comes back with byte-identical text."""
    from pyspark.sql import functions as F

    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.sources.arrow_dataset import xml_line_dataset

    small = docs.limit(4).localCheckpoint(eager=True)
    ext = plan_extraction(small, num_partitions=2)
    alto = serialize_extractions(ext, "alto").select("url", "document")
    pairs = (
        alto.join(small.select("url", "html"), "url")
        .select("url", F.encode("document", "UTF-8").alias("xml"),
                F.col("html").alias("image"))
    )
    got = xml_line_dataset(pairs).collect()
    want = {
        r.url: [ln for ln in (r.text or "").split("\n") if ln]
        for r in small.select("url", "text").collect()
    }
    by_url: dict = {}
    for r in got:
        by_url.setdefault(r.url, []).append((r.line_idx, r.text))
    assert set(by_url) == {u for u, ls in want.items() if ls}
    for u, pairs_u in by_url.items():
        assert [t for _i, t in sorted(pairs_u)] == want[u]


def test_xml_pairs_df_directory_and_job_cli(spark, tmp_path_factory, capsys):
    """The ketos-compile CLI shape: a directory of ALTO files with images
    resolved from the markup's fileName, compiled to a reference-format
    .arrow through job.py --compile-dataset."""
    import os

    from kraken_spark.job import main
    from kraken_spark.sources.arrow_dataset import xml_pairs_df

    gt = tmp_path_factory.mktemp("gt_xml")
    for di in range(2):
        xml = _mini_alto(f"page{di}.png", _MINI_LINES)
        (gt / f"doc{di}.xml").write_bytes(xml)
        (gt / f"page{di}.png").write_bytes(_mini_page_png())
    # a decoy non-image sibling must not break anything
    (gt / "notes.txt").write_text("not xml")

    pairs = xml_pairs_df(spark, str(gt)).collect()
    assert len(pairs) == 2 and all(r.image and r.xml for r in pairs)

    out = str(tmp_path_factory.mktemp("compiled") / "gt.arrow")
    rc = main(["--input", str(gt), "--output", out, "--compile-dataset"])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["all"] == 6
    table, meta = read_binary_dataset(out)
    assert len(table) == 6
    assert meta["counts"]["all"] == 6
    texts = sorted(str(line["text"]) for line in
                   table.column("lines").to_pylist())
    assert texts == sorted([t for t, *_ in _MINI_LINES] * 2)


def test_xml_line_dataset_garbage_totality(spark):
    """Malformed markup / truncated images / empty payloads skip their
    pair without crashing the task — totality over garbage bytes, the
    property every web-scale ingest leg in this repo holds."""
    xml = _mini_alto("page0.png", _MINI_LINES)
    png_ok = _mini_page_png()
    rows = [
        ("bad-xml", b"<alto>truncat", png_ok),
        ("not-xml", b"\x00\x01\x02", png_ok),
        ("bad-img", xml, b"\x89PNG\r\n\x1a\nBROKEN"),
        ("empty-img", xml, b""),
        ("swapped", png_ok, xml),
        ("good", xml, png_ok),
    ]
    from kraken_spark.sources.arrow_dataset import xml_line_dataset

    pairs = spark.createDataFrame(
        [(u, bytearray(x), bytearray(i)) for u, x, i in rows],
        "url string, xml binary, image binary")
    got = xml_line_dataset(pairs).collect()
    assert {r.url for r in got} == {"good"}
    assert len(got) == 3
