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
