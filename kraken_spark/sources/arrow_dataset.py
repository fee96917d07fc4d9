"""Binary line-dataset export: documents -> Arrow IPC training data.

Spark-native re-expression of the reference's binary dataset compiler
(reference: kraken/lib/arrow_dataset.py:108-360, build_binary_dataset):
the output is an Arrow IPC file with the same schema —
``lines: struct<text, im, language>`` plus ``train``/``validation``/
``test`` boolean masks — and the same JSON ``lines`` metadata record
(type/text_type/image_type/splits/im_mode/legacy_polygons/counts/
languages), readable by any consumer of the reference format.

Differences by design (documented, Spark-first):

* line extraction is DISTRIBUTED: a mapInArrow pass decodes pages,
  segments them, crops per-line strips and PNG-encodes them, yielding a
  line-level DataFrame usable as parquet as well;
* the split assignment is a DETERMINISTIC hash of (url, line index)
  instead of the reference's unseeded ``np.random.choice`` — at cluster
  scale reproducibility beats sampling exactness, and the realized
  proportions converge to the requested ones;
* the single-file IPC writer streams partition batches through the
  driver (``toLocalIterator``) — one writer, bounded memory. At 100 TB
  use ``write_ipc_shards`` instead: every partition writes its own IPC
  shard, no driver bottleneck, and readers ``dataset()`` over the
  directory.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa

LINE_TY = pa.struct([("text", pa.string()), ("im", pa.binary()),
                     ("language", pa.list_(pa.string()))])
DATASET_SCHEMA = pa.schema([("lines", LINE_TY), ("train", pa.bool_()),
                            ("validation", pa.bool_()),
                            ("test", pa.bool_())])

_OUT_DDL = ("url string, line_idx int, text string, im binary, "
            "language array<string>, train boolean, validation boolean, "
            "test boolean")


def _split_of(url: str, idx: int, split: tuple, seed: int) -> int:
    """0=train, 1=validation, 2=test, deterministic per (url, line)."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(f"{seed}:{url}:{idx}".encode()).digest()[:8], "big")
    u = h / 2 ** 64
    if u < split[0]:
        return 0
    if u < split[0] + split[1]:
        return 1
    return 2


def line_dataset(docs, split=(0.8, 0.1, 0.1), seed: int = 42,
                 skip_empty_lines: bool = True):
    """documents (url, html, text, lang) -> line-level DataFrame
    (url, line_idx, text, im, language, train/validation/test).

    Decode -> binarize -> segment -> per-line strip crop -> PNG encode,
    all inside one Arrow-batched pass (the distributed analog of the
    reference's _extract_line, arrow_dataset.py:47-77)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import binarize, lineextract, pageseg, png

        schema = pa.schema([
            pa.field("url", pa.string()), pa.field("line_idx", pa.int32()),
            pa.field("text", pa.string()), pa.field("im", pa.binary()),
            pa.field("language", pa.list_(pa.string())),
            pa.field("train", pa.bool_()), pa.field("validation", pa.bool_()),
            pa.field("test", pa.bool_()),
        ])
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                url, lang = r["url"], r["lang"]
                try:
                    img = png.to_grayscale(png.decode_png(r["html"]))
                    mask = binarize.nlbin(img)
                    rl = lang == "ar"
                    seg = pageseg.segment(
                        mask, url=url,
                        text_direction="horizontal-rl" if rl else "horizontal-lr")
                except Exception:
                    continue  # undecodable page: no training lines
                gt = (r["text"] or "").split("\n")
                for i, ln in enumerate(seg["lines"]):
                    text = gt[i] if i < len(gt) else ""
                    if skip_empty_lines and not text:
                        continue
                    strip, _ = lineextract.extract_line(mask, ln)
                    if strip.size == 0:
                        continue
                    s = _split_of(url, i, split, seed)
                    rows.append({
                        "url": url, "line_idx": i, "text": text,
                        "im": png.encode_png(strip),
                        "language": [lang] if lang else [],
                        "train": s == 0, "validation": s == 1,
                        "test": s == 2,
                    })
            yield pa.RecordBatch.from_pylist(rows, schema=schema)

    return docs.select("url", "html", "text", "lang").mapInArrow(
        fn, schema=_OUT_DDL)


def xml_line_dataset(pairs, split=(0.8, 0.1, 0.1), seed: int = 42,
                     skip_empty_lines: bool = True,
                     linetype: str = "baselines"):
    """XML ground truth -> line-level dataset DataFrame: the
    ``ketos compile -f xml/alto/page`` analog
    (reference kraken/ketos/dataset.py:26-140 over lib/arrow_dataset.py
    build_binary_dataset with XML parsing).

    ``pairs`` rows are (url, xml binary, image binary): a transcribed
    ALTO/PageXML document plus its page image (PNG/JPEG/TIFF/GIF — the
    reference resolves the image from the markup's filename; at cluster
    scale the pairing is done once up front so tasks never touch a shared
    filesystem by relative path). Each line's boundary polygon is cropped
    from the PAGE IMAGE (grayscale, polygon-masked) and paired with its
    transcription. Split tags already present in the markup (the
    reference's ALTO split tags, lib/xml/alto.py) are HONORED; untagged
    lines get the deterministic (url, line_idx) hash split. Output schema
    is identical to line_dataset's, so write_ipc / write_ipc_shards /
    build_binary_dataset consume it unchanged."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernels import lineextract, png, xmlparse
        from ..kernels.imgio import decode_image

        schema = pa.schema([
            pa.field("url", pa.string()), pa.field("line_idx", pa.int32()),
            pa.field("text", pa.string()), pa.field("im", pa.binary()),
            pa.field("language", pa.list_(pa.string())),
            pa.field("train", pa.bool_()), pa.field("validation", pa.bool_()),
            pa.field("test", pa.bool_()),
        ])
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                url = r["url"]
                try:
                    seg = xmlparse.parse_segmentation(r["xml"],
                                                      linetype=linetype)
                    img = png.to_grayscale(decode_image(r["image"]))
                except Exception:
                    continue  # unparseable pair: no training lines
                for i, ln in enumerate(seg["lines"]):
                    text = ln.get("text") or ""
                    if skip_empty_lines and not text:
                        continue
                    line = dict(ln)
                    bbox = line.get("bbox")
                    if not bbox or bbox == [0, 0, 0, 0]:
                        bnd = line.get("boundary") or []
                        if not bnd:
                            continue
                        xs = [p[0] for p in bnd]
                        ys = [p[1] for p in bnd]
                        line["bbox"] = [min(xs), min(ys), max(xs), max(ys)]
                    strip, _ = lineextract.extract_line(img, line)
                    if strip.size == 0:
                        continue
                    sp = ln.get("split")
                    if sp in ("train", "validation", "test"):
                        s = ("train", "validation", "test").index(sp)
                    else:
                        s = _split_of(url, i, split, seed)
                    rows.append({
                        "url": url, "line_idx": i, "text": text,
                        "im": png.encode_png(strip),
                        "language": ln.get("language") or [],
                        "train": s == 0, "validation": s == 1,
                        "test": s == 2,
                    })
            yield pa.RecordBatch.from_pylist(rows, schema=schema)

    return pairs.select("url", "xml", "image").mapInArrow(fn, schema=_OUT_DDL)


def xml_pairs_df(spark, path: str):
    """Ground-truth pairs for xml_line_dataset: if ``path`` is a parquet
    table it must carry (url, xml, image) columns; otherwise it is a
    directory of transcribed ALTO/PageXML files, read through Spark's
    binaryFile source (one task batch per file group) with each page image
    resolved EXECUTOR-SIDE from the markup's own image filename next to
    its XML — the ``ketos compile`` pairing (reference
    kraken/ketos/dataset.py:63-88 resolves images from the markup too)."""
    import os

    from pyspark.sql import functions as F

    if path.endswith(".parquet") or (
            os.path.isdir(path) and any(
                f.endswith(".parquet") or f == "_SUCCESS"
                for f in os.listdir(path))):
        return spark.read.parquet(path).select("url", "xml", "image")

    xmls = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("path", F.col("content").alias("xml"))
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from urllib.parse import unquote, urlparse

        from ..kernels import xmlparse

        schema = pa.schema([
            pa.field("url", pa.string()), pa.field("xml", pa.binary()),
            pa.field("image", pa.binary()),
        ])
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                local = unquote(urlparse(r["path"]).path)
                try:
                    seg = xmlparse.parse_segmentation(r["xml"])
                    img_path = os.path.join(os.path.dirname(local),
                                            seg.get("imagename") or "")
                    with open(img_path, "rb") as fp:
                        image = fp.read()
                except Exception:
                    continue  # unparseable markup / missing image: skip
                rows.append({"url": local, "xml": r["xml"], "image": image})
            yield pa.RecordBatch.from_pylist(rows, schema=schema)

    return xmls.mapInArrow(fn, schema="url string, xml binary, image binary")


def _dataset_batch(rows: list[dict]) -> pa.RecordBatch:
    lines = pa.array(
        [{"text": r["text"], "im": r["im"], "language": r["language"]}
         for r in rows], type=LINE_TY)
    return pa.RecordBatch.from_arrays(
        [lines,
         pa.array([bool(r["train"]) for r in rows]),
         pa.array([bool(r["validation"]) for r in rows]),
         pa.array([bool(r["test"]) for r in rows])],
        schema=DATASET_SCHEMA)


def _metadata(counts: dict, languages, split,
              ds_type: str = "kraken_recognition_baseline") -> dict:
    return {b"lines": json.dumps({
        "type": ds_type,
        "alphabet": {},
        "text_type": "raw",
        "image_type": "raw",
        "splits": list(split),
        "im_mode": "L",
        "legacy_polygons": False,
        "counts": counts,
        "languages": sorted(languages),
    }).encode()}


def write_ipc(line_df, output_file: str, split=(0.8, 0.1, 0.1),
              ds_type: str = "kraken_recognition_baseline") -> dict:
    """Stream the line DataFrame through the driver into ONE
    reference-compatible Arrow IPC file (schema + 'lines' metadata record,
    arrow_dataset.py:255-360). Returns the metadata counts."""
    counts = {"all": 0, "train": 0, "validation": 0, "test": 0}
    languages: set[str] = set()
    tmp = output_file + ".tmp"
    with pa.OSFile(tmp, "wb") as sink, \
            pa.ipc.new_file(sink, DATASET_SCHEMA) as writer:
        cache: list[dict] = []
        for row in line_df.toLocalIterator():
            r = row.asDict()
            counts["all"] += 1
            for k in ("train", "validation", "test"):
                counts[k] += bool(r[k])
            languages.update(r["language"] or [])
            cache.append(r)
            if len(cache) >= 256:
                writer.write(_dataset_batch(cache))
                cache = []
        if cache:
            writer.write(_dataset_batch(cache))
    # rewrite with metadata attached (same two-pass shape as the reference)
    with pa.memory_map(tmp, "rb") as source:
        table = pa.ipc.open_file(source).read_all()
    schema = DATASET_SCHEMA.with_metadata(_metadata(counts, languages, split,
                                                    ds_type))
    with pa.OSFile(output_file, "wb") as sink, \
            pa.ipc.new_file(sink, schema) as writer:
        writer.write_table(table)
    import os

    os.unlink(tmp)
    return counts


def write_ipc_shards(line_df, output_dir: str, split=(0.8, 0.1, 0.1),
                     ds_type: str = "kraken_recognition_baseline") -> dict:
    """Scale path: every partition writes its own IPC shard (no driver
    bottleneck); a manifest.json carries the merged metadata."""
    import glob
    import os

    os.makedirs(output_dir, exist_ok=True)
    # a re-run over a directory that previously had MORE partitions must
    # not leave stale shards for directory-scanning readers
    for stale in glob.glob(os.path.join(output_dir, "shard-*.arrow")):
        os.unlink(stale)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(output_dir, f"shard-{pid:05d}.arrow")
        # task-commit safety: write under an attempt-unique name and
        # os.rename into place — concurrent speculative/retried attempts
        # produce identical deterministic content and the atomic rename
        # makes last-writer-wins safe (no interleaved partial writes)
        tmp = f"{path}.attempt-{ctx.taskAttemptId()}"
        counts = {"all": 0, "train": 0, "validation": 0, "test": 0}
        langs: set[str] = set()
        wrote = False
        with pa.OSFile(tmp, "wb") as sink, \
                pa.ipc.new_file(sink, DATASET_SCHEMA) as writer:
            for batch in batches:
                rows = batch.to_pylist()
                if not rows:
                    continue
                wrote = True
                counts["all"] += len(rows)
                for r in rows:
                    for k in ("train", "validation", "test"):
                        counts[k] += bool(r[k])
                    langs.update(r["language"] or [])
                writer.write(_dataset_batch(rows))
        if not wrote:
            os.unlink(tmp)
            return
        os.rename(tmp, path)
        yield pa.RecordBatch.from_pylist(
            [{"shard": path, "n_all": counts["all"],
              "n_train": counts["train"], "n_validation": counts["validation"],
              "n_test": counts["test"],
              "languages": json.dumps(sorted(langs))}],
            schema=pa.schema([
                pa.field("shard", pa.string()), pa.field("n_all", pa.int64()),
                pa.field("n_train", pa.int64()),
                pa.field("n_validation", pa.int64()),
                pa.field("n_test", pa.int64()),
                pa.field("languages", pa.string())]))

    stats = line_df.mapInArrow(
        fn, schema="shard string, n_all long, n_train long, "
                   "n_validation long, n_test long, languages string"
    ).collect()
    counts = {"all": 0, "train": 0, "validation": 0, "test": 0}
    languages: set[str] = set()
    for s in stats:
        counts["all"] += s.n_all
        counts["train"] += s.n_train
        counts["validation"] += s.n_validation
        counts["test"] += s.n_test
        languages.update(json.loads(s.languages))
    meta = json.loads(_metadata(counts, languages, split,
                                ds_type)[b"lines"].decode())
    meta["shards"] = sorted(s.shard for s in stats)
    with open(os.path.join(output_dir, "manifest.json"), "w") as fp:
        json.dump(meta, fp, indent=1, sort_keys=True)
    return counts


def build_binary_dataset(docs, output_file: str, split=(0.8, 0.1, 0.1),
                         seed: int = 42, skip_empty_lines: bool = True) -> dict:
    """documents DataFrame -> one reference-compatible .arrow dataset."""
    return write_ipc(line_dataset(docs, split, seed, skip_empty_lines),
                     output_file, split)


def read_binary_dataset(path: str) -> tuple[pa.Table, dict]:
    """Read a reference-format binary dataset (or one of ours)."""
    with pa.memory_map(path, "rb") as source:
        table = pa.ipc.open_file(source).read_all()
    raw = table.schema.metadata or {}
    if b"lines" not in raw:
        raise ValueError(f"{path} does not contain a 'lines' metadata record")
    return table, json.loads(raw[b"lines"])
