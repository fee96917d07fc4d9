"""Line-parallel extraction plan for the LOADED-kraken-model path —
page-skew bounded at LINE granularity.

The fused plan (pipeline.plan_extraction) is one map-only pass: a page is
one unit of work, so a 121-line page is a single task no salt can split —
at local[32] on a 24-doc slice that one page IS the job tail
(BENCH trained_rec_docs_per_sec, BASELINE.md round-5 notes). The expensive
numpy BiLSTM forward of a loaded reference model makes this the one place
where page-level skew survives weight salting.

This plan splits the chain at the reference's own line boundary
(rpred's per-line records, /root/reference/kraken/lib/vgsl/rpred.py:100-124):

  scan -> weight-salted repartition
       -> PREPARE  (mapInArrow: decode -> nlbin -> segment -> per-line
                    polygon-bbox CROP; one row per LINE + one page row)
       -> line-salted repartition (murmur3-preimage buckets, so line k
          lands exactly in partition k%m — pipeline._partition_preimages)
       -> RECOGNIZE (mapInArrow: crop-local tensor prep
                     (_prep_*_u8_from_crop: polygon mask / dewarp +
                     Lanczos resize), then width-sorted chunks through
                     TorchVGSL.forward_batch + the exact _decode_probs)
       -> groupBy(url).applyInArrow ASSEMBLE (stages._assemble_extraction)

The prepare task does only the genuinely page-indivisible work (decode,
nlbin, the segmentation heatmap+vectorization); everything per-line —
polygon extraction, resize, net-input prep, forward, decode — runs in
the line-salted stage, so a 121-line page's prep tail parallelizes too
(round-5 verdict's remaining straggler). The transport is the RAW crop:
extract_polygon_legacy/new slice exactly the polygon's bbox and tap
nothing outside it, so the crop plus crop-translated geometry reproduces
the page-level prep bit-for-bit (rpred_parity._baseline_crop).

Parity: prepare runs stages._decode_and_segment and the page-local crop
half of rpred_parity's _prep_*_u8; recognition runs the crop-local half
(the same uint8 quantization point both per-line paths pass through)
plus the same _prep_net_input/forward_batch/_decode_probs as
LoadedRecognizer.recognize_lines, and assembly is the shared
stages._assemble_extraction — predictions/cuts are EXACT vs the fused
plan and confidences agree to float tolerance (the
tests/test_batched_rpred.py contract; chunk composition differs across
plans, which only moves GEMM rounding at the ulp level). Pinned in
tests/test_line_parallel.py. Failure parity: a line whose
prep/forward/decode raises marks its row `failed`, and assembly answers
with the fused plan's guard-tripped empty page row — the two plans stay
row-identical under failure too (round-5 advice item).

Cost model (when to use which): the fused plan touches each page once and
shuffles only the documents — the right default. This plan pays two extra
shuffles (uint8 line tensors ~H*W bytes/line, then tiny prediction rows)
to make the largest indivisible work unit a LINE instead of a page. Use
it when page skew dominates: corpora with many-line outliers under an
expensive loaded model, or docs >> cores no longer holding (small batches,
huge pages). At 100 TB both plans keep every stage partition-parallel;
this one's straggler bound is max-line-cost, not max-page-cost.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .pipeline import _partition_preimages, weight_salt
from .schema import EXTRACTION_ARROW, EXTRACTION_DDL

# Per-line transport: the RAW polygon-bbox crop + crop-local geometry, not
# the prepped tensor — so the crop-local prep half (polygon mask + Lanczos
# resize / dewarp, rpred_parity._prep_*_u8_from_crop) runs in the
# line-salted stage instead of the per-page prepare task. kind: 0 = bbox
# path, 1 = baseline path, -1 = invalid line (prep guard returned None —
# becomes an empty record, the fused path's semantics).
_PREP_DDL = (
    "url string, line_idx int, complete boolean, page_meta string, "
    "kind int, crop binary, crop_h int, crop_w int, geom string, box_w int"
)
_PREP_ARROW = pa.schema([
    pa.field("url", pa.string()),
    pa.field("line_idx", pa.int32()),
    pa.field("complete", pa.bool_()),
    pa.field("page_meta", pa.string()),
    pa.field("kind", pa.int32()),
    pa.field("crop", pa.binary()),
    pa.field("crop_h", pa.int32()),
    pa.field("crop_w", pa.int32()),
    pa.field("geom", pa.string()),
    pa.field("box_w", pa.int32()),
])

# `failed` marks a line whose prep/forward/decode RAISED (not a merely
# invalid/blank line): assembly turns any failed line into the fused
# plan's guard-tripped empty page row, so the two plans stay row-identical
# under failure instead of silently emitting partially-empty text.
_REC_DDL = (
    "url string, line_idx int, complete boolean, page_meta string, "
    "prediction string, cuts string, confidences array<float>, "
    "rec_ms double, failed boolean"
)
_REC_ARROW = pa.schema([
    pa.field("url", pa.string()),
    pa.field("line_idx", pa.int32()),
    pa.field("complete", pa.bool_()),
    pa.field("page_meta", pa.string()),
    pa.field("prediction", pa.string()),
    pa.field("cuts", pa.string()),
    pa.field("confidences", pa.list_(pa.float32())),
    pa.field("rec_ms", pa.float64()),
    pa.field("failed", pa.bool_()),
])

PAD = 16  # stages' recognize_lines call uses the rpred default padding


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON-serializable: {type(o)}")


def _prepare_one(html, url, lang, gt_text, segmenter, text_direction,
                 kraken_model_path, no_segmentation, temperature,
                 nlbin_params) -> list[dict]:
    """One document -> prep rows. Non-image payloads (XML/JSON/web-HTML)
    and failed pages produce ONE complete row (the fused extract_document
    row, which never involves recognition for those payloads); image
    pages produce a page-meta row plus one row per segmented line."""
    from . import stages
    from .stages import _decode_and_segment, _payload_route, extract_document

    try:
        route = _payload_route(html)
    except Exception:
        # null/unsliceable html: defer to extract_document, whose guard
        # path owns malformed payloads (emits the flagged empty row)
        route = "defer"
    if route is not None:
        row = extract_document(
            html, url, lang, gt_text, segmenter, text_direction,
            kraken_model_path, no_segmentation=no_segmentation,
            temperature=temperature, nlbin_params=nlbin_params)
        return [{"url": url, "line_idx": -1, "complete": True,
                 "page_meta": json.dumps(row, default=_json_default),
                 "kind": -1, "crop": None, "crop_h": 0, "crop_w": 0,
                 "geom": None, "box_w": 0}]

    t0 = time.perf_counter()
    base_dir = "R" if lang == "ar" else "L"
    if text_direction == "vertical":
        text_direction = "vertical-rl" if base_dir == "R" else "vertical-lr"
    elif text_direction is None:
        text_direction = "horizontal-rl" if base_dir == "R" else "horizontal-lr"
    vertical = text_direction.startswith("vertical")
    out = {
        "url": url, "lang": lang, "base_dir": base_dir, "text": "",
        "n_lines": 0, "n_regions": 0, "guard_tripped": False,
        "lines": [], "regions": [], "cer": None, "n_px": 0,
        "width": 0, "height": 0, "line_orders": [],
    }
    try:
        img, mask, seg = _decode_and_segment(
            html, url, out, segmenter, text_direction,
            no_segmentation, nlbin_params, t0)
        rec = stages._get_kraken_recognizer(kraken_model_path,
                                            temperature=temperature)
        rows = []
        inval = {"url": url, "complete": False, "page_meta": None,
                 "kind": -1, "crop": None, "crop_h": 0, "crop_w": 0,
                 "geom": None, "box_w": 0}
        for i, ln in enumerate(seg["lines"]):
            # seg-type dispatch and bbox clamping exactly as
            # LoadedRecognizer.recognize_lines (rpred_parity.py:236-248);
            # only the page-local prep half (guard + crop) runs here — the
            # polygon mask / resize half runs in the line-salted stage
            if rec.bundle.seg_type == "bbox" or not ln.get("baseline"):
                x0 = max(0, ln["bbox"][0])
                y0 = max(0, ln["bbox"][1])
                x1 = min(img.shape[1], ln["bbox"][2])
                y1 = min(img.shape[0], ln["bbox"][3])
                if x1 <= x0 or y1 <= y0:
                    rows.append(dict(inval, line_idx=i))
                    continue
                crop = img[y0:y1, x0:x1]
                rows.append({
                    "url": url, "line_idx": i, "complete": False,
                    "page_meta": None, "kind": 0,
                    "crop": np.ascontiguousarray(crop).tobytes(),
                    "crop_h": int(crop.shape[0]),
                    "crop_w": int(crop.shape[1]),
                    "geom": None, "box_w": int(x1 - x0),
                })
            else:
                r = rec._baseline_crop(img, ln["baseline"], ln["boundary"])
                if r is None:
                    rows.append(dict(inval, line_idx=i))
                    continue
                crop, bl_local, poly_local = r
                rows.append({
                    "url": url, "line_idx": i, "complete": False,
                    "page_meta": None, "kind": 1,
                    "crop": np.ascontiguousarray(crop).tobytes(),
                    "crop_h": int(crop.shape[0]),
                    "crop_w": int(crop.shape[1]),
                    "geom": json.dumps(
                        {"bl": bl_local.tolist(),
                         "poly": np.asarray(poly_local).tolist()}),
                    "box_w": 0,
                })
        meta = {
            "out": out,
            "seg_lines": seg["lines"],
            "seg_regions": seg["regions"],
            "vertical": vertical,
            "gt_text": gt_text,
            "prep_ms": (time.perf_counter() - t0) * 1000.0,
        }
        rows.append({"url": url, "line_idx": -1, "complete": False,
                     "page_meta": json.dumps(meta, default=_json_default),
                     "kind": -1, "crop": None, "crop_h": 0, "crop_w": 0,
                     "geom": None, "box_w": 0})
        return rows
    except Exception:
        # guard-tripped empty row, exactly the fused plan's failure path
        out["guard_tripped"] = True
        out["cer"] = 1.0 if gt_text else None
        out["wall_ms"] = (time.perf_counter() - t0) * 1000.0
        return [{"url": url, "line_idx": -1, "complete": True,
                 "page_meta": json.dumps(out, default=_json_default),
                 "kind": -1, "crop": None, "crop_h": 0, "crop_w": 0,
                 "geom": None, "box_w": 0}]


def make_prepare_map(segmenter, text_direction, kraken_model_path,
                     no_segmentation, temperature, nlbin_params):
    def prepare(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            langs = batch.column("lang").to_pylist()
            gts = (batch.column("text").to_pylist()
                   if "text" in names else [None] * len(urls))
            # largest-first like the fused stage (straggler starts early)
            order = sorted(range(len(urls)),
                           key=lambda i: -(len(htmls[i] or b"")))
            rows: list[dict] = []
            for i in order:
                rows.extend(_prepare_one(
                    htmls[i], urls[i], langs[i], gts[i], segmenter,
                    text_direction, kraken_model_path, no_segmentation,
                    temperature, nlbin_params))
            yield pa.RecordBatch.from_pylist(rows, schema=_PREP_ARROW)

    return prepare


def make_recognize_map(kraken_model_path, temperature, batch_size: int = 32):
    def recognize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from . import stages

        rec = stages._get_kraken_recognizer(kraken_model_path,
                                            temperature=temperature)
        for batch in batches:
            rows = batch.to_pylist()
            out_rows = []
            pending = []  # (row_pos, net_in, ts_w_padded, box_w)
            for r in rows:
                if r["line_idx"] < 0 or r["kind"] < 0 or r["crop"] is None:
                    # page-meta / complete / invalid-line rows pass through
                    out_rows.append({
                        "url": r["url"], "line_idx": r["line_idx"],
                        "complete": r["complete"],
                        "page_meta": r["page_meta"],
                        "prediction": "" if r["line_idx"] >= 0 else None,
                        "cuts": "[]" if r["line_idx"] >= 0 else None,
                        "confidences": [] if r["line_idx"] >= 0 else None,
                        "rec_ms": 0.0 if r["line_idx"] >= 0 else None,
                        "failed": False,
                    })
                    continue
                pos = len(out_rows)
                out_rows.append({
                    "url": r["url"], "line_idx": r["line_idx"],
                    "complete": False, "page_meta": None,
                    "prediction": "", "cuts": "[]", "confidences": [],
                    "rec_ms": 0.0, "failed": False,
                })
                try:
                    crop = np.frombuffer(r["crop"], dtype=np.uint8).reshape(
                        r["crop_h"], r["crop_w"])
                    # crop-local prep half (the work the split moves off
                    # the per-page prepare task): dewarp / polygon mask +
                    # Lanczos resize, exactly _prep_*_u8's tail
                    if r["kind"] == 0:
                        p = rec._prep_bbox_u8_from_crop(crop, r["box_w"])
                    else:
                        g = json.loads(r["geom"])
                        p = rec._prep_baseline_u8_from_crop(
                            crop,
                            np.asarray(g["bl"], dtype=np.float64),
                            np.asarray(g["poly"]))
                    if p is not None and p[0].size == 0:
                        # the fused path's _prep_net_input raises on a
                        # zero-area tensor inside recognize_lines, guard-
                        # tripping the page — reproduce via the failed flag
                        raise ValueError("zero-area line tensor")
                    if p is None:
                        continue  # blank/degenerate line -> empty record
                    u8, box_w = p
                    ts = u8.astype(np.float32) / 255.0
                    net_in = rec._prep_net_input(ts, PAD)
                except Exception:
                    # a RAISING line is a failure the fused plan answers
                    # with a guard-tripped page row; mark it so assembly
                    # reproduces that row instead of silently emitting
                    # partial text
                    out_rows[pos]["failed"] = True
                    continue
                if net_in is not None:
                    pending.append((pos, net_in, net_in.shape[1], box_w))
            # width-sorted chunks through the batched forward, then the
            # exact per-line decode — recognize_lines' loop verbatim
            pending.sort(key=lambda t: t[2])
            for s in range(0, len(pending), batch_size):
                chunk = pending[s:s + batch_size]
                c0 = time.perf_counter()
                try:
                    probs_list = rec.net.forward_batch([c[1] for c in chunk])
                except Exception:
                    # isolate the genuinely-failing line(s): per-line
                    # forward (prediction-exact vs the batched path) so
                    # only the failing line's page guard-trips, like the
                    # fused plan where chunks never span pages
                    probs_list = []
                    for c in chunk:
                        try:
                            probs_list.append(rec.net.forward(c[1]))
                        except Exception:
                            out_rows[c[0]]["failed"] = True
                            probs_list.append(None)
                chunk_ms = (time.perf_counter() - c0) * 1000.0
                wsum = sum(c[2] for c in chunk) or 1
                for (pos, net_in, ts_w, box_w), probs in zip(chunk, probs_list):
                    if probs is None:
                        continue
                    try:
                        d = rec._decode_probs(probs, ts_w, PAD,
                                              bidi_reordering=True,
                                              box_w=box_w)
                    except Exception:
                        out_rows[pos]["failed"] = True
                        continue
                    out_rows[pos]["prediction"] = d["prediction"]
                    out_rows[pos]["cuts"] = json.dumps(
                        [[int(a), int(b)] for a, b in d["cuts"]])
                    out_rows[pos]["confidences"] = [
                        float(c) for c in d["confidences"]]
                    # recurrence cost is ~linear in timesteps: attribute
                    # the chunk's wall width-proportionally so assembly
                    # can report a realistic per-document wall_ms
                    out_rows[pos]["rec_ms"] = chunk_ms * ts_w / wsum
            yield pa.RecordBatch.from_pylist(out_rows, schema=_REC_ARROW)

    return recognize


def make_assemble():
    def assemble(table: pa.Table) -> pa.Table:
        from .stages import _assemble_extraction

        try:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else -1
        except Exception:  # pragma: no cover - outside Spark
            pid = -1
        rows = table.to_pylist()
        out = []
        # a group can only ever hold one page (url is the key), but the
        # loop form keeps this safe if Spark ever feeds multiple
        pages = [r for r in rows if r["line_idx"] < 0]
        lines = {r["line_idx"]: r for r in rows if r["line_idx"] >= 0}
        for page in pages:
            meta = json.loads(page["page_meta"])
            if page["complete"]:
                row = meta
            else:
                o = meta["out"]
                rec_ms = sum((r.get("rec_ms") or 0.0)
                             for r in rows if r["line_idx"] >= 0)
                if any(r.get("failed") for r in rows if r["line_idx"] >= 0):
                    # a line's prep/forward/decode RAISED in the line
                    # stage: the fused plan answers any in-recognition
                    # exception with the guard-tripped empty page row
                    # (stages.extract_document's catch-all) — emit exactly
                    # that row so the plans stay row-identical under
                    # failure (no silent partially-empty text)
                    o["guard_tripped"] = True
                    o["cer"] = 1.0 if meta["gt_text"] else None
                    o["wall_ms"] = meta["prep_ms"] + rec_ms
                    row = o
                else:
                    records = []
                    for i in range(len(meta["seg_lines"])):
                        lr = lines.get(i)
                        records.append({
                            "prediction": lr["prediction"] if lr else "",
                            "cuts": json.loads(lr["cuts"]) if lr else [],
                            "confidences": list(lr["confidences"] or []) if lr else [],
                            "display_order": False,
                        })
                    row = _assemble_extraction(
                        o, meta["seg_lines"], records, meta["seg_regions"],
                        meta["vertical"], o["lang"], o["base_dir"],
                        meta["gt_text"])
                    # per-doc wall = prepare wall + this page's share of
                    # the batched recognition wall (width-proportional
                    # chunk attribution in stage B) — so metrics rollups
                    # see the real cost, not just the prepare half
                    row["wall_ms"] = meta["prep_ms"] + rec_ms
            row["partition_id"] = pid
            out.append(row)
        return pa.Table.from_pylist(out, schema=EXTRACTION_ARROW)

    return assemble


def plan_extraction_line_parallel(
    documents: DataFrame,
    num_partitions: int | None = None,
    segmenter: str = "pageseg",
    text_direction: str | None = None,
    kraken_model_path: str | None = None,
    no_segmentation: bool = False,
    temperature: float = 1.0,
    nlbin_params: dict | None = None,
    line_partitions: int | None = None,
) -> DataFrame:
    """The line-parallel extraction DataFrame (module docstring for the
    plan shape and the cost model vs the fused plan). kraken_model_path
    is required: the matched-filter default is ~130x cheaper per line and
    never needs line-level balancing (its skew is handled by the fused
    plan's weight salt).

    `url` must be unique in `documents` (it is the documents-table key
    everywhere in this engine — resume anti-joins, icetable merge keys,
    FIXTURES.md): the assembly stage groups by url, so duplicate-url rows
    would merge here where the row-independent fused plan would emit one
    row each."""
    if not kraken_model_path:
        raise ValueError(
            "plan_extraction_line_parallel is the loaded-model skew path; "
            "use pipeline.plan_extraction for the default recognizer")
    spark = documents.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 4
    cols = [c for c in ("url", "warc_ts", "html", "text", "lang")
            if c in documents.columns]
    df = documents.select(*cols)
    salt, total = weight_salt(n)
    df = df.repartition(total, salt.alias("salt"))
    prep = df.mapInArrow(
        make_prepare_map(segmenter, text_direction, kraken_model_path,
                         no_segmentation, temperature, nlbin_params),
        schema=_PREP_DDL,
    )
    # line balancing: lines are near-uniform work units, so a plain hash
    # over (url, line_idx) spreads any page across all m partitions; the
    # murmur3-preimage lookup keeps bucket k exactly in partition k
    # (no ~1/e empty-partition collisions — BASELINE.md round-5 landmine)
    # one line partition per core: more would dilute forward_batch's GEMM
    # batching at small corpus sizes (measured: m=2*cores reads ~10% worse
    # on the 24-doc slice); at corpus scale lines/partition is huge either
    # way and the choice stops mattering
    m = line_partitions or spark.sparkContext.defaultParallelism
    pre = _partition_preimages(m)
    lookup = F.array(*[F.lit(int(v)).cast("bigint") for v in pre])
    bucket = F.pmod(F.xxhash64("url", "line_idx"), F.lit(m)).cast("int")
    prep = prep.repartition(m, F.element_at(lookup, bucket + 1))
    rec = prep.mapInArrow(
        make_recognize_map(kraken_model_path, temperature), schema=_REC_DDL)
    return rec.groupBy("url").applyInArrow(
        make_assemble(), schema=EXTRACTION_DDL)
