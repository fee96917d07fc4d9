"""spark-submit entry point for the extraction pipeline.

Packaging (north rule: `spark-submit --py-files` on a multi-executor
cluster):

    cd /root/repo && zip -r /tmp/kraken_spark.zip kraken_spark
    spark-submit --py-files /tmp/kraken_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        kraken_spark/job.py \
        --input  <documents parquet/iceberg path> \
        --output <extractions path> --metrics <metrics path> \
        --run-id run1 [--resume] [--partitions N] [--serialize alto]

The job is idempotent per url: with --resume it anti-joins the committed
output before processing (pipeline.remaining_documents, SURVEY.md §7.4),
so a re-submitted job continues from the last committed snapshot.

Iceberg (production): the sandbox stands in parquet paths for Iceberg
tables; on a cluster add the runtime jar and catalog conf and pass table
identifiers instead of paths —

    --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=glue|hive|hadoop

per-url idempotence + the batch_id-keyed streaming sink then map onto
Iceberg snapshot commits (MERGE/overwritePartitions) unchanged.

On a real cluster, executor env must pin BLAS threads and glibc malloc
thresholds exactly as session.get_spark does locally (see _PIN_ENV there);
the spark-submit conf equivalents are spark.executorEnv.OMP_NUM_THREADS=1
etc. — required for the N->4N scaling behavior measured in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="kraken_spark extraction job")
    ap.add_argument("--input", required=True, help="documents table path (parquet)")
    ap.add_argument(
        "--input-format",
        choices=["parquet", "warc", "ice"],
        default="parquet",
        help="'warc': --input is a path/glob of .warc(.gz) files (the "
        "Common-Crawl layout); records explode to documents rows via "
        "sources/warc.py, one task per file. 'ice': --input is a "
        "committed-snapshot pages table (sources/icetable.py) — the scan "
        "reads the LAST COMMITTED snapshot (a concurrent ingest's "
        "uncommitted files are invisible) with pending takedown masks "
        "applied; for recurring incremental runs prefer --tail",
    )
    ap.add_argument("--output", required=True, help="extractions output path")
    ap.add_argument(
        "--table-format",
        choices=["parquet", "ice"],
        default="parquet",
        help="'ice': commit output as atomic snapshots of a committed-"
        "snapshot table (sources/icetable.py — Iceberg commit semantics: "
        "crash-safe, time-travelable, resume reads the last committed "
        "snapshot); 'parquet': plain appends",
    )
    ap.add_argument("--metrics", default=None, help="metrics table path")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true", help="anti-join committed output")
    ap.add_argument(
        "--tail",
        action="store_true",
        help="(ice input AND output) one tick of the recurring incremental "
        "job: extract only the pages committed to the input table since "
        "the watermark recorded in the output table's own snapshots "
        "(pipeline.tail_extraction — exactly-once, no external state)",
    )
    ap.add_argument(
        "--stream",
        action="store_true",
        help="(ice input AND output) the CONTINUOUS form of --tail: a "
        "Structured Streaming query tailing the pages table with "
        "exactly-once ice commits per micro-batch "
        "(pipeline.streaming_extraction); drains what is committed and "
        "stops (availableNow) — offsets live in --checkpoint",
    )
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint location for --stream",
    )
    ap.add_argument(
        "--skip-delete-snapshots",
        action="store_true",
        help="(--tail / --stream / --corpus-tick) tail across takedowns "
        "on the input table: a 'delete' snapshot in the delta range is "
        "skipped instead of halting the consumer (Iceberg's "
        "streaming-skip-delete-snapshots; already-processed pages are "
        "never retracted)",
    )
    ap.add_argument(
        "--serialize",
        choices=["alto", "pagexml", "hocr", "abbyyxml", "json"],
        default=None,
        help="additionally write serialized documents next to the output",
    )
    ap.add_argument(
        "--overlay",
        choices=["segmentation", "heatmap", "alignment"],
        default=None,
        help="additionally render QA overlay PNGs (the reference contrib "
        "segmentation/heatmap/forced-alignment overlay scripts; "
        "operators/serialization.overlay_extractions) next to the output",
    )
    ap.add_argument(
        "--no-subline-segmentation", action="store_true",
        help="the reference's --no-subline-segmentation: --serialize "
        "markup carries line text only, no word/char geometry",
    )
    ap.add_argument(
        "--model",
        default=None,
        help="path to a kraken model file (CoreML .mlmodel or safetensors; "
        "ship via spark-submit --files) — recognition runs the loaded "
        "trained weights through the rpred-parity path instead of the "
        "built-in recognizer",
    )
    ap.add_argument(
        "--model-repo", default=None,
        help="model repository root (dir or file:// URL; env "
        "KRAKEN_SPARK_MODEL_REPO) for the repository verbs and "
        "--model repo:<id> resolution — the kraken get/list/show analog "
        "(kraken_spark/repo.py)",
    )
    ap.add_argument(
        "--line-parallel", action="store_true",
        help="route --model recognition through the line-granular skew "
        "plan (pipeline_lines.plan_extraction_line_parallel): a "
        "many-line outlier page is split across tasks at the line "
        "boundary instead of running as one straggler; output rows are "
        "identical to the default plan",
    )
    ap.add_argument("--list-models", action="store_true",
                    help="list repository models grouped by concept id")
    ap.add_argument("--show-model", default=None, metavar="ID",
                    help="print a repository record's metadata")
    ap.add_argument("--get-model", default=None, metavar="ID",
                    help="fetch a model into the local cache (sha256-verified)")
    ap.add_argument("--publish-model", default=None, metavar="METADATA_JSON",
                    help="publish --input (a model file) into --model-repo "
                    "with the given metadata JSON (ketos publish analog)")
    ap.add_argument("--update-of", default=None, metavar="ID",
                    help="with --publish-model: link the deposit under an "
                    "existing record's concept id")
    ap.add_argument("--model-cache", default=None,
                    help="override the model cache dir (~/.cache/kraken_spark/models)")
    ap.add_argument("--filter-model-type", default="all",
                    choices=["all", "recognition", "segmentation", "reading_order"])
    ap.add_argument("--filter-script", action="append", default=None)
    ap.add_argument("--filter-language", action="append", default=None)
    ap.add_argument("--filter-keyword", action="append", default=None)
    ap.add_argument(
        "--report",
        action="store_true",
        help="print a kraken-style OCR accuracy report (requires a ground-"
        "truth `text` column on the input documents)",
    )
    ap.add_argument(
        "--report-per-file",
        action="store_true",
        help="with --report: also print one detail line per input "
        "document (chars/CER/WER per url, plus the across-file average "
        "accuracies) — the contrib/test_per_file.py view",
    )
    ap.add_argument(
        "--train-recognizer",
        action="store_true",
        help="training leg (the ketos-train analog, kraken_spark/"
        "training.py): --input is a reference-format Arrow IPC line "
        "dataset (a .arrow file or a shard directory from "
        "--export-dataset); fit the CTC recognizer with synchronous "
        "data-parallel gradients and write the model (kraken safetensors "
        "layout) to --output. --model warm-starts from an existing model "
        "(fine-tuning); a cold start needs the multi-thousand-step "
        "curriculum in tools/train_recognizer.py",
    )
    ap.add_argument(
        "--pretrain-recognizer",
        action="store_true",
        help="self-supervised pretraining leg (the ketos-pretrain analog, "
        "kernels/rec_pretrain.py): --input is a line dataset as for "
        "--train-recognizer, but the TEXT IS IGNORED — the wav2vec2-style "
        "masked-contrastive surrogate task needs no labels; writes a "
        "pretrained checkpoint (backbone + mask/projection head) to "
        "--output for later --train-recognizer --model fine-tuning",
    )
    ap.add_argument(
        "--test-recognizer",
        action="store_true",
        help="ketos-test analog (training.test_recognizer_on_dataset): "
        "evaluate --model (any loaded kraken model, its own spec + codec) "
        "against the test split of the --input line dataset; one task per "
        "shard, per-language accuracy aggregated JVM-side; prints the "
        "report JSON. --test-split evaluates a different split",
    )
    ap.add_argument(
        "--test-split", default="test",
        choices=["train", "validation", "test"],
        help="dataset split for --test-recognizer",
    )
    ap.add_argument(
        "--train-segmenter",
        action="store_true",
        help="ketos-segtrain analog (training.train_segmenter_from_pairs): "
        "--input is transcribed XML ground truth as for --compile-dataset "
        "(directory of ALTO/PageXML or a (url, xml, image) parquet); fit "
        "the baseline/region heatmap net with synchronous data-parallel "
        "gradients over markup-rasterized target maps and write the "
        "weights (blla_learned safetensors layout) to --output — drive "
        "segmentation from them via KRAKEN_SPARK_BLLA_NET=<output>. "
        "--train-steps/--train-lr apply",
    )
    ap.add_argument(
        "--train-ro",
        action="store_true",
        help="ketos-rotrain analog (training.train_ro_from_pairs): --input "
        "is transcribed XML ground truth (as for --train-segmenter); fit "
        "the pairwise reading-order MLP on the markup's reading order "
        "with data-parallel gradients, write ro_learned-layout weights to "
        "--output (KRAKEN_SPARK_RO_NET=<output> or --roadd uses them), "
        "and report how many pages greedy-decode to the markup order "
        "exactly. --train-steps/--train-lr apply",
    )
    ap.add_argument(
        "--test-segmenter",
        action="store_true",
        help="ketos-segtest analog (training.test_segmenter_on_pairs): "
        "--input is XML ground truth as for --compile-dataset (directory "
        "of ALTO/PageXML or a (url, xml, image) parquet); run --segmenter "
        "on every page image and report object-level baseline "
        "precision/recall/F1 against the markup's baselines (greedy "
        "tolerance matching), micro + macro aggregated JVM-side",
    )
    ap.add_argument(
        "--segmenter", default=None,
        choices=["pageseg", "blla", "blla_ref", "blla_curved",
                 "blla_seam", "blla_robust"],
        help="segmentation path (the kraken CLI's -x/--boxes vs "
        "-bl/--baseline choice, widened to the engine's tagged variants): "
        "drives the extraction run (default pageseg) and --test-segmenter "
        "(default blla; only blla/pageseg valid there)",
    )
    ap.add_argument(
        "--threshold", type=float, default=None,
        help="nlbin binarization threshold (reference kraken binarize "
        "--threshold; kernels/binarize.nlbin)")
    ap.add_argument("--escale", type=float, default=None,
                    help="nlbin estimation scale (reference --escale)")
    ap.add_argument("--perc", type=float, default=None,
                    help="nlbin background-estimation percentile "
                    "(reference --perc)")
    ap.add_argument("--low", type=float, default=None,
                    help="nlbin low normalization percentile "
                    "(reference --low)")
    ap.add_argument("--high", type=float, default=None,
                    help="nlbin high normalization percentile "
                    "(reference --high)")
    ap.add_argument(
        "--temperature", type=float, default=1.0,
        help="the kraken ocr -t softmax temperature for the --model "
        "loaded-recognizer path: confidence calibration only — the "
        "prediction is temperature-invariant (argmax unchanged)",
    )
    ap.add_argument(
        "--no-segmentation", action="store_true",
        help="the kraken CLI's ocr -s/--no-segmentation: treat each input "
        "image as ONE text line (pre-cropped line strips; trimmed to the "
        "ink extent) — XML/JSON payloads keep their pre-segmented path",
    )
    ap.add_argument(
        "--text-direction", default=None,
        choices=["horizontal-lr", "horizontal-rl", "vertical-lr",
                 "vertical-rl", "vertical"],
        help="principal text direction for the extraction run (the kraken "
        "CLI's -d/--text-direction; default derives horizontal-{lr,rl} "
        "from the page language, 'vertical' derives vertical-{lr,rl})",
    )
    ap.add_argument(
        "--compile-dataset",
        action="store_true",
        help="ketos-compile analog (sources/arrow_dataset.xml_line_dataset): "
        "--input is a directory of transcribed ALTO/PageXML files (page "
        "images resolved from each markup's image filename, next to its "
        "XML) or a parquet of (url, xml, image) pairs; crop every line's "
        "boundary from the page image, pair it with its transcription, "
        "honor split tags in the markup, and write the reference-format "
        "dataset to --output (.arrow single file, else a shard directory)",
    )
    ap.add_argument(
        "--resize", default="fail", choices=["fail", "union", "add"],
        help="--train-recognizer behavior when the dataset has characters "
        "outside the model codec: fail (default, the reference's), or "
        "union/add — extend the codec and output head in place "
        "(training.extend_codec) so fine-tuning learns the new characters",
    )
    ap.add_argument(
        "--convert-model",
        action="store_true",
        help="ketos-convert analog (kernels/modelio.convert_models): "
        "--input is one or more model weights files (comma-separated; "
        "safetensors or CoreML, format-sniffed) — load every model from "
        "each and write them combined into --output in --weights-format. "
        "Driver-only (no Spark session); an existing output refuses",
    )
    ap.add_argument(
        "--weights-format", default="safetensors",
        choices=["safetensors", "coreml"],
        help="output container for --convert-model (coreml takes exactly "
        "one model and coerces the suffix to .mlmodel)",
    )
    ap.add_argument(
        "--set-model-metadata",
        default=None,
        metavar="JSON",
        help="model-metadata surgery (the reference contrib "
        "set_seg_options.py capability; kernels/modelio."
        "set_model_metadata): --input is a model weights file; merge this "
        "JSON object into every contained model's metadata (null deletes "
        "a key, nested objects merge) and write to --output in "
        "--weights-format. Driver-only",
    )
    ap.add_argument(
        "--roadd",
        action="store_true",
        help="ketos-roadd analog (kernels/ro_train.attach_ro_model): "
        "--input is '<seg_weights>,<ro_weights>' — nest the reading-order "
        "pair-MLP inside the segmentation weights file as an aux model "
        "and write the combined container to --output; point "
        "KRAKEN_SPARK_RO_NET at it to drive neural reading order from "
        "the combined file. Driver-only (no Spark session)",
    )
    ap.add_argument(
        "--ro-level", default="baselines", choices=["baselines", "regions"],
        help="which element level the attached RO model orders",
    )
    ap.add_argument(
        "--normalization", default=None,
        choices=["NFD", "NFKD", "NFC", "NFKC"],
        help="ground-truth unicode normalization for --train-recognizer / "
        "--test-recognizer (the reference ketos -u flag; "
        "training.gt_text_transform)",
    )
    ap.add_argument(
        "--normalize-whitespace", action="store_true",
        help="fold every GT whitespace run to a single space and strip "
        "(the reference ketos -n flag), for --train-recognizer / "
        "--test-recognizer",
    )
    ap.add_argument(
        "--augment", action="store_true",
        help="--train-recognizer data augmentation (the reference ketos "
        "--augment flag; kernels/augment.py DefaultAugmenter analog: "
        "erasing/blur/perspective/rotation/affine with per-(step, line) "
        "keyed RNG — deterministic and partitioning-independent)",
    )
    ap.add_argument("--train-steps", type=int, default=50)
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument(
        "--train-lr", type=float, default=None,
        help="learning rate (default 1e-3 for the recognizer legs, 0.05 "
        "for --train-segmenter's small conv net)")
    ap.add_argument(
        "--train-sample-mod", type=int, default=1,
        help="draw ~1/k of the lines per step via a seeded hash filter",
    )
    ap.add_argument(
        "--export-dataset",
        default=None,
        metavar="PATH",
        help="additionally compile a binary line-training dataset from the "
        "input documents: a single reference-format Arrow IPC file when "
        "PATH ends in .arrow, else a directory of per-partition shards "
        "with a manifest (sources/arrow_dataset.py)",
    )
    ap.add_argument(
        "--corpus-tick",
        action="store_true",
        help="(ice input AND output) one tick of the full LLM-corpus "
        "production loop over the input pages table: delta -> extraction "
        "-> Gopher+classifier quality gate -> incremental near-dup vs the "
        "retained output corpus -> one atomic commit of kept text + "
        "minhash dedup state + watermark (corpus_pipeline.corpus_tick — "
        "exactly-once, zero external state)",
    )
    ap.add_argument(
        "--no-quality-gate",
        action="store_true",
        help="(--corpus-tick) skip the quality gate, keep all extracted",
    )
    ap.add_argument(
        "--maintain",
        action="store_true",
        help="(ice output) table maintenance on the OUTPUT table instead "
        "of an extraction run: compact small data files into a "
        "row-preserving replace snapshot, expire all but the last "
        "--keep-snapshots snapshots, vacuum orphans past --vacuum-grace-ms "
        "(the Iceberg rewrite_data_files/expire_snapshots/"
        "remove_orphan_files triad — what keeps a per-tick appending "
        "corpus readable at 10^12 rows)",
    )
    ap.add_argument(
        "--keep-snapshots", type=int, default=10,
        help="(--maintain) snapshots to retain (default 10)",
    )
    ap.add_argument(
        "--vacuum-grace-ms", type=int, default=24 * 3600 * 1000,
        help="(--maintain) only vacuum orphans older than this (default 24h "
        "— a LIVE writer's staged files look like orphans until it commits)",
    )
    ap.add_argument(
        "--compact-target-bytes", type=int, default=512 << 20,
        help="(--maintain) compaction output file size target",
    )
    ap.add_argument(
        "--zorder-by", default=None, metavar="COLS",
        help="(--maintain) compact with multi-column Z-order clustering "
        "on these comma-separated columns instead of the table sort "
        "order (icetable.compact(zorder_by=...) — makes manifest-stat "
        "file skipping selective on every listed column)",
    )
    ap.add_argument(
        "--analyze-cols", default=None, metavar="COLS",
        help="(--maintain) also compute per-file NDV sketches for these "
        "comma-separated columns (icetable.analyze — Iceberg's "
        "compute_table_stats; incremental, only sketch-less files are "
        "scanned). approx_distinct then answers distinct-count questions "
        "from metadata alone",
    )
    ap.add_argument(
        "--ingest-pages",
        action="store_true",
        help="(ice output) ingest a new crawl dump into the OUTPUT pages "
        "table instead of running an extraction: --input (parquet or warc "
        "per --input-format) is recrawl-UPSERTED by url with "
        "newest-capture-wins on warc_ts (icetable.merge_by_key — Iceberg "
        "MERGE INTO semantics: stale captures dropped, pure inserts "
        "commit as plain appends so tailing consumers keep working)",
    )
    ap.add_argument(
        "--takedown",
        default=None,
        metavar="KEYS",
        help="(ice output) merge-on-read takedown on the OUTPUT table "
        "instead of an extraction run: comma-separated key values, or "
        "@FILE with one key per line. Commits ONE equality-delete file "
        "masking every matching row in O(metadata) — no data file is "
        "rewritten (icetable.delete_keys; Iceberg v2 MOR). The mask is "
        "materialized later by --maintain, which folds pending deletes "
        "copy-on-write before compacting",
    )
    ap.add_argument(
        "--takedown-key", default="url",
        help="(--takedown) key column the takedown values match (default url)",
    )
    ap.add_argument(
        "--propagate-takedowns",
        action="store_true",
        help="(ice input AND output) propagate row deletions committed to "
        "the INPUT table since the last propagation onto the derived "
        "OUTPUT table as one merge-on-read takedown commit "
        "(icetable.propagate_takedowns — the downstream half of a GDPR "
        "erasure; merges/recrawls never propagate as deletions)",
    )
    ap.add_argument(
        "--scrub-where",
        default=None,
        help="(ice output) merge-on-read POSITIONAL delete on the OUTPUT "
        "table: mask every row matching this SQL condition by its (file, "
        "row-ordinal) address — no key column needed, no data file "
        "rewritten (icetable.scrub_where; --maintain folds it)",
    )
    ap.add_argument(
        "--inspect",
        default=None,
        choices=["snapshots", "files", "partitions", "refs"],
        help="(ice output) print the OUTPUT table's metadata view as JSON "
        "lines instead of running an extraction (Iceberg's $snapshots/"
        "$files/$partitions audit tables — icetable.metadata_table)",
    )
    ap.add_argument(
        "--export-wet",
        default=None,
        metavar="DIR",
        help="additionally write the committed extractions as Common-Crawl "
        "WET shards (WARC conversion records, one .warc.wet.gz per "
        "partition + manifest; sources/warc.write_wet_shards)",
    )
    ap.add_argument(
        "--export-cdx",
        default=None,
        metavar="DIR",
        help="(warc input only) additionally build the Common-Crawl-style "
        "CDXJ random-access index over the input WARC files: surt-sorted "
        "cdx-NNNNN.gz shards + cluster.idx (sources/warc.write_cdx_shards)",
    )
    args = ap.parse_args(argv)

    if args.line_parallel and not args.model:
        ap.error("--line-parallel requires --model (it is the loaded-model "
                 "skew path; the default recognizer never needs it)")

    if args.list_models or args.show_model or args.get_model or args.publish_model:
        # driver-only repository verbs (kraken get/list/show + ketos
        # publish analogs, kraken_spark/repo.py) — no Spark session
        from kraken_spark import repo as mrepo

        root = args.model_repo or os.environ.get("KRAKEN_SPARK_MODEL_REPO")
        if not root:
            print("[kraken_spark] no --model-repo given")
            return 1
        if args.publish_model:
            meta = json.loads(args.publish_model)
            doi = mrepo.publish_model(root, args.input, meta,
                                      update_of=args.update_of)
            print(f"model PID: {doi}")
            return 0
        if args.show_model:
            try:
                rec = mrepo.get_description(root, args.show_model)
            except (KeyError, ValueError) as e:
                print(f"[kraken_spark] {e}")
                return 1
            print(mrepo.render_description(rec), end="")
            return 0
        if args.get_model:
            try:
                mdir = mrepo.get_model(root, args.get_model,
                                       cache_dir=args.model_cache)
            except (KeyError, ValueError) as e:
                print(f"[kraken_spark] {e}")
                return 1
            cand = mrepo.model_candidates(mdir)
            print(f"Model dir: {mdir} (model files: {', '.join(cand)})")
            return 0
        listing = mrepo.list_models(
            root,
            model_type=args.filter_model_type,
            script=tuple(args.filter_script or ()),
            language=tuple(args.filter_language or ()),
            keyword=tuple(args.filter_keyword or ()),
        )
        for concept, records in sorted(listing.items()):
            print(concept)
            for r in records:
                print(f"  {r['doi']}\t{r.get('summary', '')}\t"
                      f"{'; '.join(r.get('model_type') or [])}\t"
                      f"{'; '.join(r.get('keywords') or [])}")
        return 0

    if args.model and args.model.startswith("repo:"):
        # resolve a repository id to a cached local model file (the
        # `kraken get` -> `kraken ocr -m` chain in one step)
        from kraken_spark import repo as mrepo

        root = args.model_repo or os.environ.get("KRAKEN_SPARK_MODEL_REPO")
        if not root:
            print("[kraken_spark] --model repo:<id> needs --model-repo")
            return 1
        mdir = mrepo.get_model(root, args.model[len("repo:"):],
                               cache_dir=args.model_cache)
        cand = mrepo.model_candidates(mdir)
        if not cand:
            print(f"[kraken_spark] record has no model file: {args.model}")
            return 1
        args.model = os.path.join(mdir, cand[0])
        print(f"[kraken_spark] resolved {cand[0]} from repository")

    if args.convert_model:
        # driver-only model-container surgery: no Spark session needed
        from kraken_spark.kernels.modelio import convert_models

        out = convert_models([p for p in args.input.split(",") if p],
                             args.output, args.weights_format)
        print(json.dumps({"output": out, "format": args.weights_format}))
        return 0

    if args.set_model_metadata:
        from kraken_spark.kernels.modelio import set_model_metadata

        out = set_model_metadata(args.input, args.output,
                                 json.loads(args.set_model_metadata),
                                 args.weights_format)
        print(json.dumps({"output": out, "format": args.weights_format}))
        return 0

    if args.roadd:
        from kraken_spark.kernels.ro_train import attach_ro_model

        parts = [p for p in args.input.split(",") if p]
        if len(parts) != 2:
            ap.error("--roadd needs --input '<seg_weights>,<ro_weights>'")
        out = attach_ro_model(parts[0], parts[1], args.output,
                              level=args.ro_level)
        print(json.dumps({"output": out, "level": args.ro_level}))
        return 0

    from pyspark.sql import SparkSession

    # under spark-submit the session/config comes from the cluster conf;
    # getOrCreate picks it up (session.get_spark is the local/test factory)
    spark = SparkSession.builder.getOrCreate()

    from kraken_spark.operators.serialization import serialize_extractions
    from kraken_spark.pipeline import (read_output, remaining_documents,
                                       run_extraction, tail_extraction)

    if args.train_recognizer:
        from kraken_spark.training import train_recognizer_from_dataset

        out = train_recognizer_from_dataset(
            spark, args.input, args.output, steps=args.train_steps,
            batch=args.train_batch,
            lr=args.train_lr if args.train_lr is not None else 1e-3,
            sample_mod=args.train_sample_mod, init_model=args.model,
            resize=args.resize, normalization=args.normalization,
            normalize_whitespace=args.normalize_whitespace,
            augment=args.augment,
        )
        print(json.dumps(out))
        return 0

    if args.test_recognizer:
        if not args.model:
            ap.error("--test-recognizer requires --model")
        from kraken_spark.training import test_recognizer_on_dataset

        out = test_recognizer_on_dataset(
            spark, args.input, args.model, split=args.test_split,
            normalization=args.normalization,
            normalize_whitespace=args.normalize_whitespace)
        print(json.dumps(out))
        return 0

    if args.train_segmenter:
        from kraken_spark.sources.arrow_dataset import xml_pairs_df
        from kraken_spark.training import train_segmenter_from_pairs

        out = train_segmenter_from_pairs(
            spark, xml_pairs_df(spark, args.input), args.output,
            steps=args.train_steps,
            lr=args.train_lr if args.train_lr is not None else 0.05,
            augment=args.augment)
        print(json.dumps(out))
        return 0

    if args.train_ro:
        from kraken_spark.sources.arrow_dataset import xml_pairs_df
        from kraken_spark.training import train_ro_from_pairs

        out = train_ro_from_pairs(
            spark, xml_pairs_df(spark, args.input), args.output,
            steps=args.train_steps,
            lr=args.train_lr if args.train_lr is not None else 0.02,
            level=args.ro_level)
        print(json.dumps(out))
        return 0

    if args.test_segmenter:
        from kraken_spark.sources.arrow_dataset import xml_pairs_df
        from kraken_spark.training import test_segmenter_on_pairs

        out = test_segmenter_on_pairs(xml_pairs_df(spark, args.input),
                                      segmenter=args.segmenter or "blla")
        print(json.dumps(out))
        return 0

    if args.compile_dataset:
        from kraken_spark.sources.arrow_dataset import (write_ipc,
                                                        write_ipc_shards,
                                                        xml_line_dataset,
                                                        xml_pairs_df)

        lines = xml_line_dataset(xml_pairs_df(spark, args.input))
        if args.output.endswith(".arrow"):
            counts = write_ipc(lines, args.output)
        else:
            counts = write_ipc_shards(lines, args.output)
        print(json.dumps(counts))
        return 0

    if args.pretrain_recognizer:
        from kraken_spark.training import pretrain_recognizer_from_dataset

        out = pretrain_recognizer_from_dataset(
            spark, args.input, args.output, steps=args.train_steps,
            batch=args.train_batch,
            lr=args.train_lr if args.train_lr is not None else 1e-3,
            sample_mod=args.train_sample_mod,
        )
        print(json.dumps(out))
        return 0

    if args.inspect:
        from kraken_spark.sources import icetable

        df = icetable.metadata_table(spark, args.output, args.inspect)
        for line in df.toJSON().collect():  # metadata-sized, never row data
            print(line)
        return 0

    if args.propagate_takedowns:
        from kraken_spark.sources import icetable

        r = icetable.propagate_takedowns(
            spark, args.input, args.output, key=args.takedown_key,
            run_id=args.run_id,
        )
        if r["snapshot_id"] is None:
            print(
                "[kraken_spark] propagate: no unpropagated deletions "
                f"(source snapshot {r['source_snapshot_id']})"
            )
        else:
            print(
                f"[kraken_spark] propagate: {r['propagated_keys']} "
                f"{args.takedown_key} keys taken down through source "
                f"snapshot {r['source_snapshot_id']} -> {args.output} "
                f"snapshot {r['snapshot_id']} (merge-on-read; --maintain "
                "folds it)"
            )
        return 0

    if args.scrub_where:
        from kraken_spark.sources import icetable

        s = icetable.scrub_where(spark, args.output, args.scrub_where)
        if s is None:
            print("[kraken_spark] scrub: no matching rows — no-op")
        else:
            print(
                f"[kraken_spark] scrub: masked {s['n_pos_deletes']} rows "
                f"across {s['pos_files']} files in snapshot "
                f"{s['snapshot_id']} (merge-on-read positional; no data "
                f"file rewritten — --maintain folds it) -> {args.output}"
            )
        return 0

    if args.takedown:
        from kraken_spark.sources import icetable

        if args.takedown.startswith("@"):
            with open(args.takedown[1:]) as f:
                keys = [ln.strip() for ln in f if ln.strip()]
        else:
            keys = [k for k in args.takedown.split(",") if k]
        s = icetable.delete_keys(spark, args.output, keys, key=args.takedown_key)
        if s is None:
            print("[kraken_spark] takedown: empty key set or table — no-op")
        else:
            print(
                f"[kraken_spark] takedown: masked {s['n_delete_keys']} "
                f"{args.takedown_key} keys in snapshot {s['snapshot_id']} "
                f"(merge-on-read; no data file rewritten — --maintain "
                f"folds it) -> {args.output}"
            )
        return 0

    if args.maintain:
        from kraken_spark.sources import icetable

        # fold pending merge-on-read deletes first: the rewrite both
        # materializes takedowns and unblocks COW ops; compaction then
        # bin-packs the rewritten output with everything else
        f = icetable.rewrite_deletes(spark, args.output)
        c = icetable.compact(
            spark, args.output, target_bytes=args.compact_target_bytes,
            zorder_by=args.zorder_by.split(",") if args.zorder_by else None,
        )
        a = (
            icetable.analyze(
                spark, args.output, cols=args.analyze_cols.split(",")
            )
            if args.analyze_cols
            else None
        )
        e = icetable.expire_snapshots(args.output, keep_last=args.keep_snapshots)
        v = icetable.vacuum(args.output, grace_ms=args.vacuum_grace_ms)
        print(
            "[kraken_spark] maintain: "
            + (
                f"folded {f['folded_delete_files']} delete files "
                f"({f['deleted_rows']} rows), "
                if f
                else ""
            )
            + (
                f"compacted {c['compacted_files']} files "
                f"({c['compacted_bytes']} B) into {c['n_new_files']}, "
                if c
                else "nothing to compact, "
            )
            + (f"analyzed {a['analyzed_files']} files for NDV, " if a else "")
            + f"expired {len(e['expired_snapshots'])} snapshots "
            f"(+{e['deleted_files']} unreachable files), vacuumed "
            f"{v['deleted_files']} orphans -> {args.output}"
        )
        return 0

    if args.corpus_tick:
        from kraken_spark.corpus_pipeline import corpus_tick

        r = corpus_tick(
            spark,
            args.input,
            args.output,
            run_id=args.run_id,
            num_partitions=args.partitions,
            require_quality=not args.no_quality_gate,
            skip_delete_snapshots=args.skip_delete_snapshots,
        )
        if r["lost_race"]:
            print(
                "[kraken_spark] corpus tick: lost the commit race to a "
                f"concurrent tick at source snapshot {r['source_snapshot_id']} "
                "— nothing committed (the winner covered this delta)"
            )
            return 0
        print(
            f"[kraken_spark] corpus tick: {r['extracted']} extracted, "
            f"{r['quality_pass']} passed quality, {r['kept_new']} kept "
            f"({r['dropped_dup']} near-dups dropped; source snapshot "
            f"{r['source_snapshot_id']}) -> {args.output}"
        )
        return 0

    if args.stream:
        from kraken_spark.pipeline import streaming_extraction

        q = streaming_extraction(
            spark,
            args.input,
            args.output,
            checkpoint=args.checkpoint or (args.output + "_ckpt"),
            available_now=True,
            num_partitions=args.partitions,
            kraken_model_path=args.model,
            skip_delete_snapshots=args.skip_delete_snapshots,
        )
        q.awaitTermination()
        from kraken_spark.sources import icetable as _it

        print(
            f"[kraken_spark] stream drained: output at snapshot "
            f"{_it.current_snapshot_id(args.output)} -> {args.output}"
        )
        return 0

    if args.tail:
        r = tail_extraction(
            spark,
            args.input,
            args.output,
            run_id=args.run_id,
            num_partitions=args.partitions,
            skip_delete_snapshots=args.skip_delete_snapshots,
            kraken_model_path=args.model,
        )
        print(
            f"[kraken_spark] tail tick: {r['processed']} new documents "
            f"(source snapshot {r['source_snapshot_id']}) -> {args.output}"
        )
        return 0

    if args.input_format == "warc":
        from pyspark.sql import functions as F

        from kraken_spark.sources.warc import explode_warc

        files = spark.read.format("binaryFile").load(args.input).select(
            "path", "content"
        )
        docs = (
            explode_warc(files)
            # WARC-Date is ISO-8601; the documents contract types it
            # timestamp (BASELINE.json input_hint)
            .withColumn("warc_ts", F.to_timestamp("warc_ts"))
            .withColumn("text", F.lit(None).cast("string"))
        )
    elif args.input_format == "ice":
        from kraken_spark.sources import icetable

        docs = icetable.read(spark, args.input)
    else:
        docs = spark.read.parquet(args.input)

    if args.ingest_pages:
        from kraken_spark.sources import icetable

        latest_by = "warc_ts" if "warc_ts" in docs.columns else None
        s = icetable.merge_by_key(
            spark, args.output, docs, key="url", latest_by=latest_by
        )
        if s is None:
            print("[kraken_spark] ingest: dump is empty or fully stale — "
                  f"nothing committed -> {args.output}")
            return 0
        print(
            f"[kraken_spark] ingest: {s['inserted_rows']} inserted, "
            f"{s['replaced_rows']} recrawls replaced, "
            f"{s['dropped_stale_delta_rows']} stale captures dropped "
            f"(snapshot {s['snapshot_id']}) -> {args.output}"
        )
        return 0

    raw_docs = docs  # pre-resume view, reused by the sidecar stages
    skip_extract = False
    if args.resume:
        docs = remaining_documents(docs, args.output, args.table_format)
        n = docs.count()
        print(f"[kraken_spark] resume: {n} documents remaining")
        # a fully-committed output skips extraction but still serves the
        # sidecar stages (--serialize/--export-dataset/--report)
        skip_extract = n == 0
    if not skip_extract:
        run_extraction(
            docs,
            out_path=args.output,
            metrics_path=args.metrics,
            run_id=args.run_id,
            num_partitions=args.partitions,
            kraken_model_path=args.model,
            table_format=args.table_format,
            segmenter=args.segmenter or "pageseg",
            text_direction=args.text_direction,
            no_segmentation=args.no_segmentation,
            temperature=args.temperature,
            nlbin_params={k: v for k, v in (
                ("threshold", args.threshold), ("escale", args.escale),
                ("perc", args.perc), ("low", args.low),
                ("high", args.high)) if v is not None} or None,
            line_parallel=args.line_parallel,
        )
    if args.serialize:
        ext = read_output(spark, args.output, args.table_format)
        serialize_extractions(
            ext, args.serialize,
            subline=not args.no_subline_segmentation,
        ).write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}_{args.serialize}"
        )
    if args.overlay:
        from kraken_spark.operators.serialization import overlay_extractions

        ext = read_output(spark, args.output, args.table_format)
        overlay_extractions(
            raw_docs, ext, kind=args.overlay,
        ).write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}_overlay_{args.overlay}"
        )
    done = read_output(spark, args.output, args.table_format)
    print(f"[kraken_spark] committed {done.count()} extraction rows -> {args.output}")
    if args.export_wet:
        from kraken_spark.sources.warc import write_wet_shards

        write_wet_shards(done, args.export_wet)
        print(f"[kraken_spark] WET shards -> {args.export_wet}")
    if args.export_cdx and args.input_format != "warc":
        print("[kraken_spark] --export-cdx skipped: only warc input carries "
              "the (file, offset, length) spans the index records")
    elif args.export_cdx:
        from kraken_spark.sources.warc import cdx_index, write_cdx_shards

        write_cdx_shards(cdx_index(files), args.export_cdx)
        print(f"[kraken_spark] CDX index -> {args.export_cdx}")
    if args.export_dataset and args.input_format == "warc":
        # WARC records carry no ground-truth transcription; the synthesized
        # NULL text column must not reach the line-dataset compiler
        print("[kraken_spark] --export-dataset skipped: warc input has no ground truth")
    elif args.export_dataset:
        from kraken_spark.sources.arrow_dataset import (build_binary_dataset,
                                                        line_dataset,
                                                        write_ipc_shards)

        all_docs = raw_docs
        if args.export_dataset.endswith(".arrow"):
            counts = build_binary_dataset(all_docs, args.export_dataset)
        else:
            counts = write_ipc_shards(line_dataset(all_docs), args.export_dataset)
        print(f"[kraken_spark] exported {counts['all']} training lines "
              f"({counts['train']}/{counts['validation']}/{counts['test']} "
              f"train/val/test) -> {args.export_dataset}")
    if args.report:
        all_docs = raw_docs
        if "text" not in all_docs.columns or args.input_format == "warc":
            print("[kraken_spark] --report skipped: input has no ground-truth text column")
            return 0
        import pyspark.sql.functions as F

        from kraken_spark.kernels.serialize import to_report
        from kraken_spark.operators.extraction import report_over

        rows = report_over(
            done.select("url", "lang", "text"),
            all_docs.select("url", F.col("text").alias("gt")),
        ).collect()
        chars = sum(r.chars for r in rows)
        errors = sum(r.errors for r in rows)
        ci_errors = sum(r.ci_errors for r in rows)
        words = sum(r.words for r in rows)
        word_errors = sum(r.word_errors for r in rows)
        print(
            to_report(
                {
                    "name": args.run_id,
                    "chars": chars,
                    "errors": errors,
                    # corpus-weighted accuracies (1 - sum(err)/sum(total)),
                    # consistent with the summed chars/errors lines above —
                    # NOT the worst single language
                    "character_accuracy": 100.0 * (1 - errors / max(chars, 1)),
                    "character_CI_accuracy": 100.0 * (1 - ci_errors / max(chars, 1)),
                    "word_accuracy": 100.0 * (1 - word_errors / max(words, 1)),
                    "insertions": sum(r.insertions for r in rows),
                    "deletions": sum(r.deletions for r in rows),
                    "substitutions": sum(r.substitutions for r in rows),
                    "scripts": [
                        (r.lang, r.chars, r.errors, r.char_acc) for r in rows
                    ],
                    "counts": [],
                }
            )
        )
        if args.report_per_file:
            # contrib/test_per_file.py detail view: one line per source
            # file plus across-file AVERAGE accuracies (mean of per-file
            # rates, the reference's aggregation — not corpus-weighted)
            detail = report_over(
                done.select("url", "lang", "text"),
                all_docs.select("url", F.col("text").alias("gt")),
                per_file=True,
            ).collect()
            for r in detail:
                print(
                    f"{r.url}\tChar: {r.chars}, "
                    f"CER: {100.0 - r.char_acc:.1f}%, "
                    f"WER: {100.0 - r.word_acc:.1f}%"
                )
            if detail:
                avg_c = sum(r.char_acc for r in detail) / len(detail)
                avg_w = sum(r.word_acc for r in detail) / len(detail)
                print(f"Average character accuracy: {avg_c:.2f}%")
                print(f"Average word accuracy: {avg_w:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
