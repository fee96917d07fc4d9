#!/usr/bin/env python
"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <outdir> [query ...]
Defaults to the headline queries + the trained-rec plans. Driver-only
(explain does not execute the Arrow stages)."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "x_extract_text", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_items",
    "window_topk_per_group", "events_sessionize", "text_quality_score",
    "dedup_minhash_lsh", "knn_cosine_bruteforce", "x_extract_html",
]


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entry
    from kraken_spark.session import get_spark

    spark = get_spark(app="plans", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}")

    # the trained-rec / line-parallel plans (bench legs, not catalog queries)
    from kraken_spark.corpus import corpus_for
    from kraken_spark.kernels.rec_train import ASSET
    from kraken_spark.pipeline import plan_extraction
    from kraken_spark.pipeline_lines import plan_extraction_line_parallel

    slice24 = corpus_for(spark, SF_DIR).limit(24)
    for tag, plan in (
        ("trained_rec_fused", plan_extraction(
            slice24, num_partitions=CPUS, segmenter="blla",
            kraken_model_path=ASSET)),
        ("trained_rec_lp", plan_extraction_line_parallel(
            slice24, num_partitions=CPUS, segmenter="blla",
            kraken_model_path=ASSET)),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan.explain("formatted")
        with open(os.path.join(outdir, f"{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {tag}")


if __name__ == "__main__":
    main()
