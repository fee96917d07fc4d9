"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship fused extraction over the deterministic synthetic
                Common-Crawl-style corpus (BASELINE.json input_hint shape).
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible query; the
                extraction-pipeline queries (x_*) are non-SQL-expressible
                (image decode + segmentation + CTC recognition) and get the
                rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: fused binarize->segment->order->recognize extraction
    over a 24-doc synthetic corpus; returns (url, lang, n_lines, cer, text)."""
    import pyspark.sql.functions as F

    from kraken_spark.corpus import generate_corpus_df
    from kraken_spark.pipeline import plan_extraction

    docs = generate_corpus_df(spark, 24)
    ext = plan_extraction(docs, num_partitions=8)
    return ext.select("url", "lang", "n_lines", F.round("cer", 6).alias("cer"), "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kraken_spark.functions.dedup import QUERIES as DEDUP
    from kraken_spark.functions.similarity import QUERIES as SIM
    from kraken_spark.functions.text import QUERIES as TEXT
    from kraken_spark.operators.extraction import QUERIES as EXTRACT
    from kraken_spark.operators.relational import QUERIES as REL
    from kraken_spark.operators.advanced import QUERIES as ADV
    from kraken_spark.operators.multimodal import QUERIES as MM
    from kraken_spark.operators.serialization import QUERIES as SER
    from kraken_spark.functions.webfilter import QUERIES as WEBF

    out: dict[str, Callable] = {}
    for catalog in (REL, TEXT, DEDUP, SIM, WEBF, EXTRACT, SER, MM, ADV):
        for name, (fn, _sql) in catalog.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from kraken_spark.functions.dedup import QUERIES as DEDUP
    from kraken_spark.functions.similarity import QUERIES as SIM
    from kraken_spark.functions.text import QUERIES as TEXT
    from kraken_spark.operators.extraction import QUERIES as EXTRACT
    from kraken_spark.operators.relational import QUERIES as REL
    from kraken_spark.operators.advanced import QUERIES as ADV
    from kraken_spark.operators.multimodal import QUERIES as MM
    from kraken_spark.operators.serialization import QUERIES as SER
    from kraken_spark.functions.webfilter import QUERIES as WEBF

    out: dict[str, str] = {}
    for catalog in (REL, TEXT, DEDUP, SIM, WEBF, EXTRACT, SER, MM, ADV):
        for name, (_fn, sql) in catalog.items():
            if sql is not None:
                out[name] = sql
    return out
