"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All computed with built-in pyspark.sql.functions (JVM-side) — the UDF-free
hot path. Every query has an exact DuckDB oracle; regexes are written to
the POSIX subset both engines treat identically (DuckDB's regexp_replace
needs the 'g' flag to match Spark's replace-all default).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def t(spark: SparkSession, sf_dir: str, name: str = "documents"):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# BPE-ish pre-tokenizer regex (the GPT-2 pattern's engine-portable core):
# letter runs | digit runs | single non-alphanumeric symbols — counts
# subword-sized units, the scale proxy for "tokens" in corpus budgeting
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def text_token_stats(spark, sf):
    """Token counting: whitespace words + a BPE-ish regex unit count,
    per-language corpus stats."""
    d = t(spark, sf)
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    bpe = F.expr(f"regexp_count(text, '{_BPE_RE}')")
    return (
        d.select(
            "lang",
            toks.alias("n_tokens"),
            bpe.alias("n_bpe"),
            F.length("text").alias("n_chars2"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_units"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.round(F.avg(F.col("n_chars2") / F.col("n_tokens")), 6).alias("avg_token_len"),
        )
        .orderBy("lang")
    )


TOKEN_STATS_SQL = f"""
WITH toks AS (
  SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe,
         length(text) AS n_chars2
  FROM documents)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_units,
       ROUND(AVG(n_tokens), 6) AS avg_tokens,
       ROUND(AVG(CAST(n_chars2 AS DOUBLE) / n_tokens), 6) AS avg_token_len
FROM toks GROUP BY lang ORDER BY lang
"""


def text_quality_score(spark, sf):
    """Heuristic quality score from length / token / alpha-ratio features
    (the shape of C4/Gopher-style quality filters)."""
    d = t(spark, sf)
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    alpha = F.length(F.regexp_replace("text", "[^a-z ]", ""))
    score = F.round(
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * (alpha / F.length("text"))
        + 0.3 * F.least(F.lit(1.0), F.length("text") / F.lit(500.0)),
        6,
    )
    return (
        d.select("doc_id", score.alias("quality"), n_tokens.alias("n_tokens"))
        .filter(F.col("quality") > 0.5)
        .orderBy("doc_id")
    )


QUALITY_SQL = """
WITH q AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         ROUND(0.4 * LEAST(1.0, len(regexp_split_to_array(trim(text), '\\s+')) / 100.0)
             + 0.3 * (CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE) / length(text))
             + 0.3 * LEAST(1.0, length(text) / 500.0), 6) AS quality
  FROM documents)
SELECT doc_id, quality, n_tokens FROM q WHERE quality > 0.5 ORDER BY doc_id
"""


def lang_id_heuristic(spark, sf):
    """Marker-token language scoring (n-gram LID heuristic): count hits of
    per-language marker words, argmax with deterministic tie-break, compare
    against the labeled lang."""
    d = t(spark, sf)

    def hits(word):
        return (F.length("text") - F.length(F.regexp_replace("text", word, ""))) / len(word)

    score_en = hits("the") + hits("a ")
    score_db = hits("table") + hits("query")
    pred = (
        F.when(score_en > score_db, F.lit("en_like"))
        .when(score_db > score_en, F.lit("db_like"))
        .otherwise(F.lit("tie"))
    )
    return (
        d.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


LANG_ID_SQL = """
WITH scored AS (
  SELECT lang,
         (length(text) - length(replace(text, 'the', ''))) / 3.0
           + (length(text) - length(replace(text, 'a ', ''))) / 2.0 AS score_en,
         (length(text) - length(replace(text, 'table', ''))) / 5.0
           + (length(text) - length(replace(text, 'query', ''))) / 5.0 AS score_db
  FROM documents)
SELECT lang,
       CASE WHEN score_en > score_db THEN 'en_like'
            WHEN score_db > score_en THEN 'db_like' ELSE 'tie' END AS predicted,
       COUNT(*) AS n
FROM scored GROUP BY 1, 2 ORDER BY lang, predicted
"""


def doc_fingerprint(spark, sf):
    """Normalized md5 fingerprint (lowercase, collapsed whitespace) — the
    hash-groupBy form of document fingerprinting."""
    d = t(spark, sf)
    fp = F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")))
    return (
        d.select("doc_id", fp.alias("fingerprint"), "source")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("representative"))
        .filter(F.col("n_docs") >= 1)
        .groupBy("n_docs")
        .agg(F.count("*").alias("n_clusters"), F.min("representative").alias("min_rep"))
        .orderBy("n_docs")
    )


FINGERPRINT_SQL = """
WITH fp AS (
  SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
         COUNT(*) AS n_docs, MIN(doc_id) AS representative
  FROM documents GROUP BY 1)
SELECT n_docs, COUNT(*) AS n_clusters, MIN(representative) AS min_rep
FROM fp GROUP BY n_docs ORDER BY n_docs
"""


def doc_stats_grouping(spark, sf):
    """Rollup over (source, lang) — corpus composition report."""
    d = t(spark, sf)
    return (
        d.rollup("source", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first())
    )


DOC_STATS_SQL = """
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP (source, lang)
ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
"""


# --- learned-BPE token counting (library surface; not SQL-expressible) ---
#
# The oracle-checked token stats above use the regex proxy; this is the
# REAL thing: counts under the in-repo-trained BPE merge table
# (kernels/bpe.py, assets/bpe_merges.json — tools/train_bpe.py regenerates
# bit-for-bit). Arrow-batched mapInArrow, per-executor tokenizer singleton
# with a Zipf-friendly per-word LRU — map-only at 10^12 docs, zero shuffle.

_BPE_SINGLETON = {}


def _bpe():
    if "t" not in _BPE_SINGLETON:
        import json

        from kraken_spark.assets_io import asset_bytes
        from kraken_spark.kernels.bpe import BPE

        merges = [tuple(m) for m in json.loads(asset_bytes("bpe_merges.json").decode("utf-8"))]
        _BPE_SINGLETON["t"] = BPE(merges)
    return _BPE_SINGLETON["t"]


def bpe_token_counts(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(id, bpe_tokens, words) per document under the learned merge table.
    bpe_tokens == words for fully-merged in-vocabulary words; unseen words
    cost extra subword tokens — the honest corpus-budget denominator."""
    import pyarrow as pa

    schema = pa.schema(
        [(id_col, pa.int64()), ("bpe_tokens", pa.int64()), ("words", pa.int64())]
    )

    def fn(batches):
        tok = _bpe()
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: ids,
                    "bpe_tokens": tok.count_batch(texts),
                    "words": [len((t or "").split()) for t in texts],
                },
                schema=schema,
            )

    return docs.select(id_col, text_col).mapInArrow(fn, schema=f"{id_col} long, bpe_tokens long, words long")


QUERIES = {
    "text_token_stats": (text_token_stats, TOKEN_STATS_SQL),
    "text_quality_score": (text_quality_score, QUALITY_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "doc_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
    "doc_stats_grouping": (doc_stats_grouping, DOC_STATS_SQL),
}
