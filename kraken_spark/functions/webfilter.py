"""Web-corpus quality filtering: the Gopher document rules and the C4
line-level cleaning pass — the two canonical published filters an LLM
training pipeline runs over extracted web text (Rae et al. 2021 "Scaling
Language Models" §A1.1; Raffel et al. 2020 "Exploring the Limits of
Transfer Learning" §2.2).

Both are pure pyspark.sql built-ins (split / higher-order filter / regexp
counts + one groupBy for the C4 reassembly) — no Python in the hot path,
so the pass over 10^12 documents is whole-stage-codegen map work, and the
only shuffle in c4_clean is the per-doc line regroup. Every rule has an
exact DuckDB twin (the *_SQL templates) pinned in tests/test_webfilter.py.

The reference engine has no corpus-filter stage (it is a page-image OCR
engine); these implement the brief's LLM-training-data-pipeline operators
over the `documents` table / extracted web text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Gopher rule thresholds (Rae et al. 2021, Table A1)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOP_WORD_HITS = 2
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents(id, text) -> per-doc Gopher features + rule flags +
    `passes`. Word = whitespace token; line = newline-split. All eight
    published rules: word-count band, mean-word-length band, symbol-to-word
    ratio (# and ...), bullet-line and ellipsis-line fractions, alphabetic-
    word fraction, and >=2 distinct stop words present."""
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words)
    lines = F.split("text", "\n")
    n_lines = F.size(lines)
    mean_wl = F.round(
        F.length(F.regexp_replace("text", r"\s+", "")) / n_words, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / n_words, 6
    )
    sym_ratio = F.round(
        (
            F.expr("regexp_count(text, '#')")
            + F.expr(r"regexp_count(text, '\\.\\.\\.')")
        )
        / n_words,
        6,
    )
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))) / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
        / n_lines,
        6,
    )
    padded = F.concat(
        F.lit(" "),
        F.lower(F.regexp_replace("text", r"\s+", " ")),
        F.lit(" "),
    )
    stop_hits = sum(
        F.when(F.instr(padded, f" {w} ") > 0, 1).otherwise(0)
        for w in GOPHER_STOP_WORDS
    )
    d = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_word_hits"),
    )
    passes = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (F.col("symbol_word_ratio") <= MAX_SYMBOL_WORD_RATIO)
        & (F.col("bullet_line_frac") <= MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
        & (F.col("stop_word_hits") >= MIN_STOP_WORD_HITS)
    )
    return d.withColumn("passes", passes)


_STOP_HITS_SQL = " + ".join(
    "CASE WHEN position(' {w} ' IN padded) > 0 THEN 1 ELSE 0 END".format(w=w)
    for w in GOPHER_STOP_WORDS
)

GOPHER_SQL_TEMPLATE = f"""
WITH feat AS (
  SELECT {{id_col}},
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
    regexp_split_to_array(trim(text), '\\s+') AS words,
    regexp_split_to_array(text, '\\n') AS lines,
    ' ' || lower(regexp_replace(text, '\\s+', ' ', 'g')) || ' ' AS padded,
    length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym
  FROM documents
), f2 AS (
  SELECT {{id_col}}, n_words,
    ROUND(CAST(n_nonspace AS DOUBLE) / n_words, 6) AS mean_word_len,
    ROUND(CAST(n_sym AS DOUBLE) / n_words, 6) AS symbol_word_ratio,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
          / len(lines), 6) AS bullet_line_frac,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
          / len(lines), 6) AS ellipsis_line_frac,
    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
          / n_words, 6) AS alpha_word_frac,
    {_STOP_HITS_SQL} AS stop_word_hits
  FROM feat)
SELECT *,
  (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
   AND mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
   AND symbol_word_ratio <= {MAX_SYMBOL_WORD_RATIO}
   AND bullet_line_frac <= {MAX_BULLET_LINE_FRAC}
   AND ellipsis_line_frac <= {MAX_ELLIPSIS_LINE_FRAC}
   AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
   AND stop_word_hits >= {MIN_STOP_WORD_HITS}) AS passes
FROM f2 ORDER BY {{id_col}}
"""

# C4 rules (Raffel et al. 2020 §2.2)
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# terminal punctuation a retained line must end with
_C4_LINE_END = r"""[.!?"”']$"""


def c4_clean(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The C4 cleaning pass: keep only lines that end in terminal
    punctuation, have >= 5 words, and do not mention javascript; then drop
    whole documents that contain 'lorem ipsum' or a curly brace, or whose
    retained text has < 3 sentences. Returns (id, text) with text rebuilt
    from the kept lines in original order ('' when the doc is dropped —
    every input id survives, mirroring strip_repeated_paragraphs).

    Plan shape: one posexplode + codegen line filters + ONE groupBy(id)
    rebuild — the same single-shuffle shape as the paragraph dedup."""
    lines = (
        docs.select(
            F.col(id_col),
            F.lower(F.col("text")).alias("_lc"),
            F.posexplode(F.split("text", "\n")).alias("pos", "line"),
        )
        .withColumn("tline", F.trim("line"))
        .where(
            F.col("tline").rlike(_C4_LINE_END)
            & (F.size(F.split("tline", r"\s+")) >= C4_MIN_LINE_WORDS)
            & ~F.lower("tline").contains("javascript")
        )
    )
    rebuilt = lines.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tline"))),
                lambda s: s["tline"],
            ),
            "\n",
        ).alias("kept"),
        F.first("_lc").alias("_lc"),
    )
    doc_ok = (
        ~F.col("_lc").contains("lorem ipsum")
        & ~F.col("_lc").contains("{")
        & (F.expr("regexp_count(kept, '[.!?]')") >= C4_MIN_SENTENCES)
    )
    cleaned = rebuilt.select(
        id_col, F.when(doc_ok, F.col("kept")).otherwise(F.lit("")).alias("text")
    )
    # every input id survives: docs with zero kept lines re-enter as ''
    return (
        docs.select(id_col)
        .join(cleaned, id_col, "left")
        .select(id_col, F.coalesce("text", F.lit("")).alias("text"))
    )


# --------------------------------------------------------------------------
# Model-based quality classifier (the DCLM/FineWeb-style final filter pass):
# logistic regression over hashed distinct-unigram presence, TRAINED IN-REPO
# (kernels/quality_train.py, seeded; tools/train_quality.py regenerates the
# asset bit-for-bit). Integer-quantized weights make the per-doc logit an
# exact BIGINT sum — bit-identical across Spark and DuckDB, and the whole
# inference is ONE whole-stage-codegen projection: zero shuffle, map-only
# at 10^12 documents (the array literal folds to a constant).
# --------------------------------------------------------------------------


def _quality_model():
    from ..kernels.quality_train import load_model

    return load_model()


def quality_classifier(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, text) -> (id, ml_logit_q, ml_pass): integer-quantized logistic-
    regression logit over hashed DISTINCT-token presence (repetition-proof:
    keyword stuffing cannot buy score by repeating prose words) and the
    >= 0 verdict. Hash = the repo's cross-engine md5-prefix BIGINT."""
    m = _quality_model()
    d, bias = m["d"], m["bias_q"]
    arr = "array(" + ",".join(f"{int(v)}L" for v in m["weights_q"]) + ")"
    logit = (
        "aggregate("
        f"array_distinct(transform(regexp_extract_all(lower(text), '{m['token_re']}', 0),"
        f" t -> cast(pmod(cast(conv(substr(md5(t),1,8),16,10) as bigint), {d}) as int))),"
        f" {bias}L,"
        f" (acc, b) -> acc + element_at({arr}, b + 1))"
    )
    return docs.select(
        id_col,
        F.expr(logit).alias("ml_logit_q"),
    ).withColumn("ml_pass", F.col("ml_logit_q") >= 0)


QUALITY_SQL_TEMPLATE = """
WITH w(b, wt) AS (VALUES {values}),
tok AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower(text), '{token_re}')) AS t
  FROM documents
),
tb AS (
  SELECT DISTINCT {id_col}, ('0x' || substr(md5(t), 1, 8))::BIGINT % {d} AS b
  FROM tok
),
s AS (
  SELECT {id_col}, CAST(SUM(wt) AS BIGINT) AS sw
  FROM tb JOIN w USING (b) GROUP BY {id_col}
)
SELECT d.{id_col},
  CAST({bias} + COALESCE(s.sw, 0) AS BIGINT) AS ml_logit_q,
  ({bias} + COALESCE(s.sw, 0)) >= 0 AS ml_pass
FROM documents d LEFT JOIN s USING ({id_col})
"""


def quality_sql(id_col: str = "doc_id") -> str:
    m = _quality_model()
    values = ", ".join(
        f"({b}, {int(w)})" for b, w in enumerate(m["weights_q"])
    )
    return QUALITY_SQL_TEMPLATE.format(
        values=values,
        id_col=id_col,
        token_re=m["token_re"],
        d=m["d"],
        bias=m["bias_q"],
    )


def web_quality_pipeline(spark, sf):
    """The published LLM web-corpus filter chain as ONE driver-checked
    query over the real `documents` table: per-doc Gopher features + rule
    verdict (Rae et al. 2021), the C4-cleaned text (Raffel et al. 2020),
    the corpus repeated-paragraph-stripped text (C4/RefinedWeb rule,
    functions/dedup.strip_repeated_paragraphs), and the IN-REPO-TRAINED
    model-based quality score (quality_classifier — the DCLM/FineWeb-style
    final pass), the Gopher repetition signals (gopher_repetition), and the
    CCNet-style LM perplexity bucket (lm_score — in-repo-trained char-3gram
    LM, head/middle/tail) — all six joined on doc_id so the driver's value
    hash pins every rule, both rebuilt texts, the learned-model logits, all
    13 repetition fractions, and the LM scores byte-for-byte against DuckDB.

    Plan shape at 10^12 docs: Gopher is pure map (zero shuffle); C4 is one
    posexplode + one groupBy; the paragraph strip is the documented
    3-shuffle hash-join shape; the classifier and the LM scorer are pure
    map (folded array-literal lookups); the final joins are co-keyed on
    doc_id."""
    from .dedup import strip_repeated_paragraphs
    from .text import t

    d = t(spark, sf).select("doc_id", "text")
    g = gopher_quality(d)
    c = c4_clean(d).select("doc_id", F.col("text").alias("c4_text"))
    p = (
        strip_repeated_paragraphs(d.select(F.col("doc_id").alias("url"), "text"))
        .select(F.col("url").alias("doc_id"), F.col("text").alias("nodup_text"))
    )
    q = quality_classifier(d)
    r = gopher_repetition(d)
    lm = lm_score(d)
    return (
        g.join(c, "doc_id")
        .join(p, "doc_id")
        .join(q, "doc_id")
        .join(r, "doc_id")
        .join(lm, "doc_id")
        .orderBy("doc_id")
    )


def _web_quality_pipeline_sql() -> str:
    from .dedup import MIN_PARA_LEN, STRIP_PARAGRAPHS_SQL_TEMPLATE

    gopher = GOPHER_SQL_TEMPLATE.format(id_col="doc_id")
    c4 = C4_SQL_TEMPLATE.format(id_col="doc_id")
    strip = STRIP_PARAGRAPHS_SQL_TEMPLATE.format(
        min_len=MIN_PARA_LEN, min_repeats=2
    ).replace("url", "doc_id")
    quality = quality_sql("doc_id")
    rep = gopher_repetition_sql("doc_id")
    rep_cols = ", ".join(
        f"r.{c}"
        for c in (
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_para_frac",
            "dup_para_char_frac",
            *(f"top_{n}gram_char_frac" for n in sorted(MAX_TOP_NGRAM_CHAR_FRAC)),
            *(f"dup_{n}gram_char_frac" for n in sorted(MAX_DUP_NGRAM_CHAR_FRAC)),
            "passes_repetition",
        )
    )
    lm = lm_sql("doc_id")
    return f"""
SELECT g.*, c.text AS c4_text, n.text AS nodup_text,
       q.ml_logit_q, q.ml_pass, {rep_cols},
       l.lm_sum_q, l.lm_n_tri, l.lm_mean_q, l.lm_bucket
FROM ({gopher}) g
JOIN ({c4}) c USING (doc_id)
JOIN ({strip}) n USING (doc_id)
JOIN ({quality}) q USING (doc_id)
JOIN ({rep}) r USING (doc_id)
JOIN ({lm}) l USING (doc_id)
ORDER BY doc_id
"""


C4_SQL_TEMPLATE = f"""
WITH sp AS (
  SELECT {{id_col}}, lower(text) AS lc, string_split(text, chr(10)) AS l
  FROM documents
), lines AS (
  SELECT {{id_col}}, lc, i AS pos, l[i] AS line
  FROM sp, LATERAL unnest(generate_series(1, len(l))) AS g(i)
), kept AS (
  SELECT {{id_col}}, lc, trim(line) AS tline, pos FROM lines
  WHERE regexp_matches(trim(line), '{_C4_LINE_END.replace("'", "''")}')
    AND len(regexp_split_to_array(trim(line), '\\s+')) >= {C4_MIN_LINE_WORDS}
    AND NOT contains(lower(trim(line)), 'javascript')
), rebuilt AS (
  SELECT {{id_col}}, any_value(lc) AS lc,
         string_agg(tline, chr(10) ORDER BY pos) AS kept_text
  FROM kept GROUP BY {{id_col}}
)
SELECT d.{{id_col}},
  COALESCE(CASE WHEN NOT contains(r.lc, 'lorem ipsum')
                 AND NOT contains(r.lc, '{{{{')
                 AND len(regexp_extract_all(r.kept_text, '[.!?]')) >= {C4_MIN_SENTENCES}
            THEN r.kept_text ELSE '' END, '') AS text
FROM documents d LEFT JOIN rebuilt r USING ({{id_col}})
ORDER BY d.{{id_col}}
"""


# --------------------------------------------------------------------------
# PII scrubbing (the BigScience-ROOTS / FineWeb pre-release pass: replace
# emails, IP addresses and phone-shaped numbers with stable tokens)
# --------------------------------------------------------------------------

# Patterns are written to the regex subset Java (Spark) and RE2 (DuckDB)
# treat identically: no lookaround, no backreferences, explicit classes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    r"(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\b"
)
# separator-delimited digit groups (3-5 groups total): matches
# +1 (555) 123-4567, 555-123-9876, +44 20 7946 0958; never plain integers
# or years (a separator is required between every group) and never inside
# longer digit runs (leading \b, or an explicit +)
PII_PHONE_RE = r"(\+[0-9]{1,4}|\b[0-9]{1,4})([-. ()]{1,2}[0-9]{2,4}){2,4}\b"

PII_TOKENS = {"email": "[EMAIL]", "ip": "[IP]", "phone": "[PHONE]"}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, text) -> (id, text, n_emails, n_ips, n_phones): emails, IPv4
    addresses and phone-shaped numbers replaced with stable tokens, with
    per-doc match counts for the release audit. Order matters and is
    fixed: emails first (their local part may contain digits), then IPs
    (dotted quads must not be eaten by the phone rule), then phones.
    Pure codegen regexp work — zero shuffle, map-only at any scale."""
    # regexp_count goes through the SQL parser: backslashes in the string
    # literal must be doubled (the module's established expr convention)
    def _count(col_name: str, pat: str):
        return F.expr(f"regexp_count({col_name}, '{pat.replace(chr(92), chr(92) * 2)}')")

    t1 = F.regexp_replace("text", PII_EMAIL_RE, PII_TOKENS["email"])
    d = docs.select(
        F.col(id_col),
        _count("text", PII_EMAIL_RE).alias("n_emails"),
        t1.alias("_t1"),
    )
    t2 = F.regexp_replace("_t1", PII_IPV4_RE, PII_TOKENS["ip"])
    d = d.select(
        id_col, "n_emails", _count("_t1", PII_IPV4_RE).alias("n_ips"), t2.alias("_t2")
    )
    phone_cnt = _count("_t2", PII_PHONE_RE)
    t3 = F.regexp_replace("_t2", PII_PHONE_RE, PII_TOKENS["phone"])
    return d.select(
        id_col,
        t3.alias("text"),
        "n_emails",
        "n_ips",
        phone_cnt.alias("n_phones"),
    )


PII_SQL_TEMPLATE = """
WITH s1 AS (
  SELECT {id_col},
    len(regexp_extract_all(text, '{email}')) AS n_emails,
    regexp_replace(text, '{email}', '[EMAIL]', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT {id_col}, n_emails,
    len(regexp_extract_all(t1, '{ip}')) AS n_ips,
    regexp_replace(t1, '{ip}', '[IP]', 'g') AS t2
  FROM s1
)
SELECT {id_col},
  regexp_replace(t2, '{phone}', '[PHONE]', 'g') AS text,
  n_emails, n_ips,
  len(regexp_extract_all(t2, '{phone}')) AS n_phones
FROM s2 ORDER BY {id_col}
"""


def pii_sql(id_col: str = "doc_id") -> str:
    # DuckDB single-quoted literals keep backslashes verbatim: patterns
    # drop in unescaped
    return PII_SQL_TEMPLATE.format(
        id_col=id_col, email=PII_EMAIL_RE, ip=PII_IPV4_RE, phone=PII_PHONE_RE
    )


# ---------------------------------------------------------------------------
# Token-budget stratified sampling (corpus mixing)

# 2^32 — the md5-prefix uniform draws below are 32-bit
_U32_SPAN = 4294967296.0


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    budgets: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic stratified downsample to a per-stratum token budget —
    the corpus-mixing pass that turns a filtered crawl into a training mix
    ("X billion tokens of en, Y of fr, ..."). Returns one row per input
    doc: (id, stratum, n_tokens, rate, sampled) where `sampled` marks the
    kept docs and E[sum of sampled n_tokens per stratum] == min(budget,
    stratum total).

    Sampling is a pure function of the doc id — no RNG state, so the mix
    is reproducible across runs/retries/partitionings (exactly-once
    semantics survive task retries, the property Bernoulli RNG sampling
    loses). Draw: first 8 md5 hex digits of the id as a 32-bit uniform,
    kept iff u < rate * 2^32; the cross-engine recipe pinned in
    functions/dedup.py. `rate = least(1, budget/stratum_tokens)` is one
    double division of two exact BIGINTs, bit-identical in any IEEE-754
    engine — the DuckDB twin (TOKEN_BUDGET_SQL_TEMPLATE) reproduces the
    sampled set exactly.

    Scale shape: one map-only token-count projection, one groupBy over
    the (tiny) strata vocabulary, the totals broadcast back — the 10^12-row
    side is never shuffled. `budgets` overrides the default budget for
    named strata (the per-language mixing weights).
    """
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    d = docs.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        n_tok.alias("n_tokens"),
    )
    totals = d.groupBy("stratum").agg(
        F.sum("n_tokens").alias("stratum_tokens")
    )
    b = F.lit(int(budget_tokens)).cast("bigint")
    for k in sorted(budgets or {}):
        b = F.when(F.col("stratum") == k, F.lit(int(budgets[k])).cast("bigint")).otherwise(b)
    rate = F.least(
        F.lit(1.0), b.cast("double") / F.col("stratum_tokens").cast("double")
    )
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return (
        d.join(F.broadcast(totals), "stratum")
        .select(
            F.col(id_col),
            "stratum",
            "n_tokens",
            "stratum_tokens",
            rate.alias("rate"),
            (u.cast("double") < rate * F.lit(_U32_SPAN)).alias("sampled"),
        )
    )


def token_budget_sql(
    budget_tokens: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    budgets: dict[str, int] | None = None,
) -> str:
    """DuckDB twin of token_budget_sample (exact: integer token counts,
    one double division, 32-bit md5-prefix draw)."""
    b = f"CAST({int(budget_tokens)} AS BIGINT)"
    for k in sorted(budgets or {}):
        b = (
            f"CASE WHEN stratum = '{k}' THEN CAST({int(budgets[k])} AS BIGINT) "
            f"ELSE {b} END"
        )
    return f"""
WITH d AS (
  SELECT {id_col}, {strata_col} AS stratum,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
), t AS (
  SELECT stratum, CAST(SUM(n_tokens) AS BIGINT) AS stratum_tokens
  FROM d GROUP BY stratum
)
SELECT d.{id_col}, d.stratum, d.n_tokens, t.stratum_tokens,
  LEAST(1.0, CAST({b} AS DOUBLE) / CAST(t.stratum_tokens AS DOUBLE)) AS rate,
  CAST(CAST(('0x' || substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
    < LEAST(1.0, CAST({b} AS DOUBLE) / CAST(t.stratum_tokens AS DOUBLE)) * {_U32_SPAN}
    AS sampled
FROM d JOIN t USING (stratum)
"""


# ---------------------------------------------------------------------------
# Gopher repetition filters (Rae et al. 2021, Table A1 second half)

MAX_DUP_LINE_FRAC = 0.30
MAX_DUP_PARA_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = 0.20
MAX_DUP_PARA_CHAR_FRAC = 0.20
MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
MAX_DUP_NGRAM_CHAR_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_BL = "bigint"


def _wc(g):
    # word characters of an n-gram (separator spaces excluded; split
    # tokens themselves contain no whitespace)
    return F.length(F.regexp_replace(g, " ", "")).cast(_BL)


def _ngrams(words, n: int):
    cnt = F.size(words) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _ngram_masses(words, n: int):
    """(top_mass, dup_mass, tot_mass) over the doc's word n-grams, where
    mass(g) = count(g) * wordchars(g): ONE O(G log G) array_sort plus ONE
    linear fold per row, entirely inside codegen — no shuffle, no explode,
    so the 10^12-doc pass stays map-only (the same signals computed the
    textbook way cost an explode + groupBy(doc, n, gram) shuffle of ~n
    copies of the corpus)."""
    s = F.array_sort(_ngrams(words, n))
    zero = F.lit(0).cast(_BL)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("dup"),
        zero.alias("best"),
    )

    def merge(st, x):
        same = st["prev"].isNotNull() & (st["prev"] == x)
        mass = F.when(st["prev"].isNull(), zero).otherwise(
            st["run"] * _wc(st["prev"])
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, st["run"] + F.lit(1).cast(_BL)).otherwise(
                F.lit(1).cast(_BL)
            ).alias("run"),
            F.when(same, st["dup"]).otherwise(
                st["dup"] + F.when(st["run"] > 1, mass).otherwise(zero)
            ).alias("dup"),
            F.when(same, st["best"]).otherwise(
                F.greatest(st["best"], mass)
            ).alias("best"),
        )

    def finish(st):
        mass = F.when(st["prev"].isNull(), zero).otherwise(
            st["run"] * _wc(st["prev"])
        )
        return F.struct(
            (st["dup"] + F.when(st["run"] > 1, mass).otherwise(zero)).alias("dup"),
            F.greatest(st["best"], mass).alias("best"),
        )

    closed = F.aggregate(s, init, merge, finish)
    tot = F.aggregate(s, zero, lambda a, x: a + _wc(x))
    frac = lambda num: F.when(tot > 0, F.round(num / tot, 6)).otherwise(F.lit(0.0))
    return frac(closed["best"]), frac(closed["dup"])


def _dup_array_stats(arr):
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))
    zero = F.lit(0).cast(_BL)
    sl = F.aggregate(arr, zero, lambda a, x: a + F.length(x).cast(_BL))
    sld = F.aggregate(
        F.array_distinct(arr), zero, lambda a, x: a + F.length(x).cast(_BL)
    )
    frac = F.round((n - nd) / n, 6)
    cfrac = F.when(sl > 0, F.round((sl - sld) / sl, 6)).otherwise(F.lit(0.0))
    return frac, cfrac


def gopher_repetition(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents(id, text) -> the Gopher repetition signals + `passes_repetition`
    (Rae et al. 2021 Table A1, repetition half): duplicate line / paragraph
    fractions and their character fractions, top-{2,3,4}-gram character
    fractions, duplicated-{5..10}-gram character fractions.

    Character fractions are occurrence-mass definitions: for n-grams,
    mass(g) = count(g) * wordchars(g), top = max mass / total mass, dup =
    mass of grams occurring >1 time / total mass (overlapping occurrences
    each count — a documented, deterministic variant of the paper's
    position-marked measure, monotone in repetition and identically
    computable in any SQL engine); line/paragraph char fractions count
    characters in occurrences beyond the first, over line characters.

    Wholly map-only (see _ngram_masses) with an exact DuckDB twin
    (gopher_repetition_sql) pinned on constructed + real tables.
    """
    words = F.split(F.trim("text"), r"\s+")
    lines = F.split("text", "\n")
    paras = F.split("text", r"\n{2,}")
    dlf, dlcf = _dup_array_stats(lines)
    dpf, dpcf = _dup_array_stats(paras)
    cols = [
        F.col(id_col),
        dlf.alias("dup_line_frac"),
        dlcf.alias("dup_line_char_frac"),
        dpf.alias("dup_para_frac"),
        dpcf.alias("dup_para_char_frac"),
    ]
    for n in sorted(MAX_TOP_NGRAM_CHAR_FRAC):
        top, _ = _ngram_masses(words, n)
        cols.append(top.alias(f"top_{n}gram_char_frac"))
    for n in sorted(MAX_DUP_NGRAM_CHAR_FRAC):
        _, dup = _ngram_masses(words, n)
        cols.append(dup.alias(f"dup_{n}gram_char_frac"))
    d = docs.select(*cols)
    passes = (
        (F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC)
        & (F.col("dup_line_char_frac") <= MAX_DUP_LINE_CHAR_FRAC)
        & (F.col("dup_para_frac") <= MAX_DUP_PARA_FRAC)
        & (F.col("dup_para_char_frac") <= MAX_DUP_PARA_CHAR_FRAC)
    )
    for n, t in MAX_TOP_NGRAM_CHAR_FRAC.items():
        passes = passes & (F.col(f"top_{n}gram_char_frac") <= t)
    for n, t in MAX_DUP_NGRAM_CHAR_FRAC.items():
        passes = passes & (F.col(f"dup_{n}gram_char_frac") <= t)
    return d.withColumn("passes_repetition", passes)


def gopher_repetition_sql(id_col: str = "doc_id") -> str:
    """DuckDB twin of gopher_repetition (exact; the small-data oracle uses
    the textbook unnest + GROUP BY shape the Spark fold avoids)."""
    ns = sorted(MAX_TOP_NGRAM_CHAR_FRAC) + sorted(MAX_DUP_NGRAM_CHAR_FRAC)
    values = ",".join(f"({n})" for n in ns)
    piv_cols, out_cols, conds = [], [], [
        f"dup_line_frac <= {MAX_DUP_LINE_FRAC}",
        f"dup_line_char_frac <= {MAX_DUP_LINE_CHAR_FRAC}",
        f"dup_para_frac <= {MAX_DUP_PARA_FRAC}",
        f"dup_para_char_frac <= {MAX_DUP_PARA_CHAR_FRAC}",
    ]
    for n in sorted(MAX_TOP_NGRAM_CHAR_FRAC):
        piv_cols.append(
            f"MAX(CASE WHEN n={n} THEN CASE WHEN tot>0 THEN "
            f"ROUND(CAST(best AS DOUBLE)/tot, 6) ELSE 0.0 END END) AS top_{n}"
        )
        out_cols.append(f"COALESCE(top_{n}, 0.0) AS top_{n}gram_char_frac")
        conds.append(
            f"COALESCE(top_{n}, 0.0) <= {MAX_TOP_NGRAM_CHAR_FRAC[n]}"
        )
    for n in sorted(MAX_DUP_NGRAM_CHAR_FRAC):
        piv_cols.append(
            f"MAX(CASE WHEN n={n} THEN CASE WHEN tot>0 THEN "
            f"ROUND(CAST(dup AS DOUBLE)/tot, 6) ELSE 0.0 END END) AS dup_{n}"
        )
        out_cols.append(f"COALESCE(dup_{n}, 0.0) AS dup_{n}gram_char_frac")
        conds.append(
            f"COALESCE(dup_{n}, 0.0) <= {MAX_DUP_NGRAM_CHAR_FRAC[n]}"
        )
    return f"""
WITH d AS (
  SELECT {id_col},
    regexp_split_to_array(trim(text), '\\s+') AS words,
    regexp_split_to_array(text, '\\n') AS lines,
    regexp_split_to_array(text, '\\n{{2,}}') AS paras
  FROM documents
), base AS (
  SELECT {id_col},
    ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines), 6) AS dup_line_frac,
    CASE WHEN COALESCE(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0) > 0
      THEN ROUND(CAST(COALESCE(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0)
                    - COALESCE(list_aggregate(list_transform(list_distinct(lines), x -> length(x)), 'sum'), 0) AS DOUBLE)
               / COALESCE(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0), 6)
      ELSE 0.0 END AS dup_line_char_frac,
    ROUND(CAST(len(paras) - len(list_distinct(paras)) AS DOUBLE) / len(paras), 6) AS dup_para_frac,
    CASE WHEN COALESCE(list_aggregate(list_transform(paras, x -> length(x)), 'sum'), 0) > 0
      THEN ROUND(CAST(COALESCE(list_aggregate(list_transform(paras, x -> length(x)), 'sum'), 0)
                    - COALESCE(list_aggregate(list_transform(list_distinct(paras), x -> length(x)), 'sum'), 0) AS DOUBLE)
               / COALESCE(list_aggregate(list_transform(paras, x -> length(x)), 'sum'), 0), 6)
      ELSE 0.0 END AS dup_para_char_frac
  FROM d
), ng0 AS (
  SELECT {id_col}, n, words,
         unnest(generate_series(1, greatest(len(words) - n + 1, 0))) AS pos
  FROM d, (VALUES {values}) ns(n)
), cnt AS (
  SELECT {id_col}, n, array_to_string(words[pos:pos+n-1], ' ') AS g, COUNT(*) AS c
  FROM ng0 GROUP BY 1, 2, 3
), agg AS (
  SELECT {id_col}, n,
    SUM(c * length(replace(g, ' ', ''))) AS tot,
    COALESCE(SUM(CASE WHEN c > 1 THEN c * length(replace(g, ' ', '')) END), 0) AS dup,
    MAX(c * length(replace(g, ' ', ''))) AS best
  FROM cnt GROUP BY 1, 2
), piv AS (
  SELECT {id_col}, {", ".join(piv_cols)} FROM agg GROUP BY 1
)
SELECT b.{id_col}, b.dup_line_frac, b.dup_line_char_frac,
       b.dup_para_frac, b.dup_para_char_frac,
       {", ".join(out_cols)},
       ({" AND ".join(conds)}) AS passes_repetition
FROM base b LEFT JOIN piv USING ({id_col})
"""


# --- compression-ratio junk signal (the CCNet/corpus-audit heuristic) ---


def compression_signals(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, raw_bytes, zlib_bytes, compression_ratio) per document —
    zlib-compressed size over raw UTF-8 size. Templated/repetitive
    boilerplate compresses far below prose (ratio << 0.4); encrypted or
    random-noise payloads barely compress (ratio ~ 1). Published corpus
    audits use the two tails as drop candidates; this emits the raw signal
    and leaves thresholds to the consumer.

    Arrow-batched mapInArrow (zlib is per-batch C, no per-row Python
    round-trips) — map-only, zero shuffle at 10^12 docs."""
    import pyarrow as pa

    def fn(batches):
        import zlib

        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            raw, comp, ratio = [], [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, 6))
                raw.append(len(b))
                comp.append(c)
                ratio.append(round(c / len(b), 6) if b else 0.0)
            yield pa.RecordBatch.from_pydict(
                {id_col: ids, "raw_bytes": raw, "zlib_bytes": comp, "compression_ratio": ratio}
            )

    return docs.select(id_col, text_col).mapInArrow(
        fn, schema=f"{id_col} long, raw_bytes long, zlib_bytes long, compression_ratio double"
    )


# --- CCNet-style LM perplexity bucketing (Wenzek et al. 2020) -------------
#
# Score every document with the in-repo-trained character-trigram LM
# (kernels/lm_train.py — quantized log-probs, seeded synthetic prose) and
# assign the head/middle/tail corpus bucket by the per-char mean. Exactly
# the quality_classifier execution shape: ONE whole-stage-codegen
# projection (folded array-literal lookup), zero shuffle, map-only at
# 10^12 documents; the DuckDB twin reproduces the BIGINT sum bit-for-bit.


def _lm_model():
    from ..kernels.lm_train import load_lm

    return load_lm()


def lm_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, lm_sum_q, lm_n_tri, lm_mean_q, lm_bucket) per document."""
    m = _lm_model()
    d = m["d"]
    arr = "array(" + ",".join(f"{int(v)}L" for v in m["logp_q"]) + ")"
    n_tri = "greatest(length(text) - 2, 1)"
    s = (
        "aggregate("
        f"transform(sequence(1, {n_tri}),"
        f" i -> cast(pmod(cast(conv(substr(md5(substr(lower(text), i, 3)),1,8),16,10) as bigint), {d}) as int)),"
        " 0L,"
        f" (acc, b) -> acc + element_at({arr}, b + 1))"
    )
    out = docs.select(
        id_col,
        F.expr(s).alias("lm_sum_q"),
        F.expr(n_tri).cast("long").alias("lm_n_tri"),
    ).withColumn("lm_mean_q", F.round(F.col("lm_sum_q") / F.col("lm_n_tri"), 6))
    return out.withColumn(
        "lm_bucket",
        F.when(F.col("lm_mean_q") >= m["head_thr"], F.lit("head"))
        .when(F.col("lm_mean_q") >= m["tail_thr"], F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


LM_SQL_TEMPLATE = """
WITH lw(b, lp) AS (VALUES {values}),
ltr AS (
  SELECT {id_col}, substr(lower(text), i, 3) AS t3
  FROM documents,
       LATERAL unnest(generate_series(1, greatest(length(text) - 2, 1))) AS u(i)
),
ltb AS (
  SELECT {id_col}, ('0x' || substr(md5(t3), 1, 8))::BIGINT % {d} AS b FROM ltr
),
ls AS (
  SELECT {id_col}, CAST(SUM(lp) AS BIGINT) AS lm_sum_q, COUNT(*) AS lm_n_tri
  FROM ltb JOIN lw USING (b) GROUP BY {id_col}
)
SELECT {id_col}, lm_sum_q, lm_n_tri,
       ROUND(CAST(lm_sum_q AS DOUBLE) / lm_n_tri, 6) AS lm_mean_q,
       CASE WHEN ROUND(CAST(lm_sum_q AS DOUBLE) / lm_n_tri, 6) >= {head_thr} THEN 'head'
            WHEN ROUND(CAST(lm_sum_q AS DOUBLE) / lm_n_tri, 6) >= {tail_thr} THEN 'middle'
            ELSE 'tail' END AS lm_bucket
FROM ls
"""


def lm_sql(id_col: str = "doc_id") -> str:
    m = _lm_model()
    values = ", ".join(f"({b}, {int(v)})" for b, v in enumerate(m["logp_q"]))
    return LM_SQL_TEMPLATE.format(
        values=values, id_col=id_col, d=m["d"],
        head_thr=m["head_thr"], tail_thr=m["tail_thr"],
    )


# materialized LAST: the SQL twins reference every definition above
QUERIES = {
    "web_quality_pipeline": (web_quality_pipeline, _web_quality_pipeline_sql()),
}


# --- Unicode hygiene (the standard corpus-release normalization pass) ----


def unicode_normalize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text, n_changed_chars) — NFC normalization + C0/C1 control
    removal (tab/newline kept) + exotic-horizontal-whitespace collapse
    (NBSP / en-em / ideographic spaces -> one ASCII space; plain spaces
    untouched), the hygiene pass corpus releases run before tokenization.
    Clean single-script ASCII passes through byte-identical.

    Arrow-batched mapInArrow (unicodedata is per-batch C); map-only, zero
    shuffle. Parity: DuckDB's nfc_normalize reproduces the NFC step
    exactly (pinned in tests)."""
    import pyarrow as pa

    def fn(batches):
        import re
        import unicodedata

        ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
        hspace = re.compile("[\\xa0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]+")
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            out_t, out_n = [], []
            for t in texts:
                t = t or ""
                fixed = hspace.sub(" ", ctrl.sub("", unicodedata.normalize("NFC", t)))
                out_t.append(fixed)
                out_n.append(abs(len(t) - len(fixed)) + sum(a != b for a, b in zip(t, fixed)))
            yield pa.RecordBatch.from_pydict({id_col: ids, "text": out_t, "n_changed_chars": out_n})

    return docs.select(id_col, text_col).mapInArrow(
        fn, schema=f"{id_col} long, text string, n_changed_chars long"
    )
