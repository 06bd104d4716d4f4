"""Text analysis operators: tokenization, quality, language ID, fingerprint.

Pipeline operators a training-data curation job needs at 100 TB. All are
map-only JVM-side expressions (no shuffle, no Python): they scale linearly
with input partitions and survive any scale-up. Each ``*_sql`` builder
emits the DuckDB-equivalent SQL for the oracle gate — the math is kept
line-for-line identical.

Conventions shared by both sides:
- normalization: lower + trim + collapse whitespace runs to single spaces
- tokens: split of the normalized text on single space
- rolling hash: h := (h*31 + ascii(char)) mod 1_000_000_007 (fits int64)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007

# Tiny deterministic stopword lists per language (shared constant rendered
# into both Spark and DuckDB SQL; heuristic n-gram/stopword language ID).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "para"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie-break order: de, en, es, fr


def norm_text(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def sql_norm_text(c: str) -> str:
    return f"lower(trim(regexp_replace({c}, '\\s+', ' ', 'g')))"


def tokens(c: Column) -> Column:
    return F.split(c, " ")


def sql_tokens(c: str) -> str:
    return f"string_split({c}, ' ')"


# BPE-ish surface tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish) tokens + avg len.

    avg_token_len uses (len(norm) - (n-1)) / n, exact for single-spaced text.
    """
    n = norm_text(text_col)
    toks = tokens(n)
    nt = F.size(toks)
    return docs.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(n, F.lit(TOKEN_REGEX), 0)).cast("long").alias("n_regex_tokens"),
        F.round((F.length(n) - (nt - F.lit(1))) / nt.cast("double"), 6).alias("avg_token_len"),
    )


def token_stats_sql(text_col: str = "text") -> str:
    n = sql_norm_text(text_col)
    return f"""
WITH t AS (
  SELECT doc_id, {n} AS norm, {sql_tokens(n)} AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(norm, '{TOKEN_REGEX}')) AS BIGINT) AS n_regex_tokens,
       ROUND((length(norm) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE), 6) AS avg_token_len
FROM t
"""


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length/punct/stopword/uniqueness features + a
    deterministic composite score in [0, 1].

    score = 0.25*min(n_tokens/64,1) + 0.25*min(4*stopword_ratio,1)
          + 0.25*(1 - min(10*punct_ratio,1)) + 0.25*unique_ratio
    """
    n = norm_text(text_col)
    toks = tokens(n)
    nt = F.size(toks).cast("double")
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    n_punct = F.size(F.regexp_extract_all(n, F.lit("[^A-Za-z0-9 ]"), 0)).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    stop_ratio = n_stop / nt
    punct_ratio = n_punct / F.length(n).cast("double")
    uniq_ratio = n_uniq / nt
    score = (
        F.lit(0.25) * F.least(nt / F.lit(64.0), F.lit(1.0))
        + F.lit(0.25) * F.least(F.lit(4.0) * stop_ratio, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.lit(10.0) * punct_ratio, F.lit(1.0)))
        + F.lit(0.25) * uniq_ratio
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(score, 6).alias("quality"),
    )


def quality_score_sql(text_col: str = "text") -> str:
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_list = ", ".join(f"'{w}'" for w in all_stop)
    n = sql_norm_text(text_col)
    return f"""
WITH t AS (
  SELECT doc_id, {n} AS norm, {sql_tokens(n)} AS toks FROM documents
), f AS (
  SELECT doc_id,
         len(list_filter(toks, x -> list_contains([{stop_list}], x))) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
         len(regexp_extract_all(norm, '[^A-Za-z0-9 ]')) / CAST(length(norm) AS DOUBLE) AS punct_ratio,
         len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
         CAST(len(toks) AS DOUBLE) AS nt
  FROM t
)
SELECT doc_id,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(uniq_ratio, 6) AS unique_ratio,
       ROUND(0.25 * least(nt / 64.0, 1.0)
           + 0.25 * least(4.0 * stop_ratio, 1.0)
           + 0.25 * (1.0 - least(10.0 * punct_ratio, 1.0))
           + 0.25 * uniq_ratio, 6) AS quality
FROM f
"""


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language, argmax with
    deterministic lexicographic tie-break (de < en < es < fr), 'und' when no
    list scores a single hit."""
    toks = tokens(norm_text(text_col))

    def _in_list(ws: list[str]):
        arr = F.array(*[F.lit(w) for w in ws])
        return lambda t: F.array_contains(arr, t)

    counts = {
        lang: F.size(F.filter(toks, _in_list(ws))).cast("long")
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*[counts[lg] for lg in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in LANGS:
        pred = pred.when(counts[lg] == best, F.lit(lg))
    sel = [F.col("doc_id"), F.col("lang").alias("labeled_lang"), pred.alias("pred_lang")]
    sel += [counts[lg].alias(f"hits_{lg}") for lg in LANGS]
    return docs.select(*sel)


def language_id_sql(text_col: str = "text") -> str:
    n = sql_norm_text(text_col)
    hits = {
        lg: f"len(list_filter(toks, x -> list_contains([{', '.join(repr(w) for w in STOPWORDS[lg])}], x)))"
        for lg in LANGS
    }
    hit_cols = ",\n         ".join(f"CAST({hits[lg]} AS BIGINT) AS hits_{lg}" for lg in LANGS)
    best = f"greatest({', '.join('hits_' + lg for lg in LANGS)})"
    cases = " ".join(f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in LANGS)
    return f"""
WITH t AS (
  SELECT doc_id, lang, {sql_tokens(n)} AS toks FROM documents
), h AS (
  SELECT doc_id, lang AS labeled_lang,
         {hit_cols}
  FROM t
)
SELECT doc_id, labeled_lang,
       CASE WHEN {best} <= 0 THEN 'und' {cases} END AS pred_lang,
       {', '.join('hits_' + lg for lg in LANGS)}
FROM h
"""


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 31-polynomial rolling hash of the normalized
    text, mod 1e9+7 (deterministic, overflow-free in int64)."""
    n = norm_text(text_col)
    # Materialize norm once in a projection so the per-char transform does
    # not re-normalize the string length(norm) times.
    base = docs.select("doc_id", n.alias("_norm"))
    nc = F.col("_norm")
    codes = F.transform(
        F.sequence(F.lit(1), F.length(nc)), lambda i: F.ascii(nc.substr(i, F.lit(1))).cast("long")
    )
    h = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * F.lit(31) + c) % F.lit(MOD)
    )
    return base.select("doc_id", h.alias("fp"))


def fingerprint_sql(text_col: str = "text") -> str:
    n = sql_norm_text(text_col)
    return f"""
WITH t AS (
  SELECT doc_id, {n} AS norm FROM documents
)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(norm) + 1),
                          i -> CAST(ascii(substring(norm, i, 1)) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % {MOD}) AS fp
FROM t
"""


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition signals for quality filtering (the Gopher/MassiveText
    repetition rules, Rae et al. 2021 §A1.1: documents dominated by
    repeated n-grams are boilerplate/spam): duplicate-token ratio and the
    mass of the single most frequent bigram. Map-only JVM HOFs — the
    per-doc distinct×n bigram count is bounded by document length, never
    corpus size."""
    toks = tokens(norm_text(text_col))
    base = docs.select("doc_id", toks.alias("_tk"))
    nt = F.size("_tk").cast("double")
    dup_word = (nt - F.size(F.array_distinct("_tk")).cast("double")) / nt
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_tk") - F.lit(1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i, 2)),
    )
    b = base.withColumn("_bg", bigrams)
    nb = F.size("_bg").cast("double")
    top_mass = (
        F.array_max(
            F.transform(
                F.array_distinct("_bg"),
                lambda x: F.size(F.filter(F.col("_bg"), lambda y: y == x)),
            )
        ).cast("double")
        / nb
    )
    return b.select(
        "doc_id",
        F.round(dup_word, 6).alias("dup_word_ratio"),
        F.round(top_mass, 6).alias("top_bigram_ratio"),
    )


def repetition_stats_sql(text_col: str = "text") -> str:
    """DuckDB twin of :func:`repetition_stats` over ``documents``."""
    n = sql_norm_text(text_col)
    return f"""
WITH t AS (SELECT doc_id, string_split({n}, ' ') AS tk FROM documents),
b AS (
  SELECT doc_id, tk,
         [array_to_string(tk[i:i+1], ' ')
          for i in generate_series(1, greatest(len(tk) - 1, 1))] AS bg
  FROM t
)
SELECT doc_id,
       ROUND((len(tk) - len(list_distinct(tk))) / CAST(len(tk) AS DOUBLE), 6) AS dup_word_ratio,
       ROUND(list_max([len(list_filter(bg, y -> y = x)) for x in list_distinct(bg)])
             / CAST(len(bg) AS DOUBLE), 6) AS top_bigram_ratio
FROM b
"""


# ---------------------------------------------------------------- redaction
# PII scrubbing: the pre-training hygiene pass every production corpus
# runs. Pattern-based (emails / IPv4 / long digit runs), map-only, zero
# Python — regexp_replace stays inside whole-stage codegen, so this is a
# pure scan at any scale. Patterns are restricted to the syntax Java
# regex and RE2 (DuckDB) interpret identically, so the SQL twin is exact.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\d{9,}", "<NUM>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped spans and report per-pattern match counts.

    Counts are measured on the ORIGINAL text (before any replacement) so
    they are order-independent; replacements apply in PII_PATTERNS order.
    """
    out_text = F.col(text_col)
    cols = [F.col("doc_id")]
    for name, pat, _ in PII_PATTERNS:
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        )
    for _, pat, repl in PII_PATTERNS:
        out_text = F.regexp_replace(out_text, pat, repl)
    return docs.select(*cols, out_text.alias("redacted"))


def redact_pii_sql(text_col: str = "text", table: str = "documents") -> str:
    """DuckDB twin of :func:`redact_pii`."""
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = text_col
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {counts}, {red} AS redacted FROM {table}"
