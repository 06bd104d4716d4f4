"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard training-data hygiene rule (GPT-3 Appendix C's 13-gram
overlap, Gopher/Llama variants): any training document that contains an
n-gram also present in a benchmark/eval document is contaminated and must
be dropped or quarantined before training.

Scale shape (100 TB corpus, benchmark-sized eval side): the eval set
reduces to a DISTINCT n-gram table — thousands of docs → at most a few
million grams — broadcast into the join, so the corpus side is ONE
map-only pass (normalize → tokenize → slide → explode) plus a broadcast
hash join; only matched (doc_id, gram) survivors reach the final
groupBy(doc_id) shuffle. The corpus text itself never shuffles. For an
eval side too big to broadcast, pass ``broadcast_eval=False`` and AQE
plans a shuffled join on the gram key.

Grams are joined as STRINGS here so results are exactly reproducible
against the SQL oracle; at production scale substitute
``F.xxhash64("gram")`` on both sides before the join to shrink the
broadcast/shuffle payload ~10x (collision probability ~(grams^2)/2^64 —
negligible, but not oracle-exact by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jvector_spark.pipeline.text import norm_text, tokens


def word_ngrams(c: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) of already-normalized text;
    empty array when the document has fewer than n tokens."""
    t = tokens(c)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(t, i, F.lit(n)), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination report against an eval set.

    Returns (doc_id, n_hit_grams, contaminated): the number of DISTINCT
    eval n-grams the document contains (deterministic — per-doc grams are
    deduplicated before the join) and a 0/1 flag. Filter
    ``contaminated = 0`` to get the clean training corpus.
    """
    eval_grams = (
        eval_docs.select(
            F.explode(word_ngrams(norm_text(text_col), n)).alias("gram")
        ).distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    exploded = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(word_ngrams(norm_text(text_col), n)).alias("gram"),
    )
    hits = (
        exploded.join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        ids.join(hits, "doc_id", "left")
        .fillna(0, subset=["n_hit_grams"])
        .select(
            "doc_id",
            F.col("n_hit_grams").cast("long").alias("n_hit_grams"),
            (F.col("n_hit_grams") > 0).cast("long").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def decontaminate_sql(n: int = 8, eval_mod: int = 37) -> str:
    """DuckDB twin of :func:`decontaminate` with the eval set defined as
    documents whose doc_id % eval_mod == 0 (the driver-gate configuration)."""
    from jvector_spark.pipeline.text import sql_norm_text

    norm = sql_norm_text("text")
    return f"""
WITH tok AS (SELECT doc_id, string_split({norm}, ' ') AS t FROM documents),
dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1),
                                 i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gram
    FROM tok
  )
),
ev AS (SELECT DISTINCT gram FROM dg WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
  FROM dg d JOIN ev USING (gram) GROUP BY d.doc_id
)
SELECT doc.doc_id, COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
       CAST(COALESCE(h.n_hit_grams, 0) > 0 AS BIGINT) AS contaminated
FROM documents doc LEFT JOIN hits h ON doc.doc_id = h.doc_id
ORDER BY doc.doc_id
"""
