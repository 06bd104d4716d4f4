"""Sequence packing — the "concatenate and chunk" pretraining primitive.

A 100 TB training pipeline does not feed documents to the trainer; it
feeds fixed-length token sequences. The standard GPT-style packing
concatenates documents in a deterministic order and cuts every
``seq_len`` tokens, ignoring document boundaries (chunk boundaries fall
mid-document). This operator computes that mapping declaratively:

- Documents are hash-SHARDED (``pmod(h64(doc_id), n_shards)``) and packed
  independently per shard: the running-total window runs PARTITIONED BY
  shard, so packing parallelizes across the cluster instead of
  serializing through one global cumulative sum. Shard count is the
  parallelism knob; within a shard the order is deterministic in
  ``(h64(doc_id), doc_id)`` — reruns, backfills and engines agree.
- Token counts use the same whitespace tokenizer as
  :mod:`jvector_spark.pipeline.text` (``token_stats``), already
  hash-verified against the DuckDB twin.
- Output per document: its shard, token interval [tok_start, tok_end) in
  the shard's concatenated stream, and the first/last sequence index it
  lands in (``seq_len``-sized chunks). A document shorter than the
  remaining space shares its sequence with neighbors; a document longer
  than ``seq_len`` spans several — both fall out of the same arithmetic.

Pure Catalyst expressions (one window per shard partition, no Python),
so the plan is a map + single shuffle on ``shard`` at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark.pipeline.dedup import h64, sql_h64
from jvector_spark.pipeline.text import norm_text, sql_norm_text, sql_tokens, tokens


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its token interval and sequence span in the
    shard-concatenated stream (see module docstring)."""
    h = h64(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        docs.select(
            F.col(id_col),
            h.alias("h"),
            F.pmod(h, F.lit(n_shards)).alias("shard"),
            # same normalized whitespace tokenizer as token_stats (already
            # hash-verified against the DuckDB twin)
            F.size(tokens(norm_text(text_col))).cast("long").alias("n_tokens"),
        )
        .withColumn("tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("tok_end", F.col("tok_start") + F.col("n_tokens"))
        .withColumn(
            "seq_first", (F.col("tok_start") / seq_len).cast("long")
        )
        .withColumn(
            # last sequence touched: the chunk holding token tok_end - 1
            # (empty docs stay in seq_first)
            "seq_last",
            F.when(F.col("n_tokens") > 0, ((F.col("tok_end") - 1) / seq_len))
            .otherwise(F.col("tok_start") / seq_len)
            .cast("long"),
        )
        .select(
            id_col, "shard", "n_tokens", "tok_start", "tok_end",
            "seq_first", "seq_last",
        )
    )
    return out


def pack_sequences_sql(
    seq_len: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    h = sql_h64(f"CAST({id_col} AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT {id_col},
         {h} AS h,
         (({h}) % {n_shards} + {n_shards}) % {n_shards} AS shard,
         CAST(len({sql_tokens(sql_norm_text(text_col))}) AS BIGINT) AS n_tokens
  FROM {table}
), packed AS (
  SELECT {id_col}, shard, n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back so the value
         -- hash agrees with Spark's long
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY h, {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_start
  FROM toks
)
SELECT {id_col}, shard, n_tokens, tok_start,
       CAST(tok_start + n_tokens AS BIGINT) AS tok_end,
       CAST(FLOOR(tok_start / {seq_len}) AS BIGINT) AS seq_first,
       CAST(CASE WHEN n_tokens > 0
                 THEN FLOOR((tok_start + n_tokens - 1) / {seq_len})
                 ELSE FLOOR(tok_start / {seq_len}) END AS BIGINT) AS seq_last
FROM packed
"""
