"""Deterministic stratified sampling — the "data mixing" primitive.

Training-data pipelines mix sources with per-source weights (e.g. 50% of
src0, 25% of src1, 10% of everything else). Sampling must be
DETERMINISTIC (same rows on every run/engine — reruns, backfills and
audits see the same corpus) and map-only (no shuffle, no state). Keep a
row iff ``hash(id) mod M < fraction * M`` with the md5-derived h64 both
engines replicate bit-for-bit (``pipeline.dedup.h64``). Changing the salt
draws an independent sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jvector_spark.pipeline.dedup import h64, sql_h64

_M = 1_000_000  # fraction resolution: 1e-6


def _bucket(id_col: str, salt: str) -> Column:
    return F.pmod(h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), F.lit(_M))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Keep each row of stratum s with probability ``fractions[s]``
    (``default_fraction`` otherwise), deterministically in ``id``.

    Map-only: the per-stratum threshold is a CASE expression, the hash is
    per-row — no shuffle at any scale, and the sample is stable under
    repartitioning, reruns, and engine changes.
    """
    thr = F.lit(int(round(default_fraction * _M)))
    for s, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(round(frac * _M)))).otherwise(thr)
    return df.filter(_bucket(id_col, salt) < thr)


def mixture_weights(
    df: DataFrame,
    temperature: float = 0.7,
    strata_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum (the multilingual /
    multi-domain rebalancing rule, cf. the alpha-sampling used by
    multilingual LM pipelines): stratum mass m_s = sum(weight_col), mixture
    probability p_s ∝ m_s^temperature. temperature=1 keeps natural
    proportions, 0 is uniform, in between up-weights small strata.

    One partial-aggregated groupBy (map-side combine) over the corpus and
    driver-free normalization via a window over the <= |strata| aggregate
    rows — scale-safe by construction. Returns per-stratum natural share,
    mixture probability, and the per-row KEEP FRACTION that realizes the
    mixture against the largest stratum (feed it to
    :func:`stratified_sample`)."""
    agg = df.groupBy(strata_col).agg(F.sum(weight_col).alias("mass"))
    w = Window.partitionBy(F.lit(1))
    scaled = F.pow(F.col("mass"), F.lit(float(temperature)))
    out = (
        agg.withColumn("natural_share", F.col("mass") / F.sum("mass").over(w))
        .withColumn("mix_prob", scaled / F.sum(scaled).over(w))
        # realize the mixture by downsampling: the stratum with the largest
        # mix_prob/mass ratio keeps everything, others keep proportionally
        .withColumn("rate", F.col("mix_prob") / F.col("mass"))
        .withColumn("keep_fraction", F.col("rate") / F.max("rate").over(w))
        .select(
            strata_col,
            F.col("mass").cast("double").alias("mass"),
            F.round("natural_share", 6).alias("natural_share"),
            F.round("mix_prob", 6).alias("mix_prob"),
            F.round("keep_fraction", 6).alias("keep_fraction"),
        )
    )
    return out


def mixture_weights_sql(
    temperature: float = 0.7,
    strata_col: str = "source",
    weight_col: str = "n_chars",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`mixture_weights`."""
    t = float(temperature)
    return f"""
WITH agg AS (
  SELECT {strata_col}, SUM({weight_col}) AS mass
  FROM {table} GROUP BY {strata_col}
), norm AS (
  SELECT {strata_col}, mass,
         mass / SUM(mass) OVER () AS natural_share,
         POW(mass, {t}) / SUM(POW(mass, {t})) OVER () AS mix_prob
  FROM agg
)
SELECT {strata_col},
       CAST(mass AS DOUBLE) AS mass,
       ROUND(natural_share, 6) AS natural_share,
       ROUND(mix_prob, 6) AS mix_prob,
       ROUND((mix_prob / mass) / MAX(mix_prob / mass) OVER (), 6)
           AS keep_fraction
FROM norm
"""


def stratified_sample_sql(
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    table: str = "documents",
    select: str = "doc_id, source",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(f * _M))}" for s, f in sorted(fractions.items())
    )
    salted = f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    bucket = f"{sql_h64(salted)} % {_M}"
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE {bucket} < CASE {strata_col} {cases} "
        f"ELSE {int(round(default_fraction * _M))} END"
    )


def split_by_key(
    df: DataFrame,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    key_col: str = "source",
    salt: str = "split",
) -> DataFrame:
    """Contamination-safe train/val/test assignment BY KEY (r7): every row
    sharing ``key_col`` (a domain, URL host, document family...) lands in
    the SAME split, so near-duplicates within a key can never straddle
    train and eval — the leakage mode row-level random splits are famous
    for. Deterministic in the key hash (stable across runs, engines and
    repartitioning; change ``salt`` for an independent assignment) and
    map-only: the split is a per-row CASE over ``hash(key)``, no shuffle
    at any scale.

    Returns the input plus a ``split`` column ('train' | 'val' | 'test');
    fractions apportion KEYS, so split sizes match them only in
    expectation over keys (exactly the contract key-level splitting
    implies)."""
    if val_fraction < 0 or test_fraction < 0 or val_fraction + test_fraction >= 1:
        raise ValueError("val/test fractions must be >= 0 and sum below 1")
    b = _bucket(key_col, salt)
    v_hi = int(round(val_fraction * _M))
    t_hi = v_hi + int(round(test_fraction * _M))
    return df.withColumn(
        "split",
        F.when(b < v_hi, F.lit("val"))
        .when(b < t_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def split_by_key_sql(
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    key_col: str = "source",
    salt: str = "split",
    table: str = "documents",
    select: str = "doc_id, source",
) -> str:
    """DuckDB twin of :func:`split_by_key`."""
    salted = f"'{salt}:' || CAST({key_col} AS VARCHAR)"
    bucket = f"{sql_h64(salted)} % {_M}"
    v_hi = int(round(val_fraction * _M))
    t_hi = v_hi + int(round(test_fraction * _M))
    return (
        f"SELECT {select}, CASE WHEN {bucket} < {v_hi} THEN 'val' "
        f"WHEN {bucket} < {t_hi} THEN 'test' ELSE 'train' END AS split "
        f"FROM {table}"
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization (r7):
    rows are ordered by ``hash(salt, id)`` — a reproducible permutation
    (same order every run/engine; a new ``salt`` is a fresh epoch's
    permutation) with none of the clumping a sort on ingestion order
    carries. Emits ``shuffle_rank`` (0-based position) and, with
    ``n_shards``, a balanced ``shard`` assignment (rank mod n_shards —
    contiguous ranks round-robin across shards, so every shard sees a
    uniform slice of the permutation; write with ``partitionBy('shard')``
    for the training-reader layout).

    Scale shape: the rank is computed with the bucketed prefix-sum from
    ``operators.ordinal.dense_ordinals`` (hash keys spread uniformly, so
    uniform-width buckets balance) — each bucket ranks independently and
    a broadcast prefix-sum of <= n_buckets counts globalizes, never a
    single-partition window. At 100 TB write the output sharded
    (``partitionBy('shard')``) and read shards sequentially — the
    permutation lives in the layout, not re-sorted per epoch."""
    from jvector_spark.operators.ordinal import dense_ordinals

    key = h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # rank on the hash key via the distributed prefix-sum (dense_ordinals
    # gives duplicate keys distinct, deterministic ranks)
    keyed = df.withColumn("_skey", key)
    ranked = dense_ordinals(keyed, id_col="_skey", ordinal_col="shuffle_rank")
    out = ranked.drop("_skey")
    if n_shards:
        out = out.withColumn(
            "shard", F.pmod(F.col("shuffle_rank"), F.lit(int(n_shards))).cast("int")
        )
    return out


def shuffle_corpus_sql(
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_shards: int | None = None,
    table: str = "documents",
    select: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`shuffle_corpus`."""
    salted = f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    key = sql_h64(salted)
    shard = (
        f", CAST((ROW_NUMBER() OVER (ORDER BY {key} ASC, {id_col} ASC) - 1) "
        f"% {int(n_shards)} AS INT) AS shard"
        if n_shards
        else ""
    )
    return (
        f"SELECT {select}, CAST(ROW_NUMBER() OVER (ORDER BY {key} ASC, {id_col} ASC) "
        f"- 1 AS BIGINT) AS shuffle_rank{shard} FROM {table}"
    )
