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

from pyspark.sql import Column, DataFrame
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
