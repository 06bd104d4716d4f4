"""Ordinal projection / renumbering (F5).

The reference remaps node ids on index write and compaction through an
``OrdinalMapper`` SPI — Identity, Offset, and Map variants, with holes
marked ``OrdinalMapper.OMITTED`` (``graph/disk/OrdinalMapper.java:30,56,
82,114``) — and views vectors through the remapping
(``graph/RemappedRandomAccessVectorValues.java``). The Spark analogs:

- :func:`dense_ordinals` — densification (the Map mapper built by the
  compactor for a corpus with holes): dense ordinal 0..n-1 in id order.
  NOT a global ``row_number() OVER (ORDER BY id)``: that plan sorts the
  whole corpus in ONE partition — a scale-killer. Instead: range-bucket
  the ids (one min/max job), count per bucket (one small agg job),
  broadcast the bucket prefix-sums, and rank only WITHIN each bucket —
  the per-bucket windows sort in parallel and the prefix offset makes the
  result identical to the global row_number, bit for bit.
- :func:`offset_ordinals` — the Offset mapper: a constant shift, pure
  expression.
- :func:`remap_ids` — the Map mapper applied to any table: broadcast-join
  a mapping table; ids absent from the mapping become ``OMITTED`` (-1) or
  are dropped, matching the reference's hole semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OMITTED = -1  # ref OrdinalMapper.OMITTED (graph/disk/OrdinalMapper.java:30)


def dense_ordinals(
    df: DataFrame,
    id_col: str = "id",
    ordinal_col: str = "ordinal",
    n_buckets: int | None = None,
) -> DataFrame:
    """Dense 0..n-1 ordinals in ``id_col`` order, distributed.

    Equivalent to ``row_number() OVER (ORDER BY id) - 1`` but without the
    single-partition global sort: ids are range-bucketed (uniform width
    between min and max — ids from sequence generators or hashes spread
    evenly; pass a larger ``n_buckets`` for skewed ranges), each bucket is
    ranked independently in parallel, and a broadcast prefix-sum of bucket
    counts turns local ranks into global ordinals. Duplicate ids get
    distinct ordinals (ties broken arbitrarily but deterministically by
    the within-bucket sort); the usual contract is unique ids.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    row = df.agg(
        F.min(id_col).alias("mn"), F.max(id_col).alias("mx"), F.count("*").alias("n")
    ).first()
    if row["n"] == 0:
        return df.select(
            F.col(id_col), F.lit(0).cast("long").alias(ordinal_col)
        ).limit(0)
    mn, mx = int(row["mn"]), int(row["mx"])
    bucket = (
        F.lit(1)
        if mn == mx
        else F.width_bucket(F.col(id_col), F.lit(mn), F.lit(mx + 1), F.lit(n_buckets))
    )
    bucketed = df.withColumn("_b", bucket.cast("int"))
    counts = bucketed.groupBy("_b").count().collect()  # <= n_buckets rows
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["_b"]):
        offsets[r["_b"]] = acc
        acc += r["count"]
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_b int, _off long"
    )
    w = Window.partitionBy("_b").orderBy(F.col(id_col).asc())
    return (
        bucketed.join(F.broadcast(off_df), "_b")
        .withColumn(
            ordinal_col, (F.row_number().over(w) - F.lit(1) + F.col("_off")).cast("long")
        )
        .drop("_b", "_off")
    )


def offset_ordinals(
    df: DataFrame, offset: int, id_col: str = "id", ordinal_col: str = "ordinal"
) -> DataFrame:
    """Offset mapper (ref OrdinalMapper.java:82): ordinal = id + offset."""
    return df.withColumn(ordinal_col, (F.col(id_col) + F.lit(int(offset))).cast("long"))


def remap_ids(
    df: DataFrame,
    mapping: DataFrame,
    id_col: str = "id",
    new_id_col: str = "new_id",
    drop_unmapped: bool = False,
) -> DataFrame:
    """Map mapper (ref OrdinalMapper.java:114,
    RemappedRandomAccessVectorValues.java): rewrite ``id_col`` through a
    (old -> new) mapping table. Unmapped ids become ``OMITTED`` (-1) by
    default — the reference's hole marker — or are dropped when
    ``drop_unmapped``. The mapping joins broadcast when small; a
    corpus-sized mapping shuffles on the join key like any big join."""
    m = mapping.select(
        F.col(id_col).alias("_old"), F.col(new_id_col).alias("_new")
    )
    how = "inner" if drop_unmapped else "left"
    out = df.join(m, df[id_col] == m["_old"], how)
    return out.withColumn(
        id_col, F.coalesce(F.col("_new"), F.lit(OMITTED)).cast("long")
    ).drop("_old", "_new")
