"""F5 ordinal projection/renumber operators (OrdinalMapper analogs)."""

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from jvector_spark.operators.ordinal import (
    OMITTED,
    dense_ordinals,
    offset_ordinals,
    remap_ids,
)


def test_dense_ordinals_matches_global_row_number(spark, rng):
    """The bucketed prefix-sum plan must equal row_number()-1 over the
    global id order, on sparse ids with holes and few buckets."""
    ids = sorted(rng.choice(1_000_000, size=3000, replace=False).tolist())
    df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    got = dense_ordinals(df, n_buckets=7)
    want = df.withColumn(
        "ordinal", (F.row_number().over(Window.orderBy("id")) - 1).cast("long")
    )
    g = sorted((r["id"], r["ordinal"]) for r in got.collect())
    w = sorted((r["id"], r["ordinal"]) for r in want.collect())
    assert g == w
    assert [o for _, o in g] == list(range(3000))


def test_dense_ordinals_edge_cases(spark):
    empty = spark.createDataFrame([], "id long")
    assert dense_ordinals(empty).count() == 0
    one = spark.createDataFrame([(42,)], "id long")
    assert dense_ordinals(one).collect()[0]["ordinal"] == 0


def test_offset_and_remap(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id long")
    off = {r["id"]: r["ordinal"] for r in offset_ordinals(df, 100).collect()}
    assert off == {i: i + 100 for i in range(5)}

    mapping = spark.createDataFrame(
        [(0, 10), (2, 11), (4, 12)], "id long, new_id long"
    )
    # unmapped ids -> OMITTED (ref OrdinalMapper.OMITTED)
    got = {r["id"] for r in remap_ids(df, mapping).collect()}
    assert got == {10, 11, 12, OMITTED}
    kept = {r["id"] for r in remap_ids(df, mapping, drop_unmapped=True).collect()}
    assert kept == {10, 11, 12}
