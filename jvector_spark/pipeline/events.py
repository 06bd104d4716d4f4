"""Event-stream analytics: gap-based sessionization.

A training-data pipeline staple (user activity -> sessions -> features)
that is also the batch twin of Structured Streaming's session windows
(``F.session_window`` runs the same semantics incrementally; the batch
form is fully SQL-expressible, so it gets a DuckDB oracle).

Scale shape: ONE shuffle on the user key; the lag/cumulative-sum windows
then run within each user's partition ordered by time — no further data
movement, no Python. Skewed users (bots) bound the per-partition sort;
cap or salt upstream if a single user exceeds worker memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.

    ``ts`` may be a TIMESTAMP(NANOS)-as-long column (the events table) or
    a timestamp; gap math runs on integer nanoseconds so both engines
    agree exactly. Returns one row per session:
    (user_id, session_idx, n_events, sum_value, session_start, session_end).
    """
    ts = F.col(ts_col)
    dtype = dict(events.dtypes)[ts_col]
    if dtype == "bigint":
        pass  # already epoch nanoseconds (TIMESTAMP(NANOS) parquet read as long)
    elif dtype.startswith("timestamp"):
        # Covers both TIMESTAMP and TIMESTAMP_NTZ: the session timezone is
        # pinned to UTC (session.py), so NTZ->TZ cast preserves the wall
        # clock and unix_micros gives the exact integer epoch.
        ts = (F.unix_micros(ts.cast("timestamp")) * F.lit(1000)).cast("long")
    else:
        ts = (ts.cast("double") * F.lit(1e9)).cast("long")
    gap_ns = int(gap_minutes) * 60 * 1_000_000_000

    base = events.select(
        F.col(user_col).alias("user_id"),
        ts.alias("_ts_ns"),
        F.col(value_col).alias("_value"),
    )
    w = Window.partitionBy("user_id").orderBy("_ts_ns")
    prev = F.lag("_ts_ns").over(w)
    new_sess = (prev.isNull() | ((F.col("_ts_ns") - prev) > F.lit(gap_ns))).cast("long")
    sess_idx = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = base.withColumn("session_idx", sess_idx)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        marked.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("_value"), 6).alias("sum_value"),
            F.date_format(
                F.timestamp_micros((F.min("_ts_ns") / 1000).cast("long")), fmt
            ).alias("session_start"),
            F.date_format(
                F.timestamp_micros((F.max("_ts_ns") / 1000).cast("long")), fmt
            ).alias("session_end"),
        )
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin of :func:`sessionize` over the ``events`` view."""
    gap_ns = int(gap_minutes) * 60 * 1_000_000_000
    return f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events
), marked AS (
  SELECT user_id, ts_ns, value,
         CASE WHEN lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns) IS NULL
                   OR ts_ns - lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns) > {gap_ns}
              THEN 1 ELSE 0 END AS new_sess
  FROM e
), numbered AS (
  SELECT user_id, ts_ns, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       strftime(make_timestamp(CAST(MIN(ts_ns) / 1000 AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(CAST(MAX(ts_ns) / 1000 AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS session_end
FROM numbered GROUP BY user_id, session_idx
"""
