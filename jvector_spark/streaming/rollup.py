"""Event-time windowed rollups with watermarks (streaming twin of the
batch ``events_rollup`` driver query).

Additive capability (no reference counterpart — jvector has no stream-time
semantics, SURVEY §2.9): tumbling-window aggregation with late-data
handling via watermark. The same plan runs on a batch DataFrame (windows
become plain groupBy keys), which is how the oracle verifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count/sum per key.

    On a streaming input, the watermark bounds state: windows older than
    (max event time - watermark) are finalized and evicted. On a batch
    input the watermark is a no-op and results equal the batch groupBy.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregation per key (``F.session_window``): sessions
    close after ``gap`` of inactivity — the streaming twin of
    ``pipeline.events.sessionize`` (same gap semantics; the session
    windows merge on overlap incrementally, with watermark-bounded state).
    On a batch input it returns the same sessions as the batch
    lag/cumsum formulation.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
