"""Streaming vector ingest: micro-batch append of immutable index segments.

Reference: larger-than-memory incremental build (SURVEY §2.9 ST1,
``jvector-examples/.../SiftSmall.java:216-275``) — vectors arrive over
time, each batch is encoded and added to the index without rebuilding it.

Spark-native shape: ``readStream -> writeStream.foreachBatch(append)``.
Each micro-batch becomes one immutable segment (centroids + PQ codebooks
trained on the batch itself), the manifest version bumps atomically, and
every search launched after the bump sees the new segment (J6 multi-index
merge unions segments for free). Compaction (U1) merges the accumulated
small segments on a schedule — exactly the reference's
segment-accumulation + N:1 compaction design (``docs/compaction.md``).

At scale: a micro-batch is bounded (streaming trigger), so per-batch
training samples and centroid counts are bounded; the append never touches
existing segments, so ingest cost is O(batch), not O(index).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from jvector_spark.operators.index import IVFIndex


def stream_ingest(
    stream_df: DataFrame,
    index: IVFIndex,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    compact_every: int | None = None,
    tiered_min_segments: int | None = None,
    on_batch: Callable[[int, int], None] | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start a streaming query that appends each micro-batch as a segment.

    Args:
        stream_df: streaming DataFrame with (id_col, vec_col) columns.
        index: target IVFIndex (mutated in place: manifest + segment dirs).
        checkpoint_dir: Structured Streaming checkpoint location (exactly-
            once segment append: a replayed batch overwrites its own segment
            dir and the manifest add is idempotent by segment name).
        compact_every: if set, run index.compact() after every N batches
            (the blunt count rule — every compaction rewrites the WHOLE
            index).
        tiered_min_segments: if set, run the size-tiered policy
            (``index.maybe_compact(min_segments=...)``) after every
            batch — segments merge only when enough of a similar size
            accumulate, so each row is rewritten O(log n) times over its
            lifetime (ref docs/compaction.md segment-accumulation
            workload). Mutually exclusive with ``compact_every``.
        on_batch: optional callback (batch_id, appended_rows) for tests.
        trigger: e.g. {"availableNow": True} or {"processingTime": "10 seconds"}.
    """
    state = {"batches": 0}

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n > 0:
            index.append(
                batch_df, id_col=id_col, vec_col=vec_col, seg_name=f"seg-b{batch_id:06d}"
            )
        state["batches"] += 1
        if compact_every and state["batches"] % compact_every == 0:
            index.compact()  # refreshes `index` in place (r7)
        elif tiered_min_segments:
            index.maybe_compact(min_segments=tiered_min_segments)
        if on_batch is not None:
            on_batch(batch_id, n)

    writer = stream_df.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
