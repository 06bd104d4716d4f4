"""Streaming similarity search: a query STREAM served in micro-batches
against an IVF index.

Reference: the engine's core serving loop — queries arrive continuously
and are answered against the current index (``GraphSearcher.java:222``,
and the concurrent reader/writer contract of SURVEY §2.9 ST2). A batch
engine cannot chase per-query millisecond latency (BASELINE.md reframes
parity on batch throughput), but it CAN serve a continuous query feed:
each micro-batch of queries runs one distributed top-k search, and the
answers land in an exactly-once sink.

Spark-native shape: ``readStream -> writeStream.foreachBatch(search)``.
Every batch re-reads the index MANIFEST, so a search launched after a
concurrent ``stream_ingest`` append or a compaction sees the new segments
— the streaming twin of the snapshot-isolation tests in
``tests/test_concurrency.py``. Results are written to one parquet
directory per batch id, so a replayed batch overwrites its own output
and the sink stays exactly-once without a transaction log.

At scale: per-batch cost is the ordinary distributed search (both sides
partitioned, no driver collect); the stream adds nothing but the
trigger cadence. Backlogged feeds should use large triggers — the
~100 ms/job floor amortizes over the whole batch, not per query.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from jvector_spark.operators.index import IVFIndex


def stream_search(
    stream_df: DataFrame,
    index: IVFIndex,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    on_batch: Callable[[int, int], None] | None = None,
    trigger: dict | None = None,
    **search_kwargs,
) -> StreamingQuery:
    """Start a streaming query answering each micro-batch of queries.

    Args:
        stream_df: streaming DataFrame with (qid, vec) columns — the same
            query-side schema every batch ``IVFIndex.search`` takes.
        index: index to search. Re-opened per batch via its manifest, so
            concurrent appends/compactions become visible batch-to-batch.
        output_dir: parquet sink root; batch ``b`` writes
            ``{output_dir}/batch_id={b}`` (overwrite ⇒ replay-idempotent).
            Read results back with ``spark.read.parquet(output_dir)``.
        checkpoint_dir: Structured Streaming checkpoint location.
        k: neighbors per query.
        on_batch: optional callback (batch_id, n_queries) for tests.
        trigger: e.g. {"availableNow": True} or {"processingTime": "30 seconds"}.
        **search_kwargs: forwarded to ``IVFIndex.search`` (n_probe,
            n_probe_fine, overquery, strategy, ...).
    """

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n > 0:
            fresh = IVFIndex.load(batch_df.sparkSession, index.path)
            res = fresh.search(batch_df, k, **search_kwargs)
            # the batch_id=N directory name IS the batch column: partition
            # discovery reconstitutes it on read, and overwrite makes a
            # replayed batch rewrite exactly its own slice
            res.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")
        if on_batch is not None:
            on_batch(batch_id, n)

    writer = stream_df.writeStream.foreachBatch(_answer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
