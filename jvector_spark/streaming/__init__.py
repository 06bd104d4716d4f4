"""Structured Streaming surface: incremental vector ingest + windowed rollups.

Reference mapping (SURVEY.md §2.9): jvector has no stream-time semantics —
its streaming story is incremental ingest (encode -> writeInline ->
addGraphNode per vector, ``SiftSmall.java:216-275``), concurrent
read/write/delete (``TestConcurrentReadWriteDeletes.java``), and segment
accumulation + N:1 compaction (``docs/compaction.md``). Our analogs:

- ST1 incremental build  -> ``ingest.stream_ingest``: foreachBatch appends
  an immutable IVF segment per micro-batch.
- ST2 concurrent R/W     -> manifest snapshot isolation (types.IndexManifest
  atomic swap); readers keep the segment set they loaded.
- ST3 compaction         -> ``IVFIndex.compact()`` run as a scheduled batch
  job between micro-batches.

Watermark/window operators are additive (Spark-native, no reference
counterpart): ``rollup.windowed_event_rollup`` is the streaming twin of the
batch ``events_rollup`` driver query; ``rollup.session_rollup`` of the
batch sessionizer; ``dedup.streaming_exact_dedup`` (custom keyed state via
``applyInPandasWithState``, optional TTL) of the batch exact dedup; and
``neardup.streaming_minhash_neardup`` of the batch MinHash/LSH pair
operator — band-bucket keyed state, exact-Jaccard verification, pairs
emitted exactly once from their canonical shared band (the per-record-
latency / TTL path); ``neardup.stream_neardup_foreachbatch`` is its
THROUGHPUT twin — a foreachBatch join against a compacted parquet state
table (r7, ~5x at realistic batch sizes, pairs identical).

``search.stream_search`` closes the serving loop: a query STREAM answered
in micro-batches against the index, re-reading the manifest per batch so
concurrent ingest/compaction becomes visible — the streaming twin of the
reference's continuous-query serving, at batch cadence.
"""

from jvector_spark.streaming.dedup import streaming_exact_dedup
from jvector_spark.streaming.ingest import stream_ingest
from jvector_spark.streaming.neardup import (
    stream_neardup_foreachbatch,
    streaming_minhash_neardup,
)
from jvector_spark.streaming.rollup import session_rollup, windowed_event_rollup
from jvector_spark.streaming.search import stream_search

__all__ = [
    "stream_ingest",
    "stream_search",
    "windowed_event_rollup",
    "session_rollup",
    "streaming_exact_dedup",
    "streaming_minhash_neardup",
    "stream_neardup_foreachbatch",
]
