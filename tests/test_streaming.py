"""Streaming surface tests: micro-batch segment ingest (ST1/ST3) and
watermarked windowed rollup.

File-source streaming with availableNow triggers keeps the tests
deterministic: every parquet file in the input dir becomes part of one
run, processAllAvailable() blocks until done.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder
from jvector_spark.streaming import stream_ingest, windowed_event_rollup

DIM = 16


def _mk_batch(spark, rng, start_id, n):
    mat = rng.uniform(-1.0, 1.0, size=(n, DIM)).astype(np.float32)
    return spark.createDataFrame(
        [(start_id + i, mat[i].tolist()) for i in range(n)], "id long, vec array<float>"
    )


def test_stream_ingest_appends_segments(spark, rng, tmp_path):
    idx_path = str(tmp_path / "idx")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    base = _mk_batch(spark, rng, 0, 300)
    idx = IVFIndexBuilder(metric="COSINE", pq_m=4, n_partitions=8).fit(base, idx_path)
    assert len(idx.manifest.segments) == 1

    # two parquet files land (flat) in the source dir -> micro-batches
    _mk_batch(spark, rng, 1000, 120).coalesce(1).write.mode("append").parquet(in_dir)
    _mk_batch(spark, rng, 2000, 130).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("id long, vec array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    seen = []
    q = stream_ingest(
        stream,
        idx,
        ckpt,
        on_batch=lambda bid, n: seen.append((bid, n)),
        trigger={"availableNow": True},
    )
    q.processAllAvailable()
    q.stop()

    assert sum(n for _, n in seen) == 250
    reloaded = IVFIndex.load(spark, idx_path)
    assert len(reloaded.manifest.segments) == 3
    total = reloaded.vectors().count()
    assert total == 300 + 250

    # search must see streamed vectors: query = an appended vector
    target = reloaded.vectors().filter(F.col("id") == 2005).collect()[0]
    qdf = spark.createDataFrame([(0, list(target.vec))], "qid long, vec array<float>")
    res = reloaded.search(qdf, k=3, n_probe=8, overquery=4.0).collect()
    assert res[0].id == 2005  # self is nearest


def test_windowed_rollup_stream_equals_batch(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 {h:02d}:{m:02d}:00", "click" if i % 2 else "view", float(i))
        for i, (h, m) in enumerate((h, m) for h in range(3) for m in (5, 25, 45))
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    in_dir = str(tmp_path / "ev_in")
    batch.coalesce(1).write.mode("append").parquet(in_dir)

    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_rollup(batch).collect()
    }
    assert len(expected) == 6  # 3 hours x 2 event types
    assert all(n == 3 or n == 2 or n == 1 for n, _ in expected.values())

    stream = spark.readStream.schema(batch.schema).parquet(in_dir)
    out = (
        windowed_event_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    out.processAllAvailable()
    out.stop()
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from rollup_test").collect()
    }
    assert got == expected


def test_replayed_batch_is_idempotent(spark, rng, tmp_path):
    idx_path = str(tmp_path / "idx2")
    base = _mk_batch(spark, rng, 0, 200)
    idx = IVFIndexBuilder(metric="COSINE", pq_m=4, n_partitions=4).fit(base, idx_path)

    extra = _mk_batch(spark, rng, 500, 50)
    idx.append(extra, seg_name="seg-b000000")
    idx.append(extra, seg_name="seg-b000000")  # replay: must be a no-op
    assert len(idx.manifest.segments) == 2
    assert idx.vectors().count() == 250


def test_session_rollup_matches_batch_sessionize(spark, sf_dir):
    """F.session_window (streaming-capable) must produce the same sessions
    as the batch lag/cumsum sessionizer on the same events."""
    from pyspark.sql import functions as F

    from jvector_spark.pipeline.events import sessionize
    from jvector_spark.streaming.rollup import session_rollup

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) read as long
        ev_ts = ev.withColumn(
            "ts_t", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    else:  # timestamp / timestamp_ntz (session tz pinned UTC)
        ev_ts = ev.withColumn("ts_t", F.col("ts").cast("timestamp"))
    got = session_rollup(ev_ts, gap="30 minutes", ts_col="ts_t").collect()
    want = sessionize(ev, gap_minutes=30).collect()
    g = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in got)
    w = sorted((r["user_id"], r["session_start"], r["n_events"]) for r in want)
    assert g == w


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: first occurrence
    of each digest passes, later duplicates are dropped ACROSS
    micro-batches; the kept set equals the batch exact_dedup canonical
    picks (ids arrive in ascending batches)."""
    from jvector_spark.pipeline.dedup import exact_dedup
    from jvector_spark.streaming.dedup import streaming_exact_dedup

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    docs1 = [(i, f"text number {i % 7}") for i in range(20)]
    docs2 = [(100 + i, f"text number {i % 7}") for i in range(10)]  # all dups
    docs2.append((200, "fresh text only in batch two"))
    spark.createDataFrame(docs1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame(docs2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM sdedup").collect()}

    batch = spark.createDataFrame(docs1 + docs2, "doc_id long, text string")
    want = {
        r["doc_id"] for r in exact_dedup(batch).filter("is_canonical").collect()
    }
    assert got == want  # 7 canonical digests from batch 1 + the fresh doc


def test_streaming_dedup_ttl_state_contract():
    """TTL bounded-state contract, tested at the state-fn level (a
    wall-clock ProcessingTimeTimeout run is inherently flaky): a shard's
    state maps each digest to its last sighting; duplicates are dropped
    and refresh their digest's timestamp; a digest silent past the TTL is
    pruned on the shard's next visit and re-admitted as fresh; the shard
    timeout callback removes the (wholly stale) shard."""
    import pandas as pd

    from jvector_spark.streaming.dedup import _make_emit_first_only

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut, self.timeouts = None, False, []
            self.now = 1_000

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def getCurrentProcessingTimeMs(self):
            return self.now

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeouts.append(ms)

    fn = _make_emit_first_only(60_000)
    st = FakeState()
    # two digests land in the same shard; each emits its min doc_id
    batch = [pd.DataFrame({"doc_id": [7, 3, 5], "digest": ["d", "d", "e"]})]
    out = list(fn((0,), batch, st))
    assert len(out) == 1
    got = sorted(map(tuple, out[0][["doc_id", "digest"]].values.tolist()))
    assert got == [(3, "d"), (5, "e")]  # first occ per digest, min id
    assert st.exists and st.timeouts == [60_000]

    # duplicate of d: dropped, and d's timestamp refreshes
    st.now = 30_000
    out2 = list(fn((0,), [pd.DataFrame({"doc_id": [9], "digest": ["d"]})], st))
    assert out2 == [] and st.timeouts == [60_000, 60_000]
    ds, ts = st._v
    assert dict(zip(ds, ts))["d"] == 30_000 and dict(zip(ds, ts))["e"] == 1_000

    # e (last seen t=1k) passes the TTL horizon at t=70k: pruned and
    # re-admitted as a first occurrence; d (refreshed at 30k) still drops
    st.now = 70_000
    out3 = list(
        fn((0,), [pd.DataFrame({"doc_id": [11, 12], "digest": ["e", "d"]})], st)
    )
    assert len(out3) == 1
    assert out3[0][["doc_id", "digest"]].values.tolist() == [[11, "e"]]

    # shard timeout: everything in it is >= TTL stale -> forgotten
    st.hasTimedOut = True
    assert list(fn((0,), [], st)) == [] and not st.exists

    st.hasTimedOut = False
    out4 = list(fn((0,), [pd.DataFrame({"doc_id": [13], "digest": ["d"]})], st))
    assert len(out4) == 1 and out4[0]["doc_id"].iloc[0] == 13  # re-admitted

    # no-TTL build never touches timeouts (NoTimeout conf compatibility)
    fn2 = _make_emit_first_only(None)
    st2 = FakeState()
    list(fn2((1,), [pd.DataFrame({"doc_id": [1], "digest": ["e"]})], st2))
    assert st2.exists and st2.timeouts == []


def test_streaming_minhash_neardup_matches_batch(spark, tmp_path):
    """Streaming MinHash/LSH near-dup: the union of pairs emitted across
    micro-batches equals the batch minhash_lsh_pairs result on the same
    documents (same shingling/signature/banding/verification), with every
    pair emitted exactly once — including pairs whose members arrive in
    DIFFERENT micro-batches."""
    from jvector_spark.pipeline.dedup import minhash_lsh_pairs
    from jvector_spark.streaming.neardup import streaming_minhash_neardup

    base = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "pack my box with five dozen liquor jugs before noon arrives today",
        "sphinx of black quartz judge my vow said the old teacher slowly",
    ]
    docs1 = [(i, base[i % 3] + f" tail{i % 2}") for i in range(12)]
    docs2 = [(100 + i, base[i % 3] + f" tail{i % 2}") for i in range(6)]
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame(docs1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame(docs2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = (
        streaming_minhash_neardup(stream, threshold=0.7)
        .writeStream.format("memory")
        .queryName("sneardup")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got_rows = spark.sql("SELECT * FROM sneardup").collect()
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in got_rows)
    assert len(got) == len(set(got)), "a pair was emitted more than once"

    batch = spark.createDataFrame(docs1 + docs2, "doc_id long, text string")
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(batch, threshold=0.7).collect()
    )
    assert len(want) > 0
    # cross-batch pairs must exist for the test to mean anything
    assert any(a < 100 <= b for a, b, _ in want)
    assert got == want


def test_stream_search_matches_batch_and_sees_appends(spark, tmp_path):
    from jvector_spark.streaming import stream_search

    # local generator: consuming the stateful session `rng` fixture here
    # would shift every later test's random corpus (order sensitivity)
    rng = np.random.default_rng(88)
    idx_path = str(tmp_path / "sidx")
    in_dir = str(tmp_path / "sin")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    corpus = _mk_batch(spark, rng, 0, 400)
    idx = IVFIndexBuilder(metric="COSINE", pq_m=4, n_partitions=8).fit(
        corpus, idx_path
    )

    # two query files -> two micro-batches (exhaustive knobs => exact,
    # so streamed answers must equal the batch search bit-for-bit)
    qmat = rng.uniform(-1.0, 1.0, size=(12, DIM)).astype(np.float32)
    qdf = spark.createDataFrame(
        [(i, qmat[i].tolist()) for i in range(12)], "qid long, vec array<float>"
    )
    qdf.filter("qid < 6").coalesce(1).write.mode("append").parquet(in_dir)
    qdf.filter("qid >= 6").coalesce(1).write.mode("append").parquet(in_dir)

    kw = dict(n_probe=8, overquery=400.0)  # every partition, full rerank
    stream = (
        spark.readStream.schema("qid long, vec array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    seen = []
    q = stream_search(
        stream, idx, out_dir, ckpt, k=5,
        on_batch=lambda bid, n: seen.append((bid, n)),
        trigger={"availableNow": True}, **kw,
    )
    q.processAllAvailable()
    q.stop()
    assert sum(n for _, n in seen) == 12

    streamed = {
        (r.qid, r.rank): r.id
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {(r.qid, r.rank): r.id for r in idx.search(qdf, 5, **kw).collect()}
    assert streamed == batch

    # a segment appended between runs is visible to the NEXT batch:
    # plant a vector identical to query 0 and re-run on a new file
    planted = spark.createDataFrame(
        [(9999, qmat[0].tolist())], "id long, vec array<float>"
    )
    idx.append(planted, seg_name="seg-planted")
    qdf.filter("qid = 0").coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_search(
        stream, idx, out_dir, ckpt, k=5, trigger={"availableNow": True}, **kw
    )
    q2.processAllAvailable()
    q2.stop()
    # the sink is an append log keyed by batch_id (partition-dir column);
    # the re-asked query's NEWEST answer ranks the planted twin first,
    # while batch 0's original answer for qid 0 stays untouched
    after = spark.read.parquet(out_dir)
    last = after.agg(F.max("batch_id")).collect()[0][0]
    top = after.filter(
        (F.col("batch_id") == last) & F.expr("qid = 0 and rank = 1")
    ).collect()
    assert [r.id for r in top] == [9999]


def test_stream_neardup_foreachbatch_matches_batch(spark, tmp_path):
    """foreachBatch near-dup (the r7 throughput path): union of pairs
    across micro-batches == batch minhash_lsh_pairs, exactly once,
    including cross-batch pairs; state deltas compact into one table."""
    from jvector_spark.pipeline.dedup import minhash_lsh_pairs
    from jvector_spark.streaming.neardup import stream_neardup_foreachbatch

    base = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "pack my box with five dozen liquor jugs before noon arrives today",
        "sphinx of black quartz judge my vow said the old teacher slowly",
    ]
    docs1 = [(i, base[i % 3] + f" tail{i % 2}") for i in range(12)]
    docs2 = [(100 + i, base[i % 3] + f" tail{i % 2}") for i in range(6)]
    docs3 = [(200 + i, base[i % 3] + f" tail{i % 2}") for i in range(6)]
    in_dir = str(tmp_path / "in")
    for chunk in (docs1, docs2, docs3):
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    seen = []
    q = stream_neardup_foreachbatch(
        stream,
        state_dir=str(tmp_path / "state"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ck"),
        threshold=0.7,
        compact_every=2,  # force a compaction on the 2nd batch
        on_batch=lambda e, n: seen.append((e, n)),
    )
    q.awaitTermination(240)
    got_rows = spark.read.parquet(str(tmp_path / "pairs")).collect()
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in got_rows)
    assert len(got) == len(set(got)), "a pair was emitted more than once"

    batch = spark.createDataFrame(
        docs1 + docs2 + docs3, "doc_id long, text string"
    )
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(batch, threshold=0.7).collect()
    )
    assert len(want) > 0
    assert any(a < 100 <= b for a, b, _ in want)  # cross-batch pairs exist
    assert got == want
    assert len(seen) == 3 and sum(n for _, n in seen) == len(want)
    # the 3rd batch saw compact_every=2 prior deltas and folded them; its
    # own delta (written before the fold, excluded from it) remains
    import os as _os

    names = sorted(_os.listdir(str(tmp_path / "state")))
    assert any(s.startswith("compact-") for s in names)
    assert [s for s in names if s.startswith("delta=")] == ["delta=2"]
