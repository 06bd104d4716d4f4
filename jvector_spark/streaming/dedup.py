"""Streaming exact deduplication with custom keyed state.

Additive training-data-pipeline capability (the streaming twin of
``pipeline.dedup.exact_dedup``): a document stream where only the FIRST
occurrence of each content digest passes through; later duplicates are
dropped across micro-batches. The cross-batch memory is keyed state via
``applyInPandasWithState`` (the Structured Streaming custom-stateful-
operator surface; ``flatMapGroupsWithState`` semantics with Arrow
batches).

Grouping key (r6): the state GROUP is a hash SHARD of the digest
(default 128 shards), not the digest itself. The near-dup operator's
micro-bench showed the per-GROUP applyInPandasWithState round trip
(~3 ms of Python state (de)serialization per group per micro-batch)
dominating streaming cost when groups are as fine as one distinct value
each; a shard's state holds its digests as a map, so the group count —
and with it the fixed overhead — is bounded at ``state_shards`` per
batch while the dedup decisions are unchanged (a digest's rows still
meet in exactly one task, since the shard is a function of the digest).

Scale shape: state is partitioned by shard-of-digest (one shuffle per
micro-batch, a coarsening of the batch exact-dedup's groupBy key); each
shard holds one (digest -> last-seen time) map — state size =
O(distinct digests) total, the honest minimum for exact streaming
dedup. ``state_ttl_ms`` bounds it further PER DIGEST: every sighting
(first or duplicate) refreshes the digest's timestamp; a digest not
sighted for the TTL is pruned on the shard's next visit (or with the
whole shard by the processing-time timeout if the shard goes idle —
every digest there is at least TTL-stale by construction) and a later
arrival is re-admitted as fresh — the standard windowed-dedup contract
for unbounded digest spaces.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jvector_spark.pipeline.dedup import norm_text


def _make_emit_first_only(state_ttl_ms: int | None):
    """Build the per-shard state fn: a shard's state is a (digest ->
    last-sighting ms) map; rows of an unseen digest pass through (the
    smallest doc_id in the batch wins, matching the batch exact_dedup
    canonical pick), rows of a seen digest are dropped.

    With a TTL, every sighting refreshes the digest's timestamp; stale
    digests are pruned on the shard's next invocation, so a digest
    expires only after ``ttl`` of silence and its next arrival is
    re-admitted as a first occurrence. The shard-level processing-time
    timeout only garbage-collects wholly idle shards (everything in them
    is already expired)."""

    def emit_first_only(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # no arrival to this shard for >= TTL, so every digest's last
            # sighting is >= TTL old: the shard IS the expired set
            state.remove()
            return iter(())
        now = (
            state.getCurrentProcessingTimeMs()
            if state_ttl_ms is not None
            else 0
        )
        seen: dict[str, int] = {}
        if state.exists:
            digests, ts = state.get
            for d, t in zip(digests, ts):
                if state_ttl_ms is not None and now - t > state_ttl_ms:
                    continue  # per-digest TTL prune (re-admission point)
                seen[d] = t
        rows = [pdf for pdf in pdfs if len(pdf)]
        out = None
        if rows:
            batch = pd.concat(rows, ignore_index=True)
            firsts = batch.groupby("digest", as_index=False)["doc_id"].min()
            fresh = firsts[~firsts["digest"].isin(seen.keys())]
            if len(fresh):
                out = fresh[["doc_id", "digest"]]
            for d in firsts["digest"]:
                seen[d] = now  # first sight or refresh-on-duplicate
        state.update((list(seen.keys()), [int(t) for t in seen.values()]))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        return iter(()) if out is None else iter((out,))

    return emit_first_only


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
    state_shards: int = 128,
) -> DataFrame:
    """First-occurrence-wins exact dedup over a (possibly streaming)
    document DataFrame. Emits (doc_id, digest) for every kept document.

    Sharded per-digest state remembers "seen" across micro-batches
    (update-mode output). The union of emitted rows over all
    micro-batches equals the batch ``exact_dedup``'s canonical picks
    whenever ids arrive in ascending batches (first occurrence == min
    id) — which is how the test verifies it against the oracle-checked
    batch operator.

    ``state_ttl_ms`` (None = remember forever): processing-time TTL per
    digest. State stays bounded by the distinct digests seen within any
    TTL window instead of the whole stream's history; an expired
    digest's next occurrence passes through again.

    ``state_shards`` bounds the number of state groups per micro-batch
    (the dominant streaming cost is per-group overhead, not compute);
    results are identical for any value >= 1."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # same digest as the batch exact_dedup (md5 of normalized text)
        F.md5(norm_text(text_col)).alias("digest"),
    ).withColumn("shard", F.pmod(F.hash("digest"), F.lit(state_shards)))
    out_schema = "doc_id long, digest string"
    state_schema = "digests array<string>, ts array<long>"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_emit_first_only(state_ttl_ms),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
