"""Streaming exact deduplication with custom keyed state.

Additive training-data-pipeline capability (the streaming twin of
``pipeline.dedup.exact_dedup``): a document stream where only the FIRST
occurrence of each content digest passes through; later duplicates are
dropped across micro-batches. The cross-batch memory is per-key state via
``applyInPandasWithState`` (the Structured Streaming custom-stateful-
operator surface; ``flatMapGroupsWithState`` semantics with Arrow
batches).

Scale shape: state is partitioned by digest (one shuffle per micro-batch,
same key as the batch exact-dedup groupBy), each key holds ONE boolean —
state size = O(distinct digests), the honest minimum for exact streaming
dedup. ``state_ttl_ms`` bounds it further: a digest not seen for the TTL
expires (ProcessingTimeTimeout) and a later arrival is re-admitted as
fresh — the standard windowed-dedup contract for unbounded digest spaces.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jvector_spark.pipeline.dedup import norm_text


def _make_emit_first_only(state_ttl_ms: int | None):
    """Build the per-digest state fn: pass rows through until the digest
    is seen, then drop. Within a batch, keep the smallest doc_id
    (deterministic, matching the batch exact_dedup canonical pick).

    With a TTL, every sighting (first or duplicate) refreshes the
    processing-time timeout, so a digest expires only after ``ttl`` of
    silence; on timeout the state is removed and the next arrival is
    treated as a first occurrence (re-admitted)."""

    def emit_first_only(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry callback: forget the digest (re-admission point)
            state.remove()
            return iter(())
        seen = state.exists
        if seen:
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)  # refresh on sighting
            return iter(())
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.nsmallest(1, "doc_id")
            best = cand if best is None else pd.concat([best, cand]).nsmallest(1, "doc_id")
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        return iter(()) if best is None else iter((best,))

    return emit_first_only


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-wins exact dedup over a (possibly streaming)
    document DataFrame. Emits (doc_id, digest) for every kept document.

    Per-digest state remembers "seen" across micro-batches (update-mode
    output). The union of emitted rows over all micro-batches equals the
    batch ``exact_dedup``'s canonical picks whenever ids arrive in
    ascending batches (first occurrence == min id) — which is how the test
    verifies it against the oracle-checked batch operator.

    ``state_ttl_ms`` (None = remember forever): processing-time TTL per
    digest. State stays bounded by the distinct digests seen within any
    TTL window instead of the whole stream's history; an expired digest's
    next occurrence passes through again.
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # same digest as the batch exact_dedup (md5 of normalized text)
        F.md5(norm_text(text_col)).alias("digest"),
    )
    out_schema = "doc_id long, digest string"
    state_schema = "seen boolean"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _make_emit_first_only(state_ttl_ms),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
