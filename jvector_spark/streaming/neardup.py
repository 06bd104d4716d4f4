"""Streaming MinHash/LSH near-duplicate detection with custom keyed state.

The streaming twin of ``pipeline.dedup.minhash_lsh_pairs`` (same
shingling, same seeded signature family, same banding, same exact-Jaccard
verification): documents stream in; every verified near-dup pair
(doc_a < doc_b, jaccard >= threshold) is emitted EXACTLY ONCE across all
micro-batches, as soon as the second member of the pair arrives.

Mechanics (the batch operator's band self-join, re-expressed as keyed
state): each document's band keys are computed map-only upstream (the
SAME ``base_hashes``/``minhash_signature``/``_band_keys`` expressions as
the batch path, so the candidate sets are identical); rows are keyed by
band-bucket via ``applyInPandasWithState``; each bucket's state holds the
(doc_id, band keys, shingle-hash set) of every document seen in it. A new
arrival exact-Jaccard-verifies against the bucket's members. A colliding
pair can share several buckets — it is emitted only from its CANONICAL
bucket (the lowest-index shared band), a decision every shared bucket can
make locally from the two band-key lists, so no cross-bucket
deduplication state is needed.

State representation (r6 — the first micro-bench showed JSON-ed shingle
STRINGS dominating both state bytes and CPU): members are two parallel
state arrays — a small JSON meta string (id + band keys) and a
binary-packed sorted int64 array of the member's distinct per-shingle
base hashes (the SAME ``base_hashes`` values the signature family
consumes). Jaccard over the hash sets equals Jaccard over the string
sets absent 61-bit collisions, and ``np.intersect1d`` on packed sorted
arrays replaces Python string-set intersection.

Scale shape: state is partitioned by band key (the exact shuffle key of
the batch self-join); a bucket's state is its collision group — the same
O(bucket size) working set the batch join materializes per key, held
across batches instead of per job. ``state_ttl_ms`` bounds it for
unbounded streams (expired buckets forget their members; only pairs
whose members arrive within the TTL window of each other are then
reported — the standard windowed contract).

Cost model (measured r6): the dominant cost is the per-GROUP
applyInPandasWithState round trip (~3 ms per distinct band-bucket per
micro-batch), not Jaccard compute or state bytes — so throughput is
~cores x ~300 bucket-updates/s. Right for continuous moderate-rate
streams; for BULK backfills use the batch ``minhash_lsh_pairs`` (same
candidates, same verification, ~100x faster on a resident corpus).
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jvector_spark.pipeline.dedup import (
    _band_keys,
    base_hashes,
    minhash_signature,
    norm_text,
)


def _make_bucket_fn(threshold: float, state_ttl_ms: int | None):
    def bucket_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            metas, shs = state.get
            members = [
                (json.loads(m), np.frombuffer(s, dtype=np.int64))
                for m, s in zip(metas, shs)
            ]
        else:
            members = []
        bkey = key[0]
        rows = [pdf for pdf in pdfs if len(pdf)]
        out_a, out_b, out_j = [], [], []
        if rows:
            batch = pd.concat(rows, ignore_index=True).sort_values("doc_id")
            seen_ids = {m[0]["id"] for m in members}
            for row in batch.itertuples(index=False):
                doc_id = int(row.doc_id)
                if doc_id in seen_ids:
                    continue  # replayed row: already a member
                sh = np.asarray(row.shh, dtype=np.int64)  # sorted, distinct
                bands = list(row.bands)
                for meta, m_sh in members:
                    inter = len(np.intersect1d(sh, m_sh, assume_unique=True))
                    union = len(sh) + len(m_sh) - inter
                    if union == 0:
                        continue
                    j = round(inter / union, 6)
                    if j < threshold:
                        continue
                    shared = [
                        i
                        for i, (x, y) in enumerate(zip(bands, meta["bands"]))
                        if x == y
                    ]
                    # emit only from the canonical (lowest shared band) bucket
                    if shared and bands[shared[0]] == bkey:
                        a, b = sorted((doc_id, meta["id"]))
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(j)
                members.append(({"id": doc_id, "bands": bands}, sh))
                seen_ids.add(doc_id)
        state.update(
            (
                [json.dumps(m) for m, _ in members],
                [s.tobytes() for _, s in members],
            )
        )
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if not out_a:
            return iter(())
        return iter(
            (pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}),)
        )

    return bucket_fn


def streaming_minhash_neardup(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit every verified near-dup pair (doc_a, doc_b, jaccard) exactly
    once over the life of the stream. The union of emitted pairs equals
    the batch ``minhash_lsh_pairs`` result on the same documents (same
    parameters), which is how the test pins it."""
    rows_per_band = n_hashes // bands
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.split(norm_text(text_col), " ").alias("_tk"),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_tk") - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i, n)),
    )
    sh = toks.select(
        "doc_id", F.array_sort(F.array_distinct(grams)).alias("sh")
    )
    sig = sh.withColumn("_base", base_hashes(F.col("sh"))).withColumn(
        "_sig", minhash_signature(F.col("_base"), n_hashes)
    )
    keyed = sig.select(
        "doc_id",
        # verification set = sorted distinct per-shingle base hashes
        # (identical Jaccard to the string sets absent 61-bit collisions;
        # packed int64s keep the keyed state small and the intersection
        # vectorized)
        F.array_sort(F.array_distinct(F.col("_base"))).alias("shh"),
        _band_keys(F.col("_sig"), bands, rows_per_band).alias("bands"),
    ).select("doc_id", "shh", "bands", F.explode("bands").alias("bkey"))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("bkey").applyInPandasWithState(
        _make_bucket_fn(threshold, state_ttl_ms),
        outputStructType="doc_a long, doc_b long, jaccard double",
        stateStructType="metas array<string>, shs array<binary>",
        outputMode="update",
        timeoutConf=timeout,
    )
