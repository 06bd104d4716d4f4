#!/usr/bin/env python
"""Measure stream_neardup_foreachbatch per-batch wall as STATE grows.

The r8 verdict flagged the foreachBatch near-dup as O(state) per batch
(anti-join + band explode + verify sides scan the whole state table every
micro-batch). This probe feeds N equal-size micro-batches of word-tagged
replica documents (replicas are not near-dups of each other, so pair
structure is flat per batch) and records each batch's wall: if per-batch
cost is bounded, the wall curve is flat; if the state scan binds, it
grows linearly with the batch index.

    python tools/neardup_scale_probe.py [n_batches] [docs_per_batch]

Prints one JSON line: per-batch walls, first/last-quartile means, slope.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jvector_spark.session import get_spark  # noqa: E402
from jvector_spark.streaming.neardup import stream_neardup_foreachbatch  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("neardup_scale_probe")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    base = docs.limit(per_batch).cache()
    n_base = base.count()

    sdir = tempfile.mkdtemp(prefix="jvs_neardup_probe_")
    try:
        # one file per batch; replica-tag words so cross-batch docs are
        # NOT near-dups (pair count stays ~flat; only state grows)
        for rr in range(n_batches):
            rep = base.select(
                (F.col("doc_id") + rr * 1_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, F.lit(f"r{rr}")),
                    ),
                ).alias("text"),
            )
            rep.coalesce(1).write.mode("append").parquet(f"{sdir}/in")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{sdir}/in")
        )
        walls: list[float] = []
        pairs: list[int] = []
        marks = {"t": time.perf_counter()}

        def on_batch(epoch: int, n_pairs: int) -> None:
            now = time.perf_counter()
            walls.append(round(now - marks["t"], 3))
            marks["t"] = now
            pairs.append(n_pairs)
            print(
                f"batch {epoch}: wall={walls[-1]}s pairs={n_pairs} "
                f"state~{(epoch + 1) * n_base}",
                file=sys.stderr,
            )

        q = stream_neardup_foreachbatch(
            stream,
            state_dir=f"{sdir}/state",
            pairs_dir=f"{sdir}/pairs",
            checkpoint_dir=f"{sdir}/ck",
            threshold=0.5,
            compact_every=4,
            on_batch=on_batch,
            prune="always",  # probe the pruned path's state scaling
        )
        q.awaitTermination()
        # drop batch 0 (JVM/codegen warm-up) from the trend stats
        trend = walls[1:]
        k = max(1, len(trend) // 4)
        head = sum(trend[:k]) / k
        tail = sum(trend[-k:]) / k
        print(
            json.dumps(
                {
                    "metric": "neardup_state_scaling",
                    "n_batches": n_batches,
                    "docs_per_batch": n_base,
                    "walls": walls,
                    "pairs": pairs,
                    "head_mean": round(head, 3),
                    "tail_mean": round(tail, 3),
                    "tail_over_head": round(tail / head, 3) if head else None,
                }
            )
        )
    finally:
        shutil.rmtree(sdir, ignore_errors=True)


if __name__ == "__main__":
    main()
