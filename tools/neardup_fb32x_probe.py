#!/usr/bin/env python
"""Isolated repro of the bench's stream_neardup fb32x shape.

Builds the same 32x word-tagged replica corpus as bench.py (4 single-file
micro-batches of ~n_docs*32/4 docs each), runs stream_neardup_foreachbatch
over it, and prints wall + pairs. Run with JVS_NEARDUP_PROF=1 to get the
per-batch step marks (delta_write / cand_ids / pairs_write / compact) on
stderr.

    JVS_NEARDUP_PROF=1 python tools/neardup_fb32x_probe.py [reps]
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
from jvector_spark.streaming.neardup import (  # noqa: E402
    stream_neardup_foreachbatch,
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("neardup_fb32x_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    sdir = tempfile.mkdtemp(prefix="neardup_fb32x_")
    try:
        tagged = None
        for rr in range(reps):
            rep = docs.select(
                (F.col("doc_id") + rr * 1_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, F.lit(f"r{rr}")),
                    ),
                ).alias("text"),
            )
            tagged = rep if tagged is None else tagged.unionByName(rep)
        for b in range(4):
            tagged.filter(
                F.pmod(F.col("doc_id"), F.lit(4)) == b
            ).coalesce(1).write.mode("append").parquet(f"{sdir}/in")
        spark.sparkContext.setJobDescription("neardup fb32x probe")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{sdir}/in")
        )
        t0 = time.perf_counter()
        q = stream_neardup_foreachbatch(
            stream,
            state_dir=f"{sdir}/state",
            pairs_dir=f"{sdir}/pairs",
            checkpoint_dir=f"{sdir}/ck",
            threshold=0.5,
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        n_pairs = spark.read.parquet(f"{sdir}/pairs").count()
        print(
            json.dumps(
                {
                    "wall_s": round(dt, 3),
                    "rows": n_docs * reps,
                    "rows_per_s": round(n_docs * reps / dt, 1),
                    "pairs": int(n_pairs),
                }
            )
        )
    finally:
        shutil.rmtree(sdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
