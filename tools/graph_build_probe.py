#!/usr/bin/env python
"""Attribute the 1M-shape graph build's wall to its Spark stages.

Builds (or reuses) the bench's 1M index in a fixed directory, then runs
``build_graph(rebuild=True)`` and prints per-job/stage task counts and
walls from the status tracker, so the expensive stage is named instead
of guessed (guide §1/§7).

    python tools/graph_build_probe.py [index_dir] [--fresh]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as _probe  # noqa: E402
from jvector_spark.session import get_spark  # noqa: E402


def main() -> None:
    idx_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jvs_graph_probe"
    fresh = "--fresh" in sys.argv
    spark = get_spark("jvs_graph_probe")
    from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder

    corpus_dir = f"{idx_root}/xl"
    idx_dir = f"{idx_root}/idx"
    if fresh or not os.path.isdir(os.path.join(idx_dir, "segments")):
        _probe.gen_corpus(corpus_dir, 1_000_000, 64, 1000, seed=11)
        xcorpus = spark.read.parquet(f"{corpus_dir}/corpus.parquet")
        t0 = time.perf_counter()
        xidx = IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill=2, fine_factor=8,
            n_partitions=1000, pq_residual=True,
        ).fit(xcorpus, idx_dir)
        print(f"[probe] 1m build: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    else:
        xidx = IVFIndex.load(spark, idx_dir)

    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup() or [])
    spark.sparkContext.setJobDescription("probe: graph build 1m")
    t0 = time.perf_counter()
    xidx.build_graph(degree=16, ef_construction=32, rebuild=True)
    wall = time.perf_counter() - t0
    print(f"[probe] graph build 1m (rebuild): {wall:.1f}s", file=sys.stderr)
    for jid in sorted(set(st.getJobIdsForGroup() or []) - before):
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is None:
                continue
            print(
                f"[probe] job {jid} stage {sid}: {si.name.splitlines()[0]} "
                f"tasks={si.numTasks} done={si.numCompletedTasks}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
