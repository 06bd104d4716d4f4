#!/usr/bin/env python
"""Attribute the 1M bulk search's wall to its Spark jobs/stages.

The in-kernel telemetry (SearchTelemetry.stage_seconds) accounts for
~77 s of the ~174 s isolated wall at 32 cores; this probe names where
the other ~96 s go (probe-assign pass, union+repartition shuffle map,
applyInPandas reduce, persist+count) using the status tracker, like
tools/graph_build_probe.py does for the graph build (guide §1/§7).

    python tools/bulk_stage_probe.py [index_root] [--fresh]

The index is built once into a fixed directory and reused across runs,
so repeated probes measure only the search.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as _probe  # noqa: E402
from jvector_spark.session import get_spark  # noqa: E402


def main() -> None:
    idx_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jvs_bulk_probe"
    fresh = "--fresh" in sys.argv
    # UI on so the REST API can report per-stage walls and shuffle bytes
    spark = get_spark(
        "jvs_bulk_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder
    from jvector_spark.operators.search import SearchTelemetry

    corpus_dir = f"{idx_root}/xl"
    idx_dir = f"{idx_root}/idx"
    if fresh or not os.path.isdir(os.path.join(idx_dir, "segments")):
        _probe.gen_corpus(corpus_dir, 1_000_000, 64, 1000, seed=11)
        xcorpus = spark.read.parquet(f"{corpus_dir}/corpus.parquet")
        t0 = time.perf_counter()
        IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill=2, fine_factor=8,
            n_partitions=1000, pq_residual=True,
        ).fit(xcorpus, idx_dir)
        print(f"[probe] 1m build: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        xidx = IVFIndex.load(spark, idx_dir)
    else:
        xcorpus = spark.read.parquet(f"{corpus_dir}/corpus.parquet")
        xidx = IVFIndex.load(spark, idx_dir)

    qall = xcorpus.selectExpr("id as qid", "vec")
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup() or [])
    tel = SearchTelemetry(spark)
    spark.sparkContext.setJobDescription("probe: 1m bulk search")
    t0 = time.perf_counter()
    xres = xidx.search(
        qall, 10, n_probe=4, overquery=8.0, n_probe_fine=16,
        strategy="distributed", m_hint=1_000_000, telemetry=tel,
    )
    n = xres.count()
    wall = time.perf_counter() - t0
    print(f"[probe] bulk topk 1m ({n} rows): {wall:.1f}s", file=sys.stderr)
    print(
        f"[probe] telemetry: visited={tel.visited_rows} "
        f"reranked={tel.reranked_rows} stages={tel.stage_seconds}",
        file=sys.stderr,
    )
    new_jobs = sorted(set(st.getJobIdsForGroup() or []) - before)
    job_stages = {}
    for jid in new_jobs:
        ji = st.getJobInfo(jid)
        if ji is not None:
            for sid in ji.stageIds:
                job_stages[sid] = jid

    # Per-stage walls + shuffle/IO bytes from the UI REST API — the
    # status tracker alone has no timing fields in PySpark.
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.loads(r.read())
    for s in sorted(stages, key=lambda s: s["stageId"]):
        sid = s["stageId"]
        if sid not in job_stages:
            continue
        dur = (s.get("executorRunTime") or 0) / 1e3
        deser = (s.get("executorDeserializeTime") or 0) / 1e3
        sr = (s.get("shuffleReadBytes") or 0) / 1e6
        sw = (s.get("shuffleWriteBytes") or 0) / 1e6
        inp = (s.get("inputBytes") or 0) / 1e6
        frt = (s.get("shuffleFetchWaitTime") or 0) / 1e3
        wrt = (s.get("shuffleWriteTime") or 0) / 1e9
        print(
            f"[probe] job {job_stages[sid]} stage {sid}: "
            f"run={dur:.1f}cs deser={deser:.1f}cs fetchwait={frt:.1f}cs "
            f"shufW={wrt:.1f}cs in={inp:.0f}MB sr={sr:.0f}MB sw={sw:.0f}MB "
            f"tasks={s.get('numCompleteTasks')} {s['name'].splitlines()[0][:70]}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
