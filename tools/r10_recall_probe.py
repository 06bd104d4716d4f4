#!/usr/bin/env python
"""r10 knob probe: recall/wall operating points for the two open bench
targets (bulk 1M recall >= 0.75, graph d1024 recall >= 0.77).

Reproduces the bench's EXACT build configs (same corpora via
tools/scale_probe.gen_corpus seed=11, same builder knobs) — with the r10
content-keyed sampler the layouts are deterministic, so recalls measured
here are the recalls the bench will record. Indexes are built once into
a fixed dir and reused across invocations.

    python tools/r10_recall_probe.py d1024   # graph/fused knob sweep
    python tools/r10_recall_probe.py bulk    # bulk HR knob sweep
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import tools.scale_probe as _probe  # noqa: E402
from jvector_spark.metrics import recall_at_k  # noqa: E402
from jvector_spark.operators import exact as _exact  # noqa: E402
from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder  # noqa: E402
from jvector_spark.session import get_spark  # noqa: E402

ROOT = os.environ.get("JVS_PROBE_ROOT", "/tmp/jvs_r10_probe")


def _d1024(spark) -> None:
    cdir, idir = f"{ROOT}/hd", f"{ROOT}/hd_idx"
    if not os.path.isdir(f"{cdir}/corpus.parquet"):
        _probe.gen_corpus(cdir, 100_000, 1024, 100, seed=11)
    corpus = spark.read.parquet(f"{cdir}/corpus.parquet")
    if not os.path.isdir(os.path.join(idir, "segments")):
        t0 = time.perf_counter()
        idx = IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill="auto", fine_factor=8,
            n_partitions=316, rerank="nvq", store_fp32="none",
        ).fit(corpus, idir)
        print(f"[probe] build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        idx.build_graph(degree=32, ef_construction=64)
        print(f"[probe] graph: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    idx = IVFIndex.load(spark, idir)
    hq = corpus.filter(F.col("id") % (100_000 // 64) == 0).selectExpr(
        "id as qid", "vec"
    )
    gt = _exact.knn_join(corpus, hq, 10, metric="COSINE", strategy="numpy").cache()
    gt.count()

    # fused points (headline + candidates)
    for np_, oq, npf in [(12, 64.0, 24), (14, 64.0, 28), (16, 64.0, 32)]:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = idx.search(hq, 10, n_probe=np_, overquery=oq, n_probe_fine=npf)
            r.count()
            walls.append(time.perf_counter() - t0)
        rec = recall_at_k(r, gt, 10)
        print(f"fused np{np_} oq{int(oq)} npf{npf}: recall {rec:.4f} "
              f"wall {min(walls):.2f}s", flush=True)

    # graph points ((np, ef, beam_width); W=None -> default ef//64)
    for np_, ef, bw in [
        (12, 640, None), (16, 640, None), (12, 960, None), (16, 960, None),
        (12, 640, 4), (12, 640, 6), (16, 640, 6),
    ]:
        kw = {} if bw is None else {"beam_width": bw}
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = idx.search_graph(hq, 10, n_probe=np_, ef_search=ef, **kw)
            r.count()
            walls.append(time.perf_counter() - t0)
        rec = recall_at_k(r, gt, 10)
        print(f"graph np{np_} ef{ef} W{bw or ef // 64}: recall {rec:.4f} "
              f"wall {min(walls):.2f}s", flush=True)
    gt.unpersist()


def _bulk(spark) -> None:
    cdir, idir = f"{ROOT}/xl", f"{ROOT}/xl_idx"
    if not os.path.isdir(f"{cdir}/corpus.parquet"):
        _probe.gen_corpus(cdir, 1_000_000, 64, 1000, seed=11)
    corpus = spark.read.parquet(f"{cdir}/corpus.parquet")
    if not os.path.isdir(os.path.join(idir, "segments")):
        t0 = time.perf_counter()
        IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill=2, fine_factor=8,
            n_partitions=1000, pq_residual=True,
        ).fit(corpus, idir)
        print(f"[probe] build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    idx = IVFIndex.load(spark, idir)
    qall = corpus.selectExpr("id as qid", "vec")
    rng = np.random.default_rng(3)
    sample_ids = [int(i) for i in rng.choice(1_000_000, 64, replace=False)]
    qsub = corpus.filter(F.col("id").isin(sample_ids)).selectExpr(
        "id as qid", "vec"
    )
    gt = _exact.knn_join(corpus, qsub, 10, metric="COSINE", strategy="numpy").cache()
    gt.count()

    pts = [
        (4, 16, 8.0),    # current frontier entry (reference)
        (4, 32, 64.0),   # r6: 0.755 @ 249 s (pre-r9 kernels)
        (4, 32, 128.0),
        (8, 32, 64.0),
    ]
    which = os.environ.get("JVS_PROBE_PTS")
    if which:
        idxs = [int(i) for i in which.split(",")]
        pts = [pts[i] for i in idxs]
    for np_, npf, oq in pts:
        t0 = time.perf_counter()
        res = idx.search(
            qall, 10, n_probe=np_, overquery=oq, n_probe_fine=npf,
            strategy="distributed", m_hint=1_000_000,
        ).persist()
        n = res.count()
        wall = time.perf_counter() - t0
        rec = recall_at_k(res.filter(F.col("qid").isin(sample_ids)), gt, 10)
        res.unpersist()
        print(f"bulk np{np_} npf{npf} oq{int(oq)}: recall {rec:.4f} "
              f"wall {wall:.1f}s rows {n}", flush=True)
    gt.unpersist()


def main() -> None:
    spark = get_spark("jvs_r10_probe")
    mode = sys.argv[1] if len(sys.argv) > 1 else "d1024"
    if "--fresh" in sys.argv:
        shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    if mode == "d1024":
        _d1024(spark)
    else:
        _bulk(spark)


if __name__ == "__main__":
    main()
