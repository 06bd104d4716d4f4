#!/usr/bin/env python
"""Coarse-partition graph layout vs fused fine-mask layout for BULK ANN.

The open r8 target: bulk (corpus-as-queries) recall@10 > 0.75 at <= 600 s
on the zipf-1.5 1M corpus. The r8 analysis named the binding constraint:
the default kmeans layout makes partitions SMALL by design, so per-query
graph traversal visits most of each probed partition and loses to the
fused tile GEMM, while fine-cell masks truncate hot cells and cap the
fused route's recall (~0.73 at the 600 s budget).

This probe builds the experiment that analysis implies: a DELIBERATELY
COARSE layout (n_partitions ~ n/50k -> large partitions), per-partition
Vamana graphs via the incremental builder
(graph._build_partition_graph_incremental — O(n_p) per partition, so
large partitions are affordable to build), and the distributed traversal
route for the bulk pass (beam visits O(ef x degree) rows of a partition
regardless of its size — the regime traversal exists for). A/B against
the fused route on the standard layout at matched wall.

    python tools/bulk_coarse_probe.py [n] [zipf_s] [out.json]

Env knobs (the 1M run costs each point its own wall — pick points):
  PROBE_POINTS   comma list "np:ef:steer" (default the 100k A/B set)
  PROBE_FUSED    "0" skips the fused-layout B arm (r8 bench already
                 carries its 1M numbers)

Prints one JSON line with all measured points.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jvector_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    zipf_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    d = 64

    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "jvs_scale_probe_mod",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.py"),
    )
    probe = ilu.module_from_spec(spec)
    spec.loader.exec_module(probe)

    from jvector_spark.metrics import recall_at_k
    from jvector_spark.operators import exact
    from jvector_spark.operators.index import IVFIndexBuilder

    spark = get_spark("bulk_coarse_probe")
    res: dict = {"metric": "bulk_coarse_probe", "n": n, "zipf_s": zipf_s,
                 "points": {}}
    xdir = tempfile.mkdtemp(prefix="jvs_coarse_probe_")
    try:
        import contextlib

        with contextlib.redirect_stdout(sys.stderr):
            probe.gen_corpus(xdir, n, d, 1000, seed=11, zipf_s=zipf_s)
        corpus = spark.read.parquet(f"{xdir}/corpus.parquet")
        qall = corpus.selectExpr("id as qid", "vec")

        # recall sample + exact GT (the bench's rule: 64 sampled rows)
        rng = np.random.default_rng(3)
        sample_ids = [int(i) for i in rng.choice(n, 64, replace=False)]
        qsub = corpus.filter(F.col("id").isin(sample_ids)).selectExpr(
            "id as qid", "vec"
        )
        t0 = time.perf_counter()
        gt = exact.knn_join(corpus, qsub, 10, metric="COSINE",
                            strategy="numpy").cache()
        gt.count()
        res["gt_wall"] = round(time.perf_counter() - t0, 1)

        # ---------------- coarse layout + per-partition graphs ----------
        n_parts = max(8, n // 50_000)
        t0 = time.perf_counter()
        cidx = IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill=1, pq_residual=True,
            n_partitions=n_parts,
        ).fit(corpus, f"{xdir}/cidx")
        res["coarse_build_wall"] = round(time.perf_counter() - t0, 1)
        print(f"coarse build: {res['coarse_build_wall']}s", file=sys.stderr)
        sizes = [s.n_rows for s in cidx.manifest.segments]
        res["coarse_n_partitions"] = n_parts
        t0 = time.perf_counter()
        cidx.build_graph(degree=32, ef_construction=64)
        res["coarse_graph_build_wall"] = round(time.perf_counter() - t0, 1)
        print(
            f"coarse graph build: {res['coarse_graph_build_wall']}s "
            f"(gt {res['gt_wall']}s)",
            file=sys.stderr,
        )

        # beam_width=1 (the default at these ef): profiled 4-10x faster
        # than w=8 per query batch — wider hops inflate per-hop argsort
        # and gather cost more than they save in hop count here.
        # steer='exact': PQ-steered coarse traversal measured 0.47 @
        # 842 s (np4/ef64) and 0.55 @ 1214 s (np6/ef100) at 100k — the
        # m-byte codes can't steer long traversals across big mixed
        # partitions; fp32 steering costs the same per hop at d=64.
        pts_env = os.environ.get("PROBE_POINTS", "")
        if pts_env:
            pts = [
                (int(a), int(b), c)
                for a, b, c in (p.split(":") for p in pts_env.split(","))
            ]
        else:
            pts = [
                (4, 64, "exact"), (6, 100, "exact"), (8, 100, "exact"),
                (6, 100, "pq"),  # the negative-result point, kept measured
            ]
        for pt_i, (np_, ef, steer) in enumerate(pts):
            tag = f"coarse_np{np_}_ef{ef}_{steer}"
            if tag in res["points"]:  # repeated point (warm-wall probe)
                tag = f"{tag}_rep{pt_i}"
            t0 = time.perf_counter()
            r = cidx.search_graph(
                qall, 10, n_probe=np_, ef_search=ef, steer=steer,
                strategy="distributed", m_hint=n,
            ).persist()
            n_out = r.count()
            wall = round(time.perf_counter() - t0, 1)
            rec = round(
                recall_at_k(r.filter(F.col("qid").isin(sample_ids)), gt, 10), 4
            )
            r.unpersist()
            res["points"][tag] = {"wall": wall, "recall@10": rec,
                                  "rows": n_out}
            print(f"{tag}: recall={rec} wall={wall}s", file=sys.stderr)

        # ---------------- fused route on the standard layout ------------
        if os.environ.get("PROBE_FUSED", "1") == "0":
            gt.unpersist()
            res["coarse_partition_rows_mean"] = (
                float(np.mean(sizes)) if sizes else 0
            )
            line = json.dumps(res)
            print(line)
            if out_path:
                with open(out_path, "w") as f:
                    f.write(line)
            return
        t0 = time.perf_counter()
        fidx = IVFIndexBuilder(
            metric="COSINE", pq_m=8, spill=2, fine_factor=8,
            n_partitions=1000, pq_residual=True,
        ).fit(corpus, f"{xdir}/fidx")
        res["fused_build_wall"] = round(time.perf_counter() - t0, 1)
        # r8's frontier config on this corpus (0.7266 @ 592.9 s there)
        for np_, pr, npf, oq in [(16, 1.2, 6, 64.0), (4, None, 16, 8.0)]:
            tag = f"fused_np{np_}_pr{pr or 0}_npf{npf}_oq{int(oq)}"
            t0 = time.perf_counter()
            r = fidx.search(
                qall, 10, n_probe=np_, overquery=oq, n_probe_fine=npf,
                probe_ratio=pr, strategy="distributed", m_hint=n,
            ).persist()
            n_out = r.count()
            wall = round(time.perf_counter() - t0, 1)
            rec = round(
                recall_at_k(r.filter(F.col("qid").isin(sample_ids)), gt, 10), 4
            )
            r.unpersist()
            res["points"][tag] = {"wall": wall, "recall@10": rec,
                                  "rows": n_out}
            print(f"{tag}: recall={rec} wall={wall}s", file=sys.stderr)
        gt.unpersist()
        res["coarse_partition_rows_mean"] = float(np.mean(sizes)) if sizes else 0
    finally:
        shutil.rmtree(xdir, ignore_errors=True)
    line = json.dumps(res)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
