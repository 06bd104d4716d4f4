#!/usr/bin/env python
"""1M-row (configurable) scale probe: build + search + bulk top-k timing.

The round-5/6 measurement harness behind ROUND{5,6}.md's scale sections —
a zipf-skewed clustered corpus (the hard layout for tile sizing: hot
coarse cells), two-level IVF build, the recall-per-IO search grid, and
the corpus-as-queries BULK top-k (the flagship 100 TB dedup shape,
ref GraphSearcher.java:222 J2/J3 at corpus scale).

Usage::

    python tools/scale_probe.py [--n 1000000] [--d 64] [--bulk] \
        [--bulk-only] [--keep DIR]

Writes nothing outside a temp dir (or --keep DIR for reuse across runs);
prints one JSON line per measurement so runs are grep-able.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(**kw) -> None:
    print(json.dumps(kw), flush=True)


def gen_corpus(
    dirpath: str, n: int, d: int, n_clusters: int, seed: int,
    dupe_frac: float = 0.0, zipf_s: float = 1.1,
) -> None:
    """Write the probe corpus. ``dupe_frac`` > 0 additionally overwrites that
    fraction of rows with EXACT copies of earlier rows (uniform source pick
    within the same write chunk) and records the injected (src_id, dup_id)
    pairs in ``dupe_pairs.parquet`` — known-answer ground truth for the
    1M-scale threshold-dedup probe. The duplicate stream uses its own RNG so
    ``dupe_frac=0`` output stays byte-identical to earlier rounds."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    # zipf-skewed cluster populations (hot cells stress tile sizing)
    w = 1.0 / np.arange(1, n_clusters + 1) ** zipf_s
    w /= w.sum()
    os.makedirs(dirpath, exist_ok=True)
    chunk = 250_000
    writer = None
    all_pairs = []
    t0 = time.perf_counter()
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        asg = rng.choice(n_clusters, size=m, p=w)
        mat = (centers[asg] + 0.25 * rng.normal(size=(m, d))).astype(np.float32)
        if dupe_frac > 0.0 and m > 1:
            drng = np.random.default_rng(seed * 1_000_003 + lo)
            nd = int(m * dupe_frac)
            dst = np.sort(drng.choice(np.arange(1, m), size=nd, replace=False))
            src = np.floor(drng.random(nd) * dst).astype(np.int64)  # src < dst
            # sequential in increasing dst order: a src that is itself a dup
            # has already received its final value (src < dst throughout), so
            # every recorded pair holds bit-equal vectors even in chains
            for s, t_ in zip(src, dst):
                mat[t_] = mat[s]
            all_pairs.append(np.stack([src + lo, dst + lo], axis=1))
        tbl = pa.table(
            {
                "id": pa.array(range(lo, lo + m), pa.int64()),
                "vec": pa.array(mat.tolist(), pa.list_(pa.float32())),
            }
        )
        if writer is None:
            writer = papq.ParquetWriter(f"{dirpath}/corpus.parquet", tbl.schema)
        # row groups are the parquet SPLIT unit: keep them ~16 MB so wide
        # rows (d=1024: 4 KB/row) still scan many-way parallel — a fixed
        # row count gave 256 MB groups at d=1024, capping every downstream
        # map stage at n/62.5k tasks
        writer.write_table(tbl, row_group_size=max(4096, 62_500 * 64 // d))
    writer.close()
    if all_pairs:
        pairs = np.concatenate(all_pairs)
        papq.write_table(
            pa.table(
                {
                    "src_id": pa.array(pairs[:, 0], pa.int64()),
                    "dup_id": pa.array(pairs[:, 1], pa.int64()),
                }
            ),
            f"{dirpath}/dupe_pairs.parquet",
        )
    # held-out noisy queries near random corpus clusters
    qn = 64
    asg = rng.choice(n_clusters, size=qn, p=w)
    qm = (centers[asg] + 0.25 * rng.normal(size=(qn, d))).astype(np.float32)
    qm += 0.05 * rng.normal(size=(qn, d)).astype(np.float32)
    import pyarrow as pa2

    papq.write_table(
        pa2.table(
            {
                "qid": pa2.array(range(qn), pa2.int64()),
                "vec": pa2.array(qm.tolist(), pa2.list_(pa2.float32())),
            }
        ),
        f"{dirpath}/queries.parquet",
    )
    log(step="gen", n=n, d=d, sec=round(time.perf_counter() - t0, 1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=1000)
    ap.add_argument("--parts", type=int, default=1000)
    ap.add_argument("--fine-factor", type=int, default=8)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument(
        "--fine-assign-cells", type=int, default=4,
        help="coarse cells contributing fine candidates (0 = global argmin)",
    )
    ap.add_argument(
        "--rerank", choices=("fp32", "nvq"), default="fp32",
        help="stage-2 payload: fp32 vecs or NVQ bytes (1/4 shuffle at d=64)",
    )
    ap.add_argument(
        "--residual", action="store_true",
        help="PQ codes encode (vec - coarse centroid): FAISS-IVFPQ-style "
        "residual quantization (r6) — same ADC gather, per-cell dot offset",
    )
    ap.add_argument(
        "--dupes", type=float, default=0.0,
        help="inject this fraction of EXACT duplicate rows (known-answer "
        "ground truth for --threshold-bulk); 0 keeps the corpus byte-"
        "identical to earlier rounds",
    )
    ap.add_argument(
        "--threshold-bulk", type=float, default=None, metavar="TAU",
        help="corpus-as-queries THRESHOLD search (the exact semantic-dedup "
        "shape, ref J4 at corpus scale): bound-pruned, exact fp32 scoring; "
        "with --dupes, verifies every injected pair is recovered",
    )
    ap.add_argument("--bulk", action="store_true", help="run corpus-as-queries bulk top-k")
    ap.add_argument(
        "--bulk-every", type=int, default=1,
        help="use every k-th corpus row as a query (deterministic id "
        "stride) — bounds bulk cost at 10M+ corpora where all-rows "
        "queries would be quadratic",
    )
    ap.add_argument("--bulk-np", type=int, default=4)
    ap.add_argument("--bulk-npf", type=int, default=16)
    ap.add_argument("--bulk-oq", type=float, default=8.0)
    ap.add_argument(
        "--bulk-ratio", type=float, default=None,
        help="adaptive probe depth: probe partitions within this ratio of "
        "the nearest centroid distance, bulk-np as the cap (skew lever)",
    )
    ap.add_argument(
        "--bulk-npf-per-probe", action="store_true",
        help="bulk-npf is a PER-KEPT-PROBE fine-cell budget (r7 skew "
        "lever) instead of a flat per-query total",
    )
    ap.add_argument("--bulk-only", action="store_true")
    ap.add_argument(
        "--bulk-graph", action="store_true",
        help="also run the bulk shape through the GRAPH route "
        "(search_graph; requires --graph). Honors --bulk-graph-strategy.",
    )
    ap.add_argument(
        "--bulk-graph-ef", type=int, default=40,
        help="ef_search for the bulk graph route",
    )
    ap.add_argument(
        "--bulk-graph-strategy", default="distributed",
        choices=["auto", "distributed", "broadcast"],
        help="force a graph route or let auto pick (r8 routing arithmetic)",
    )
    ap.add_argument(
        "--prof", action="store_true",
        help="collect per-stage kernel core-seconds (SearchTelemetry) on the bulk run",
    )
    ap.add_argument("--skip-grid", action="store_true")
    ap.add_argument(
        "--zipf", type=float, default=1.1,
        help="cluster-population zipf exponent (higher = harsher skew; "
        "1.1 reproduces earlier rounds' corpora byte-identically)",
    )
    ap.add_argument("--keep", default=None, help="persistent dir (reuse corpus+index)")
    ap.add_argument(
        "--vec-format", default="packed_f32", choices=["packed_f32", "list"],
        help="vec storage layout A/B (same f32 values, bit-identical scores)",
    )
    ap.add_argument(
        "--store-fp32", default="all", choices=["all", "none"],
        help="'none' = slim index (PQ codes + NVQ payload, no fp32 column; "
        "requires --rerank nvq) — the reference's storage economics (r7)",
    )
    ap.add_argument(
        "--graph", action="store_true",
        help="build per-partition Vamana graphs (M3/M4) and run the "
        "graph-traversal search points alongside the fused-scan grid",
    )
    ap.add_argument("--graph-degree", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jvector_spark.metrics import recall_at_k
    from jvector_spark.operators import exact
    from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder
    from jvector_spark.session import get_spark

    spark = get_spark("jvs_scale_probe")
    base = args.keep or tempfile.mkdtemp(prefix="jvs_scale_")
    try:
        if not os.path.exists(f"{base}/corpus.parquet"):
            gen_corpus(base, args.n, args.d, args.clusters, seed=11,
                       dupe_frac=args.dupes, zipf_s=args.zipf)
        corpus = spark.read.parquet(f"{base}/corpus.parquet")
        queries = spark.read.parquet(f"{base}/queries.parquet")

        suffix = (
            ("" if args.pq_m == 8 else f"_m{args.pq_m}")
            + ("" if args.rerank == "fp32" else f"_{args.rerank}")
            + ("_res" if args.residual else "")
            + ("" if args.vec_format == "packed_f32" else f"_{args.vec_format}")
            + ("_slim" if args.store_fp32 == "none" else "")
        )
        idx_dir = f"{base}/idx{suffix}"
        if os.path.exists(f"{idx_dir}/meta.json"):
            idx = IVFIndex.load(spark, idx_dir)
            log(step="build", sec=0.0, cached=True)
        else:
            t0 = time.perf_counter()
            idx = IVFIndexBuilder(
                metric="COSINE", pq_m=args.pq_m, spill=2,
                fine_factor=args.fine_factor, n_partitions=args.parts,
                fine_assign_cells=args.fine_assign_cells, rerank=args.rerank,
                pq_residual=args.residual, vec_format=args.vec_format,
                store_fp32=args.store_fp32,
            ).fit(corpus, idx_dir)
            log(
                step="build", sec=round(time.perf_counter() - t0, 1),
                fine_assign_cells=args.fine_assign_cells, rerank=args.rerank,
                residual=args.residual,
            )

        if args.graph:
            from jvector_spark.operators.graph import graph_meta

            if graph_meta(idx, idx.manifest.segments[0].name) is None:
                t0 = time.perf_counter()
                idx.build_graph(
                    degree=args.graph_degree,
                    ef_construction=2 * args.graph_degree,
                )
                log(
                    step="graph_build", degree=args.graph_degree,
                    sec=round(time.perf_counter() - t0, 1),
                )
            else:
                log(step="graph_build", sec=0.0, cached=True)

        if not args.bulk_only and not args.skip_grid:
            t0 = time.perf_counter()
            gt = exact.knn_join(
                corpus, queries, 10, metric="COSINE", strategy="numpy"
            ).cache()
            gt.count()
            log(step="gt_exact_64q", sec=round(time.perf_counter() - t0, 1))
            if args.graph:
                from jvector_spark.operators.search import SearchTelemetry

                for np_, ef in [(8, 40), (8, 100), (16, 100)]:
                    tel = SearchTelemetry(spark)
                    t0 = time.perf_counter()
                    r = idx.search_graph(
                        queries, 10, n_probe=np_, ef_search=ef, telemetry=tel
                    )
                    rec = recall_at_k(r, gt, 10)
                    dt = time.perf_counter() - t0
                    nq = queries.count()
                    log(
                        step="graph_search", n_probe=np_, ef=ef,
                        recall10=round(rec, 4), sec=round(dt, 2),
                        visited_frac=round(
                            tel.visited_rows / (nq * args.n * 2), 5
                        ),
                    )
            for np_, npf, oq in [
                (8, None, 4.0), (8, None, 64.0), (8, 16, 64.0),
                (8, 16, 512.0), (16, 32, 512.0),
            ]:
                t0 = time.perf_counter()
                r = idx.search(
                    queries, 10, n_probe=np_, overquery=oq, n_probe_fine=npf
                )
                rec = recall_at_k(r, gt, 10)
                dt = time.perf_counter() - t0
                io = idx.probe_io_stats(queries, np_, npf)
                log(
                    step="search", n_probe=np_, npf=npf or 0, oq=int(oq),
                    recall10=round(rec, 4), sec=round(dt, 2),
                    visited_frac=round(io["visited_fraction"], 5),
                )
            gt.unpersist()

        if args.threshold_bulk is not None:
            # every corpus row as a THRESHOLD query: the exact semantic-dedup
            # shape at scale. Pruning uses the stored partition bounds; the
            # survivors are scored exactly, so with injected exact duplicates
            # recovery MUST be 100% — a correctness gate, not a recall knob.
            tau = args.threshold_bulk
            qall = corpus.selectExpr("id as qid", "vec")
            m_tq = args.n
            if args.bulk_every > 1:
                # strided query subset (10M+ corpora): only pairs whose
                # SMALLER id is a query remain verifiable after qid < id
                qall = qall.filter(F.pmod(F.col("qid"), args.bulk_every) == 0)
                m_tq = args.n // args.bulk_every
            t0 = time.perf_counter()
            pairs = (
                idx.threshold_search(
                    qall, tau, strategy="distributed", m_hint=m_tq
                )
                .filter(F.col("qid") < F.col("id"))
                .persist()
            )
            n_pairs = pairs.count()
            dt = time.perf_counter() - t0
            log(step="threshold_bulk", tau=tau, pairs=n_pairs, sec=round(dt, 1))
            if os.path.exists(f"{base}/dupe_pairs.parquet"):
                inj = spark.read.parquet(f"{base}/dupe_pairs.parquet")
                if args.bulk_every > 1:
                    inj = inj.filter(
                        F.pmod(F.col("src_id"), args.bulk_every) == 0
                    )
                n_inj = inj.count()
                n_found = (
                    inj.join(
                        pairs,
                        (inj["src_id"] == pairs["qid"])
                        & (inj["dup_id"] == pairs["id"]),
                        "left_semi",
                    ).count()
                )
                log(
                    step="threshold_bulk_verify", injected=n_inj,
                    recovered=n_found,
                    recovered_frac=round(n_found / max(1, n_inj), 6),
                )
            pairs.unpersist()

        if args.bulk or args.bulk_only:
            # the flagship bulk shape: every corpus row (or a deterministic
            # id-stride subset) as a query through the distributed tile
            # route (semantic-dedup / bulk-join shape)
            qall = corpus.selectExpr("id as qid", "vec")
            m_q = args.n
            if args.bulk_every > 1:
                qall = qall.filter(F.pmod(F.col("qid"), args.bulk_every) == 0)
                m_q = args.n // args.bulk_every
            tel = None
            if args.prof:
                from jvector_spark.operators.search import SearchTelemetry

                tel = SearchTelemetry(spark)
            t0 = time.perf_counter()
            res = idx.search(
                qall, 10, n_probe=args.bulk_np, overquery=args.bulk_oq,
                n_probe_fine=args.bulk_npf, probe_ratio=args.bulk_ratio,
                npf_per_probe=args.bulk_npf_per_probe,
                strategy="distributed", m_hint=m_q, telemetry=tel,
            ).persist()  # the recall slice below must not re-run the search
            n_out = res.count()
            dt = time.perf_counter() - t0
            log(
                step="bulk_topk", rows=n_out, sec=round(dt, 1),
                n_probe=args.bulk_np, npf=args.bulk_npf, oq=args.bulk_oq,
                ratio=args.bulk_ratio, npf_per_probe=args.bulk_npf_per_probe,
            )
            if tel is not None:
                log(step="bulk_prof", core_sec=tel.stage_seconds,
                    visited=tel.visited_rows, reranked=tel.reranked_rows)
            # pin bulk recall on 64 sampled corpus rows vs exact GT
            rng = np.random.default_rng(3)
            pool = np.arange(0, args.n, args.bulk_every)
            sample_ids = [int(i) for i in rng.choice(pool, 64, replace=False)]
            sub = res.filter(F.col("qid").isin(sample_ids))
            qsub = corpus.filter(F.col("id").isin(sample_ids)).selectExpr(
                "id as qid", "vec"
            )
            gt2 = exact.knn_join(corpus, qsub, 10, metric="COSINE", strategy="numpy")
            log(step="bulk_recall", recall10=round(recall_at_k(sub, gt2, 10), 4))
            res.unpersist()

            if args.bulk_graph:
                from jvector_spark.operators.graph import _bulk_traversal_pays

                log(
                    step="bulk_graph_route_arith",
                    traversal_pays=_bulk_traversal_pays(idx, args.bulk_graph_ef),
                )
                t0 = time.perf_counter()
                gres = idx.search_graph(
                    qall, 10, n_probe=args.bulk_np,
                    ef_search=args.bulk_graph_ef,
                    strategy=args.bulk_graph_strategy, m_hint=m_q,
                ).persist()
                n_gout = gres.count()
                dt = time.perf_counter() - t0
                log(
                    step="bulk_graph_topk", rows=n_gout, sec=round(dt, 1),
                    n_probe=args.bulk_np, ef=args.bulk_graph_ef,
                    strategy=args.bulk_graph_strategy,
                )
                gsub = gres.filter(F.col("qid").isin(sample_ids))
                log(
                    step="bulk_graph_recall",
                    recall10=round(recall_at_k(gsub, gt2, 10), 4),
                )
                gres.unpersist()
    finally:
        if args.keep is None:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
