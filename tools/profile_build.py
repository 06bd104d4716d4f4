#!/usr/bin/env python
"""Isolated profile runs for the bench's heavy shapes (guide §1: measure
first, noop-style materialization, labeled jobs).

    JVS_BUILD_TRACE=1 python tools/profile_build.py d1024
    python tools/profile_build.py 1m [--skip-build-profile]
    python tools/profile_build.py dedup
    python tools/profile_build.py bulk1m

Each mode reproduces the exact bench section in isolation (same corpus
generator, same knobs, same warm-up discipline) and prints phase walls to
stderr; nothing under /root/testdata is touched.
"""

from __future__ import annotations

import importlib.util as _ilu
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jvector_spark.session import get_spark  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "jvs_scale_probe_mod",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.py"),
)
_probe = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_probe)


def _t(label: str, t0: float) -> float:
    now = time.perf_counter()
    print(f"[profile] {label}: {now - t0:.2f}s", file=sys.stderr)
    return now


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "d1024"
    spark = get_spark("jvs_profile")
    from jvector_spark.operators.index import IVFIndexBuilder

    xdir = tempfile.mkdtemp(prefix="jvs_profile_")
    try:
        if mode == "d1024":
            _probe.gen_corpus(f"{xdir}/hd", 100_000, 1024, 100, seed=11)
            hcorpus = spark.read.parquet(f"{xdir}/hd/corpus.parquet")
            t0 = time.perf_counter()
            IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill="auto", fine_factor=8,
                n_partitions=16, rerank="nvq", store_fp32="none",
            ).fit(hcorpus.limit(4096), f"{xdir}/hd/warm_idx")
            t0 = _t("warm-up build", t0)
            spark.sparkContext.setJobDescription("profile: d1024 build")
            hidx = IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill="auto", fine_factor=8,
                n_partitions=316, rerank="nvq", store_fp32="none",
            ).fit(hcorpus, f"{xdir}/hd/idx")
            t0 = _t("TIMED d1024 build", t0)
            spark.sparkContext.setJobDescription("profile: d1024 graph build")
            hidx.build_graph(degree=32, ef_construction=64)
            _t("graph build d1024", t0)
        elif mode == "1m":
            _probe.gen_corpus(xdir + "/xl", 1_000_000, 64, 1000, seed=11)
            xcorpus = spark.read.parquet(f"{xdir}/xl/corpus.parquet")
            t0 = time.perf_counter()
            IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=16, pq_residual=True,
            ).fit(xcorpus.limit(4096), f"{xdir}/xl/warm_idx")
            t0 = _t("warm-up build", t0)
            spark.sparkContext.setJobDescription("profile: 1m build")
            IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=1000, pq_residual=True,
            ).fit(xcorpus, f"{xdir}/xl/idx")
            _t("TIMED 1m build", t0)
        elif mode == "bulk1m":
            from jvector_spark.operators.index import IVFIndex
            from jvector_spark.operators.search import SearchTelemetry

            _probe.gen_corpus(xdir + "/xl", 1_000_000, 64, 1000, seed=11)
            xcorpus = spark.read.parquet(f"{xdir}/xl/corpus.parquet")
            t0 = time.perf_counter()
            IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=16, pq_residual=True,
            ).fit(xcorpus.limit(4096), f"{xdir}/xl/warm_idx")
            xidx = IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=1000, pq_residual=True,
            ).fit(xcorpus, f"{xdir}/xl/idx")
            t0 = _t("1m build (untimed here)", t0)
            qall = xcorpus.selectExpr("id as qid", "vec")
            tel = SearchTelemetry(spark)
            spark.sparkContext.setJobDescription("profile: 1m bulk search")
            xres = xidx.search(
                qall, 10, n_probe=4, overquery=8.0, n_probe_fine=16,
                strategy="distributed", m_hint=1_000_000, telemetry=tel,
            )
            n = xres.count()
            t0 = _t(f"TIMED bulk topk 1m ({n} rows)", t0)
            print(
                f"[profile] telemetry: visited={tel.visited_rows} "
                f"reranked={tel.reranked_rows} stages={tel.stage_seconds}",
                file=sys.stderr,
            )
        elif mode == "compact1m":
            # the bench's large_compact_1m shape: 1M index (graphs built)
            # + 50k appended segment (graph built) + 1k deletes, then
            # compact(). JVS_BUILD_TRACE=1 attributes the merged-segment
            # rebuild phases; the graph rebuild is the remainder.
            from pyspark.sql import functions as F

            from jvector_spark.operators.index import IVFIndex  # noqa: F401

            xl_n = 1_000_000
            _probe.gen_corpus(xdir + "/xl", xl_n, 64, 1000, seed=11)
            xcorpus = spark.read.parquet(f"{xdir}/xl/corpus.parquet")
            t0 = time.perf_counter()
            IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=16, pq_residual=True,
            ).fit(xcorpus.limit(4096), f"{xdir}/xl/warm_idx")
            t0 = _t("warm-up build", t0)
            xidx = IVFIndexBuilder(
                metric="COSINE", pq_m=8, spill=2, fine_factor=8,
                n_partitions=1000, pq_residual=True,
            ).fit(xcorpus, f"{xdir}/xl/idx")
            t0 = _t("1m build (untimed here)", t0)
            xidx.build_graph(degree=16, ef_construction=32)
            t0 = _t("initial graph build 1m", t0)
            n_app = 50_000
            app = xcorpus.filter(F.col("id") < n_app).selectExpr(
                f"id + {xl_n} as id", "vec"
            )
            xidx.append(app)
            xidx.build_graph(degree=16, ef_construction=32)
            del_ids = list(range(0, 100_000, 100))
            xidx.delete(del_ids)
            t0 = _t("append+graph+delete", t0)
            spark.sparkContext.setJobDescription("profile: compact 1m")
            xidx.compact()
            _t("TIMED compact 1m", t0)
        elif mode == "dedup":
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as papq

            from jvector_spark.pipeline.dedup import embedding_neardup

            n_l, d_l = 100_000, 64
            rng = np.random.default_rng(5)
            centers = rng.normal(size=(200, d_l))
            asg = rng.integers(0, 200, size=n_l)
            mat = (centers[asg] + 0.25 * rng.normal(size=(n_l, d_l))).astype(
                np.float32
            )
            papq.write_table(
                pa.table({
                    "id": pa.array(range(n_l), pa.int64()),
                    "vec": pa.array(mat.tolist(), pa.list_(pa.float32())),
                }),
                f"{xdir}/corpus.parquet", row_group_size=32000,
            )
            lcorpus = spark.read.parquet(f"{xdir}/corpus.parquet")
            lcorpus.count()  # warm the scan
            for run in range(3):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(
                    f"profile: dedup exact run {run}"
                )
                n_pairs = embedding_neardup(
                    lcorpus, threshold=0.98, id_col="id", vec_col="vec",
                    n_blocks=16,
                ).count()
                _t(f"dedup_exact_100k run {run} ({n_pairs} pairs)", t0)
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        shutil.rmtree(xdir, ignore_errors=True)


if __name__ == "__main__":
    main()
