"""Replay the bench large-section tail to attribute `large_dedup_exact_100k`
session-context inflation (r9 item 25).

In-bench the entry reads 52-78 s (min-of-2) while an isolated
build+dedup session holds 7.9/7.6 s warm.  Between the build and the
dedup the bench runs ~15 fused searches and a 39-eval tune() sweep.
This probe replays exactly that order on the bench's own corpus
(rng seed 5, 100k x 64, same builder knobs) with stage toggles:

    python tools/dedup_context_probe.py            # full replay
    python tools/dedup_context_probe.py --no-tune  # skip the tune sweep
    python tools/dedup_context_probe.py --no-search

and prints per-stage walls plus two dedup runs at the end.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

from jvector_spark.operators.index import IVFIndexBuilder
from jvector_spark.pipeline.dedup import embedding_neardup
from jvector_spark.session import get_spark


def main() -> None:
    do_search = "--no-search" not in sys.argv
    do_tune = "--no-tune" not in sys.argv
    spark = get_spark()

    n_l, d_l, nq_l = 100_000, 64, 64
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(200, d_l))
    asg = rng.integers(0, 200, size=n_l)
    mat = (centers[asg] + 0.25 * rng.normal(size=(n_l, d_l))).astype(np.float32)
    qsel = rng.choice(n_l, nq_l, replace=False)
    qm = (
        mat[qsel] + 0.05 * rng.normal(size=(nq_l, d_l)).astype(np.float32)
    ).astype(np.float32)

    ldir = tempfile.mkdtemp(prefix="jvs_dedup_ctx_")
    papq.write_table(
        pa.table({"id": pa.array(range(n_l), pa.int64()),
                  "vec": pa.array(mat.tolist(), pa.list_(pa.float32()))}),
        f"{ldir}/corpus.parquet", row_group_size=32000)
    papq.write_table(
        pa.table({"qid": pa.array(range(nq_l), pa.int64()),
                  "vec": pa.array(qm.tolist(), pa.list_(pa.float32()))}),
        f"{ldir}/queries.parquet")
    lcorpus = spark.read.parquet(f"{ldir}/corpus.parquet")
    lqueries = spark.read.parquet(f"{ldir}/queries.parquet")

    t0 = time.perf_counter()
    lidx = IVFIndexBuilder(
        metric="COSINE", pq_m=8, spill=2, fine_factor=8
    ).fit(lcorpus, f"{ldir}/idx")
    print(f"stage build: {time.perf_counter() - t0:.1f}s", flush=True)

    if do_search:
        t0 = time.perf_counter()
        for n_probe, npf, oq in [
            (8, None, 4.0), (8, None, 64.0), (8, 8, 64.0),
            (8, 16, 64.0), (16, 16, 64.0),
        ]:
            lidx.search(
                lqueries, 10, n_probe=n_probe, overquery=oq, n_probe_fine=npf
            ).count()
        for oq in (1.0, 2.0):
            lidx.search(lqueries, 100, n_probe=16, overquery=oq,
                        n_probe_fine=32).count()
        print(f"stage searches: {time.perf_counter() - t0:.1f}s", flush=True)

    if do_tune:
        t0 = time.perf_counter()
        tr = lidx.tune(lqueries, k=10, target_recall=0.9)
        print(f"stage tune: {time.perf_counter() - t0:.1f}s "
              f"(evals={len(tr['evaluated'])})", flush=True)

    if "--gc" in sys.argv:
        t0 = time.perf_counter()
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark._jvm.System.gc()
        time.sleep(2)
        print(f"stage gc: {time.perf_counter() - t0:.1f}s", flush=True)

    for i in range(3):
        t0 = time.perf_counter()
        n_pairs = embedding_neardup(
            lcorpus, threshold=0.98, id_col="id", vec_col="vec", n_blocks=16
        ).count()
        print(f"dedup run {i}: {time.perf_counter() - t0:.1f}s "
              f"pairs={n_pairs}", flush=True)

    import shutil

    shutil.rmtree(ldir, ignore_errors=True)


if __name__ == "__main__":
    main()
