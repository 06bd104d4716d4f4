"""Fused count + exact-uniform bounded sampling in ONE Spark job.

The training-set sampler shared by the index builder and the quantizer
trainers (ref ``ProductQuantization.java:64,141-179`` — Floyd sampling
capped at ``MAX_PQ_TRAINING_SET_SIZE`` plus a ``size()`` call, fused here
into a single distributed bottom-k pass; SURVEY.md §2.5 A4).

Every row draws an independent uniform key; the global ``sample_cap``
smallest keys form an exact uniform sample (distributed bottom-k). Each
partition forwards only its local smallest ``base_quota`` keys (4x safety
over an even split), and its row count rides in the same pass. The
per-partition counts expose skew: if a partition's fair share of the
bottom-cap provably exceeds what it was allowed to forward, ONE corrective
pass reruns with per-partition quotas sized from the now-known shares — so
heavily skewed inputs still yield an unbiased sample (2 jobs there instead
of 1).

Scale: only ``O(sample_cap)`` vectors ever reach the driver regardless of
corpus size; the pass itself is map-only (no shuffle).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _run_sample_pass(
    df: DataFrame, base_quota: int, quotas: dict | None, seed: int
):
    """One distributed bottom-k pass over a single-column (``vec``) frame:
    each partition forwards its smallest min(quota, rows) keys plus its
    row count, keyed by pid."""
    quotas = quotas or {}

    def sample_count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        quota = int(quotas.get(pid, base_quota))
        rng = np.random.default_rng((seed + 1) * 1_000_003 + pid)
        total = 0
        keys = np.empty(0, dtype=np.float64)
        vecs: list = []
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            total += m
            bk = rng.random(m)
            take = min(quota, m)
            idx = np.argpartition(bk, take - 1)[:take] if take < m else np.arange(m)
            keys = np.concatenate([keys, bk[idx]])
            # vectorized object-array take — a per-row .iloc loop here cost
            # more than the whole downstream k-means at d=1024 (measured)
            vecs.extend(pdf["vec"].to_numpy()[idx])
            if len(keys) > quota:
                cut = np.argpartition(keys, quota - 1)[:quota]
                keys = keys[cut]
                vecs = [vecs[i] for i in cut]
        yield pd.DataFrame(
            {
                "pid": np.full(len(keys) + 1, pid, dtype=np.int32),
                "cnt": np.concatenate(
                    [[total], np.zeros(len(keys), dtype=np.int64)]
                ).astype(np.int64),
                "key": np.concatenate([[2.0], keys]),  # count row sorts last
                "vec": [None] + vecs,
            }
        )

    # Arrow toPandas, NOT collect(): Row-object deserialization of the
    # sampled vectors cost ~60 s at 128k x 1024-d (measured) vs seconds
    # over Arrow; the result stays O(sample_cap) rows either way.
    # The vec column passes through in the INPUT's layout (packed-f32
    # binary index storage or array<float>) — as_matrix decodes either.
    vec_type = "binary" if dict(df.dtypes).get("vec") == "binary" else "array<float>"
    return df.mapInPandas(
        sample_count, schema=f"pid int, cnt long, key double, vec {vec_type}"
    ).toPandas()


def sample_and_count(
    df: DataFrame, sample_cap: int, seed: int, vec_col: str = "vec"
) -> tuple[int, np.ndarray]:
    """Exact row count + exact-uniform ``sample_cap``-row training sample,
    normally in ONE job (two on provably skewed layouts). Returns
    ``(n_rows, sample)`` with ``sample`` a float32 (<=cap, d) matrix —
    f32 is what every index stores and scores, so training on the f32
    values is exact w.r.t. the data the index will actually hold."""
    df = df.select(F.col(vec_col).alias("vec"))
    base_quota = min(
        sample_cap,
        max(
            64,
            int(math.ceil(sample_cap * 4.0 / max(df.rdd.getNumPartitions(), 1))),
        ),
    )
    pdf = _run_sample_pass(df, base_quota, None, seed)
    is_cnt = pdf["vec"].isna()
    n = int(pdf.loc[is_cnt, "cnt"].sum())
    if n == 0:
        raise ValueError("cannot sample an empty DataFrame")
    counts = dict(
        zip(pdf.loc[is_cnt, "pid"].astype(int), pdf.loc[is_cnt, "cnt"].astype(int))
    )
    needed = {
        pid: min(cnt, sample_cap, int(math.ceil(4.0 * sample_cap * cnt / n)))
        for pid, cnt in counts.items()
    }
    if any(v > base_quota * 1.5 for v in needed.values()):
        quotas = {
            pid: min(counts[pid], sample_cap, v + 64) for pid, v in needed.items()
        }
        pdf = _run_sample_pass(df, base_quota, quotas, seed)
        is_cnt = pdf["vec"].isna()
    picked = pdf.loc[~is_cnt].nsmallest(sample_cap, "key")
    from jvector_spark.functions import kernels

    # f32 is LOSSLESS here — the sampled values are f32 storage either way
    # (the index stores f32; array<float> sources arrive as f32). Keeping
    # the training sample f32 halves trainer BLAS bytes (the d=1024 driver
    # training phase was ~36 s of a 130 s build at f64).
    return n, kernels.as_matrix(picked["vec"], dtype=np.float32)
