"""IVF (coarse-centroid partitioned) vector index: build / persist / search.

This is the engine's analog of the reference's graph index
(``graph/GraphIndexBuilder.java`` build path, ``graph/disk/OnDiskGraphIndex``
storage, ``GraphSearcher`` read path — SURVEY.md §3). Per SURVEY §2.4 J2, a
per-row beam search over a pointer graph is the wrong physical design for a
batch engine; the idiomatic Spark strategy with the same observable contract
(approximate top-k with a tunable recall/cost knob) is IVF partition
pruning:

- **build** (ref ``build(ravv)``, GraphIndexBuilder.java:436): sample →
  k-means coarse centroids (the "upper layers" / entry points) → every
  vector assigned to its nearest centroid (``part_id``) → PQ codebooks
  trained on the same sample → codes + vectors written as Parquet
  partitioned by ``part_id``.
- **search** (ref ``GraphSearcher.search``, hierarchical descent → beam):
  queries are assigned to their ``n_probe`` nearest centroids (the descent
  analog — centroids are broadcast like the RAM-cached upper layers,
  OnDiskGraphIndex.java:119-161); stage 1 ADC-scans only the probed
  ``part_id`` Parquet partitions (partition pruning = traversal pruning);
  stage 2 reranks survivors at fp32 (GraphSearcher.java:471-507).
  ``n_probe`` ≈ beam width, ``overquery`` = rerankK factor.
- **segments + compaction**: streaming appends accumulate segment dirs;
  search unions segments (J6 multi-index merge, free in a batch engine);
  ``compact()`` rewrites N segments as one with PQ retrain on a balanced
  per-segment sample (ref OnDiskGraphIndexCompactor.java:296, PQRetrainer
  ≥1000/source), dropping tombstoned ids (M5 two-phase delete).

Scale: centroid count defaults to ~sqrt(n) capped so centroids stay
broadcast-able; the stage-1 scan reads n_probe/n_partitions of the codes
table (bytes/row = pq_m); nothing in build or search shuffles the fp32
corpus except the initial partitioned write (one shuffle, amortized over
every later query).
"""

from __future__ import annotations

import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jvector_spark.functions import kernels
from jvector_spark.operators.quantize.pq import ProductQuantizer
from jvector_spark.types import IndexManifest, SegmentInfo

MAX_CENTROIDS = 4096  # keep the broadcast "upper layer" small


def _assign_partitions(
    df: DataFrame, centroids: np.ndarray, vec_col: str, out_col: str = "part_id"
) -> DataFrame:
    """Nearest-centroid assignment (map-only, broadcast centroids)."""
    b = df.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = b.value
        cc = np.einsum("ij,ij->i", cents, cents)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = kernels.as_matrix(pdf[vec_col])
            d = -2.0 * x @ cents.T + cc[None, :]
            pdf = pdf.copy()
            pdf[out_col] = np.argmin(d, axis=1).astype(np.int32)
            yield pdf

    fields = [f"{fld.name} {fld.dataType.simpleString()}" for fld in df.schema.fields]
    fields.append(f"{out_col} int")
    return df.mapInPandas(assign, schema=", ".join(fields))


class IVFIndexBuilder:
    """Batch index build job (ref GraphIndexBuilder; M2 bulk build)."""

    def __init__(
        self,
        metric: str = "COSINE",
        n_partitions: int | None = None,
        pq_m: int = 8,
        pq_clusters: int = 256,
        sample_cap: int = 128_000,
        kmeans_iterations: int = 6,
        seed: int = 42,
    ):
        self.metric = metric
        self.n_partitions = n_partitions
        self.pq_m = pq_m
        self.pq_clusters = pq_clusters
        self.sample_cap = sample_cap
        self.kmeans_iterations = kmeans_iterations
        self.seed = seed

    def fit(
        self,
        df: DataFrame,
        path: str,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "IVFIndex":
        os.makedirs(path, exist_ok=True)
        spark = df.sparkSession
        n = df.count()
        manifest = self._build_segment(df, path, "seg-000000", n, id_col, vec_col)
        manifest.save(path)
        return IVFIndex.load(spark, path)

    def _build_segment(
        self,
        df: DataFrame,
        path: str,
        seg_name: str,
        n: int,
        id_col: str,
        vec_col: str,
        manifest: IndexManifest | None = None,
    ) -> IndexManifest:
        from jvector_spark.operators.quantize.kmeans import kmeans_pp

        spark = df.sparkSession
        df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

        n_parts = self.n_partitions or max(1, min(MAX_CENTROIDS, int(math.sqrt(max(n, 1)))))
        fraction = min(1.0, (self.sample_cap * 1.2) / max(n, 1))
        sample_rows = (
            df.select("vec").sample(fraction=fraction, seed=self.seed).limit(self.sample_cap).collect()
        )
        sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
        dim = sample.shape[1]

        centroids = kmeans_pp(sample, n_parts, self.kmeans_iterations, self.seed)
        pq = ProductQuantizer.fit_numpy(
            sample, m=self.pq_m, clusters=self.pq_clusters,
            center=(self.metric == "EUCLIDEAN"),
            iterations=self.kmeans_iterations, seed=self.seed,
        )

        seg_dir = os.path.join(path, "segments", seg_name)
        os.makedirs(seg_dir, exist_ok=True)

        assigned = _assign_partitions(df, centroids, "vec").cache()
        (
            assigned.repartition("part_id")
            .write.mode("overwrite")
            .partitionBy("part_id")
            .parquet(os.path.join(seg_dir, "vectors.parquet"))
        )
        codes = pq.encode(assigned, vec_col="vec", id_col="id")
        codes = codes.join(assigned.select("id", "part_id"), "id")
        (
            codes.repartition("part_id")
            .write.mode("overwrite")
            .partitionBy("part_id")
            .parquet(os.path.join(seg_dir, "codes.parquet"))
        )
        assigned.unpersist()

        cent_df = spark.createDataFrame(
            [(i, centroids[i].tolist()) for i in range(len(centroids))],
            "part_id int, centroid array<double>",
        )
        cent_df.coalesce(1).write.mode("overwrite").parquet(os.path.join(seg_dir, "centroids.parquet"))
        pq.save(os.path.join(seg_dir, "pq"))

        if manifest is None:
            manifest = IndexManifest(
                dim=dim, metric=self.metric, pq_m=self.pq_m,
                pq_clusters=self.pq_clusters, n_partitions=self.n_partitions,
            )
        manifest.segments.append(SegmentInfo(name=seg_name, n_rows=n, n_partitions=int(len(centroids))))
        return manifest


class IVFIndex:
    """Loaded index: search / delete / append / compact / stats."""

    def __init__(self, spark: SparkSession, path: str, manifest: IndexManifest):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        self._segments: dict[str, dict] = {}
        for seg in manifest.segments:
            seg_dir = os.path.join(path, "segments", seg.name)
            cents = spark.read.parquet(os.path.join(seg_dir, "centroids.parquet")).collect()
            arr = np.zeros((len(cents), manifest.dim), dtype=np.float64)
            for r in cents:
                arr[r["part_id"]] = np.asarray(r["centroid"])
            self._segments[seg.name] = {
                "dir": seg_dir,
                "centroids": arr,
                "pq": ProductQuantizer.load(os.path.join(seg_dir, "pq")),
            }

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFIndex":
        return cls(spark, path, IndexManifest.load(path))

    # ----------------------------------------------------------------- state
    def vectors(self, segment: str | None = None) -> DataFrame:
        segs = [segment] if segment else [s.name for s in self.manifest.segments]
        dfs = [
            self.spark.read.parquet(os.path.join(self._segments[s]["dir"], "vectors.parquet"))
            for s in segs
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def tombstones(self) -> DataFrame | None:
        p = os.path.join(self.path, "tombstones.parquet")
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        return None

    def live_vectors(self) -> DataFrame:
        """F2 liveness filter: anti-join against the tombstone table."""
        v = self.vectors()
        t = self.tombstones()
        return v.join(t, "id", "left_anti") if t is not None else v

    # ---------------------------------------------------------------- search
    def search(
        self,
        queries_df: DataFrame,
        k: int,
        n_probe: int = 8,
        overquery: float = 4.0,
        query_id_col: str = "qid",
        query_vec_col: str = "vec",
    ) -> DataFrame:
        """Two-phase partition-pruned k-NN join over all live segments."""
        metric = self.manifest.metric
        rerank_k = max(k, int(round(overquery * k)))
        qrows = queries_df.select(query_id_col, query_vec_col).collect()
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])

        stage1_parts = []
        for seg in self.manifest.segments:
            info = self._segments[seg.name]
            stage1_parts.append(
                self._segment_stage1(info, qids, qmat, metric, rerank_k, n_probe)
            )
        stage1 = stage1_parts[0]
        for d in stage1_parts[1:]:
            stage1 = stage1.unionByName(d)  # J6: multi-segment merge

        w = Window.partitionBy("qid").orderBy(F.desc("score_approx"), F.asc("id"))
        survivors = (
            stage1.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= rerank_k)
            .select("qid", "id")
        )

        t = self.tombstones()
        if t is not None:
            survivors = survivors.join(F.broadcast(t.select("id")), "id", "left_anti")

        joined = self.vectors().join(F.broadcast(survivors), "id")
        bq = self.spark.sparkContext.broadcast({int(qids[i]): qmat[i] for i in range(len(qids))})

        def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qmap = bq.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = kernels.as_matrix(pdf["vec"])
                scores = np.empty(len(pdf), dtype=np.float64)
                for qid, grp in pdf.groupby("qid"):
                    pos = pdf.index.get_indexer(grp.index.to_numpy())
                    scores[pos] = kernels.similarity(metric, qmap[qid][None, :], x[pos])[0]
                yield pd.DataFrame({"qid": pdf["qid"], "id": pdf["id"], "score": scores})

        reranked = joined.select("qid", "id", "vec").mapInPandas(
            rerank, schema="qid long, id long, score double"
        )
        w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
        return (
            reranked.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .orderBy("qid", "rank")
        )

    def _segment_stage1(
        self,
        info: dict,
        qids: np.ndarray,
        qmat: np.ndarray,
        metric: str,
        rerank_k: int,
        n_probe: int,
    ) -> DataFrame:
        cents: np.ndarray = info["centroids"]
        pq: ProductQuantizer = info["pq"]
        n_probe = min(n_probe, len(cents))
        # hierarchical descent analog: nearest n_probe centroids per query
        d = (
            np.einsum("ij,ij->i", qmat, qmat)[:, None]
            + np.einsum("ij,ij->i", cents, cents)[None, :]
            - 2.0 * qmat @ cents.T
        )
        probe = np.argsort(d, axis=1)[:, :n_probe]  # (m, n_probe)
        probed_parts = sorted({int(p) for p in probe.ravel()})

        codes_df = self.spark.read.parquet(os.path.join(info["dir"], "codes.parquet"))
        # Catalyst partition-prunes the scan to the probed part_ids
        codes_df = codes_df.filter(F.col("part_id").isin(probed_parts))

        luts = np.stack([pq.adc_lut(qmat[i], metric) for i in range(len(qids))])
        mag = pq.magnitude_lut() if metric == "COSINE" else None
        qnorms = np.linalg.norm(qmat, axis=1)
        part_to_queries: dict[int, list[int]] = {}
        for qi in range(len(qids)):
            for p in probe[qi]:
                part_to_queries.setdefault(int(p), []).append(qi)
        b = self.spark.sparkContext.broadcast(
            (pq.m, qids, luts, mag, qnorms, metric, rerank_k, part_to_queries)
        )

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            m, q_ids, q_luts, mag_lut, q_norms, met, keep, p2q = b.value
            cols = np.arange(m)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for part, grp in pdf.groupby("part_id"):
                    q_idx = p2q.get(int(part))
                    if not q_idx:
                        continue
                    ids = grp["id"].to_numpy(dtype=np.int64)
                    codes = np.frombuffer(b"".join(grp["codes"]), dtype=np.uint8).reshape(len(grp), m)
                    code_idx = codes.astype(np.int64)
                    if met == "COSINE":
                        mags = np.sqrt(np.maximum(mag_lut[cols, code_idx].sum(axis=1), 1e-30))
                    scores = np.empty((len(q_idx), len(grp)), dtype=np.float64)
                    for row, qi in enumerate(q_idx):
                        partial = q_luts[qi][cols, code_idx].sum(axis=1)
                        if met == "EUCLIDEAN":
                            scores[row] = 1.0 / (1.0 + partial)
                        elif met == "DOT_PRODUCT":
                            scores[row] = (1.0 + partial) / 2.0
                        else:
                            scores[row] = (1.0 + partial / (mags * max(q_norms[qi], 1e-30))) / 2.0
                    idx, vals = kernels.topk_per_row(scores, keep)
                    kk = idx.shape[1]
                    yield pd.DataFrame(
                        {
                            "qid": np.repeat(q_ids[q_idx], kk),
                            "id": ids[idx.ravel()],
                            "score_approx": vals.ravel(),
                        }
                    )

        return codes_df.select("part_id", "id", "codes").mapInPandas(
            scan, schema="qid long, id long, score_approx double"
        )

    # -------------------------------------------------------------- mutation
    def delete(self, ids: list[int]) -> None:
        """M5 phase 1: tombstone (markNodeDeleted analog). Physical removal
        happens at compaction (removeDeletedNodes analog)."""
        new = self.spark.createDataFrame([(int(i),) for i in ids], "id long")
        t = self.tombstones()
        merged = new if t is None else t.select("id").unionByName(new).distinct()
        tmp = os.path.join(self.path, "tombstones.parquet.tmp")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = os.path.join(self.path, "tombstones.parquet")
        import shutil

        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        self.manifest.save(self.path)

    def append(
        self,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        seg_name: str | None = None,
    ) -> None:
        """ST1/M1 analog: new data becomes a new immutable segment.

        ``seg_name`` makes the append idempotent for streaming replays: a
        re-delivered micro-batch overwrites its own segment dir and is not
        re-added to the manifest.
        """
        n = df.count()
        if n == 0:
            return
        seg_name = seg_name or f"seg-{self.manifest.version:06d}"
        if any(s.name == seg_name for s in self.manifest.segments):
            return  # replayed batch: segment already durable
        builder = IVFIndexBuilder(
            metric=self.manifest.metric,
            n_partitions=self.manifest.n_partitions,
            pq_m=self.manifest.pq_m,
            pq_clusters=self.manifest.pq_clusters,
        )
        self.manifest = builder._build_segment(
            df, self.path, seg_name, n, id_col, vec_col, manifest=self.manifest
        )
        self.manifest.save(self.path)
        # refresh local caches
        seg_dir = os.path.join(self.path, "segments", seg_name)
        cents = self.spark.read.parquet(os.path.join(seg_dir, "centroids.parquet")).collect()
        arr = np.zeros((len(cents), self.manifest.dim), dtype=np.float64)
        for r in cents:
            arr[r["part_id"]] = np.asarray(r["centroid"])
        self._segments[seg_name] = {
            "dir": seg_dir,
            "centroids": arr,
            "pq": ProductQuantizer.load(os.path.join(seg_dir, "pq")),
        }

    def compact(self) -> "IVFIndex":
        """U1: N:1 segment merge — union live vectors, rebuild one segment
        with retrained PQ, drop tombstones (ref OnDiskGraphIndexCompactor.
        compact + PQRetrainer balanced sampling)."""
        live = self.live_vectors().select("id", "vec")
        n = live.count()
        builder = IVFIndexBuilder(
            metric=self.manifest.metric,
            n_partitions=self.manifest.n_partitions,
            pq_m=self.manifest.pq_m,
            pq_clusters=self.manifest.pq_clusters,
        )
        seg_name = f"seg-{self.manifest.version:06d}c"
        fresh = IndexManifest(
            dim=self.manifest.dim,
            metric=self.manifest.metric,
            pq_m=self.manifest.pq_m,
            pq_clusters=self.manifest.pq_clusters,
            n_partitions=self.manifest.n_partitions,
            version=self.manifest.version,
        )
        fresh = builder._build_segment(live, self.path, seg_name, n, "id", "vec", manifest=fresh)
        # drop tombstones: physically removed now
        import shutil

        t = os.path.join(self.path, "tombstones.parquet")
        if os.path.exists(t):
            shutil.rmtree(t)
        fresh.save(self.path)
        return IVFIndex.load(self.spark, self.path)

    # ----------------------------------------------------------------- stats
    def stats(self) -> dict:
        """A10 analog: per-segment row/partition counts + avg partition size."""
        out = {"version": self.manifest.version, "segments": []}
        for seg in self.manifest.segments:
            df = self.spark.read.parquet(
                os.path.join(self._segments[seg.name]["dir"], "codes.parquet")
            )
            sizes = df.groupBy("part_id").count()
            row = sizes.agg(
                F.count("*").alias("parts"),
                F.avg("count").alias("avg_rows"),
                F.max("count").alias("max_rows"),
            ).collect()[0]
            out["segments"].append(
                {
                    "name": seg.name,
                    "n_rows": seg.n_rows,
                    "n_partitions": int(row["parts"]),
                    "avg_partition_rows": float(row["avg_rows"]),
                    "max_partition_rows": int(row["max_rows"]),
                }
            )
        return out
