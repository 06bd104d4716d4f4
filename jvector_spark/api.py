"""User-facing index API (SURVEY §2.11 P1/P2).

The reference exposes its engine two ways: a library API
(`jvector-examples/.../SiftSmall.java:78-275`) and an IPC text protocol
with verbs ``CREATE / WRITE / BULKLOAD / OPTIMIZE / SEARCH / MEMORY``
(`jvector-examples/.../IPCService.java:80-87,303-308`). ``VectorIndex``
is the Spark-native equivalent of both: one object whose verbs launch
DataFrame jobs against a persisted IVF index directory.

A user of the reference maps their calls 1:1:

    ref: CREATE 64 COSINE M ef      ->  VectorIndex.create(spark, path, 64, "COSINE")
    ref: WRITE [v] ...              ->  idx.write(rows)           (buffered)
    ref: BULKLOAD file.fvecs        ->  idx.bulkload("*.fvecs" | DataFrame)
    ref: OPTIMIZE                   ->  idx.optimize()            (flush + compact)
    ref: SEARCH ef topK [q] ...     ->  idx.search_vectors([...], top_k)
    ref: MEMORY                     ->  idx.memory()
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder


class VectorIndex:
    """Verb-level facade over the IVF index lifecycle."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        index: IVFIndex | None,
        metric: str,
        dim: int,
        builder_kwargs: dict | None = None,
    ):
        self.spark = spark
        self.path = path
        self._index = index
        self.metric = metric
        self.dim = dim
        self._builder_kwargs = dict(builder_kwargs or {})
        self._write_buffer: list[tuple[int, list[float]]] = []

    # ----------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls, spark: SparkSession, path: str, dim: int, metric: str = "COSINE", **builder_kwargs
    ) -> "VectorIndex":
        """CREATE dims sim — declare an empty index; first load builds it.
        ``builder_kwargs`` (spill=, rerank=, fine_factor=, pq_m=,
        first_pass=, anisotropic_threshold=, bsp=, ...) are applied when
        the first segment is built."""
        os.makedirs(path, exist_ok=True)
        return cls(spark, path, None, metric, dim, builder_kwargs=builder_kwargs)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "VectorIndex":
        idx = IVFIndex.load(spark, path)
        return cls(spark, path, idx, idx.manifest.metric, idx.manifest.dim)

    # -------------------------------------------------------------- writes
    def write(self, rows) -> None:
        """WRITE [v]... — buffer (id, vec) rows; flushed as ONE segment at
        the next optimize()/search() (the IPC protocol also batches writes
        until OPTIMIZE). Accepts (id, vec) tuples or just vectors. Auto ids
        are assigned past the max id seen so far — across the index AND any
        explicit ids already buffered — so an explicit id can never collide
        with an auto-assigned one in the flushed segment."""
        nxt = self._next_id()
        for bid, _ in self._write_buffer:
            nxt = max(nxt, bid + 1)
        for r in rows:
            if isinstance(r, (tuple, list)) and len(r) == 2 and not isinstance(r[1], (int, float)):
                rid = int(r[0])
                self._write_buffer.append((rid, [float(x) for x in r[1]]))
                nxt = max(nxt, rid + 1)
            else:
                self._write_buffer.append((nxt, [float(x) for x in r]))
                nxt += 1

    def bulkload(self, source) -> None:
        """BULKLOAD path — build/append a segment from a DataFrame(id, vec)
        or an fvecs path/glob."""
        if isinstance(source, str):
            from jvector_spark.sources import read_fvecs

            df = read_fvecs(self.spark, source)
        else:
            df = source
        self._flush()
        if self._index is None:
            self._index = IVFIndexBuilder(metric=self.metric, **self._builder_kwargs).fit(df, self.path)
        else:
            self._index.append(df)

    def delete(self, ids: list[int]) -> None:
        self._require_index().delete(ids)

    def optimize(self) -> None:
        """OPTIMIZE — flush buffered writes, then compact all segments into
        one (retrains PQ, drops tombstones)."""
        self._flush()
        self._index = self._require_index().compact()

    # -------------------------------------------------------------- reads
    def search(
        self, queries: DataFrame, top_k: int, n_probe: int = 8, overquery: float = 4.0,
        **search_kwargs,
    ) -> DataFrame:
        """SEARCH — batch k-NN join against the index (qid, id, score, rank).
        Extra kwargs (predicate=, accept_ids=, ssp=, n_probe_fine=,
        strategy=, m_hint=) pass through to :meth:`IVFIndex.search` —
        corpus-sized query sides auto-route to the uncapped distributed
        plan."""
        self._flush()
        return self._require_index().search(
            queries, top_k, n_probe=n_probe, overquery=overquery, **search_kwargs
        )

    def search_vectors(
        self, vecs, top_k: int, n_probe: int = 8, overquery: float = 4.0, **search_kwargs
    ) -> DataFrame:
        """SEARCH with inline query vectors (the IPC call shape); extra
        kwargs pass through like :meth:`search`."""
        q = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "qid long, vec array<float>",
        )
        return self.search(q, top_k, n_probe=n_probe, overquery=overquery, **search_kwargs)

    def memory(self) -> dict:
        """MEMORY — index footprint: bytes on disk per component + stats."""
        sizes: dict[str, int] = {}
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                p = os.path.join(root, f)
                key = os.path.relpath(root, self.path).split(os.sep)[0]
                sizes[key] = sizes.get(key, 0) + os.path.getsize(p)
        out = {"bytes_by_component": sizes, "bytes_total": sum(sizes.values())}
        if self._index is not None:
            out["stats"] = self._index.stats()
        return out

    # ------------------------------------------------------------ internal
    def _next_id(self) -> int:
        if self._index is None:
            return 0
        from pyspark.sql import functions as F

        row = self._index.vectors().agg(F.max("id")).collect()[0]
        return (row[0] + 1) if row[0] is not None else 0

    def _flush(self) -> None:
        if not self._write_buffer:
            return
        df = self.spark.createDataFrame(self._write_buffer, "id long, vec array<float>")
        self._write_buffer = []
        if self._index is None:
            self._index = IVFIndexBuilder(metric=self.metric, **self._builder_kwargs).fit(df, self.path)
        else:
            self._index.append(df)

    def _require_index(self) -> IVFIndex:
        self._flush()
        if self._index is None:
            raise ValueError("index is empty: WRITE or BULKLOAD vectors first")
        return self._index
