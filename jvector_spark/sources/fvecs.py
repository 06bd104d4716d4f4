"""TexMex fvecs/ivecs vector-file source (SURVEY §2.1 S2).

The reference reads SIFT-style benchmark files with a sequential loader
(`jvector-examples/.../util/SiftLoader.java`): each record is
``[int32 dim][dim * (float32|int32)]``, dim constant across the file.

Spark mapping: ``spark.read.format("binaryFile")`` gives one row per
file (path, length, content) — files parallelize across the cluster, and
each file's records are decoded in ONE numpy reshape inside
``mapInPandas`` (no per-record Python loop). Row ids are the in-file
record index offset by a per-file base so ids are globally unique and
stable: files are numbered by sorted path order, each contributing
``file_index * stride`` where stride is the max records per file.

Scale note: one file = one task. TexMex corpora ship as many shards
(or can be sharded trivially); for a single multi-GB file, pre-split or
convert to Parquet once — the format has no internal sync markers, so
byte-range splitting would require fixed-record arithmetic against a
remote seekable reader, which Parquet already does better.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _decode_records(buf: bytes, elem_dtype: np.dtype) -> np.ndarray:
    """(n_records, dim) array from a TexMex buffer; validates layout."""
    if len(buf) == 0:
        return np.empty((0, 0), dtype=elem_dtype)
    (dim,) = struct.unpack("<i", buf[:4])
    if dim <= 0:
        raise ValueError(f"corrupt TexMex file: dim={dim}")
    record_bytes = 4 + 4 * dim
    if len(buf) % record_bytes != 0:
        raise ValueError(
            f"corrupt TexMex file: {len(buf)} bytes not a multiple of record size {record_bytes}"
        )
    n = len(buf) // record_bytes
    raw = np.frombuffer(buf, dtype=np.int32).reshape(n, dim + 1)
    if not (raw[:, 0] == dim).all():
        raise ValueError("corrupt TexMex file: varying dim across records")
    return raw[:, 1:].view(elem_dtype) if elem_dtype == np.float32 else raw[:, 1:]


def _read_texmex(
    spark: SparkSession, path: str, elem_dtype: np.dtype, out_type: str, vec_col: str
) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)
    paths = sorted(r[0] for r in files.select("path").collect())
    order = {p: i for i, p in enumerate(paths)}
    sizes = {r[0]: r[1] for r in files.select("path", "length").collect()}
    # stride >= records in the largest file, so per-file id ranges can't collide
    stride = 1
    if sizes:
        # dim unknown until decode; worst case dim=1 -> 8 bytes/record
        stride = max(1, max(sizes.values()) // 8 + 1)
    b_order = spark.sparkContext.broadcast((order, stride))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        file_order, id_stride = b_order.value
        for pdf in batches:
            for _, row in pdf.iterrows():
                mat = _decode_records(bytes(row["content"]), elem_dtype)
                if mat.shape[0] == 0:
                    continue
                base = file_order[row["path"]] * id_stride
                yield pd.DataFrame(
                    {
                        "id": np.arange(base, base + mat.shape[0], dtype=np.int64),
                        vec_col: list(mat),
                    }
                )

    return files.select("path", "content").mapInPandas(
        decode, schema=f"id long, {vec_col} array<{out_type}>"
    )


def read_fvecs(spark: SparkSession, path: str, vec_col: str = "vec") -> DataFrame:
    """fvecs (float32 vectors) -> DataFrame(id long, vec array<float>)."""
    return _read_texmex(spark, path, np.dtype(np.float32), "float", vec_col)


def read_ivecs(spark: SparkSession, path: str, vec_col: str = "neighbors") -> DataFrame:
    """ivecs (int32 vectors, e.g. ground-truth neighbor ids) ->
    DataFrame(id long, neighbors array<int>)."""
    return _read_texmex(spark, path, np.dtype(np.int32), "int", vec_col)


def write_fvecs(mat: np.ndarray, path: str) -> None:
    """Driver-side fvecs writer (test fixtures / interop export)."""
    _write_texmex(np.asarray(mat, dtype=np.float32), path)


def write_ivecs(mat: np.ndarray, path: str) -> None:
    _write_texmex(np.asarray(mat, dtype=np.int32), path)


def _write_texmex(mat: np.ndarray, path: str) -> None:
    n, dim = mat.shape
    out = np.empty((n, dim + 1), dtype=np.int32)
    out[:, 0] = dim
    out[:, 1:] = mat.view(np.int32) if mat.dtype == np.float32 else mat
    with open(path, "wb") as f:
        f.write(out.tobytes())
