"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary content columns.

Convention (the part that matters at 100 TB): media lives as an opaque
``binary`` column plus a typed metadata struct; all decode/feature work
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row objects, and the physical layout (parquet binary + column
pruning) lets scans skip content when only metadata is needed.

    MEDIA_SCHEMA: id long, modality string, content binary,
                  meta struct<width int, height int, channels int,
                              sample_rate int, n_frames int, fmt string>

The actual codec step is STUBBED: image/audio/video libraries are not
available in this environment. Two backends:

- ``fake``: deterministic feature synthesis from md5 of the content bytes
  (stable across runs/engines — the DuckDB oracle can replicate it), with
  the real batch plumbing: Arrow batches in, fixed-dim float lists out.
- ``pillow`` / ``ffmpeg``: raise NotImplementedError with a clear message;
  the surrounding plumbing (schema, batching, partitioning) is identical,
  so swapping in a real decoder touches only ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META = (
    "meta struct<width:int, height:int, channels:int, sample_rate:int, n_frames:int, fmt:string>"
)
MEDIA_SCHEMA = f"id long, modality string, content binary, {MEDIA_META.replace('meta ', 'meta ')}"

_SCALE = float(2**60)  # h64 range -> [0, 1)


def _fake_hash_features(content: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: dim values in [0,1) from md5 of the
    bytes + a per-dimension salt. Bit-replicable in DuckDB SQL:
    ('0x' || substr(md5(content || ':i'), 1, 15))::BIGINT / 2^60."""
    out = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        h = hashlib.md5(content + f":{i}".encode()).hexdigest()
        out[i] = int(h[:15], 16) / _SCALE
    return out


def _decode_one(content: bytes, modality: str, backend: str, dim: int) -> np.ndarray:
    if backend == "fake":
        return _fake_hash_features(content, dim)
    raise NotImplementedError(
        f"backend {backend!r} requires a media codec library which is not "
        f"available in this environment; use backend='fake' for plumbing "
        f"tests or install the codec and extend _decode_one"
    )


def extract_features(
    df: DataFrame,
    dim: int = 8,
    backend: str = "fake",
    id_col: str = "id",
    content_col: str = "content",
    modality_col: str = "modality",
) -> DataFrame:
    """Decode + feature-extract: (id, feature array<double>) per media row.

    Map-only mapInPandas: one Arrow batch in, one out; no shuffle. The
    output feature column feeds directly into the vector-search operators
    (exact top-k, IVF index build) — that is the multimodal-to-embedding
    bridge a training pipeline needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                _decode_one(
                    bytes(c) if c is not None else b"", m, backend, dim
                ).tolist()
                for c, m in zip(pdf[content_col], pdf[modality_col])
            ]
            yield pd.DataFrame({"id": pdf[id_col], "feature": feats})

    return df.select(id_col, content_col, modality_col).mapInPandas(
        run, schema="id long, feature array<double>"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    backend: str = "fake",
    content_col: str = "content",
) -> DataFrame:
    """Resize stub: passes content through (fake backend), rewrites the
    metadata struct JVM-side. Real backends would transform bytes inside
    the same mapInPandas slot."""
    if backend != "fake":
        _decode_one(b"", "image", backend, 1)  # raises NotImplementedError
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.fmt").alias("fmt"),
        ),
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling for video rows: explode each video into one row per
    kept frame index (0, n, 2n, ...) based on meta.n_frames.

    The frame index computation and explosion are JVM-side; only a real
    decoder (not available here) would slice actual frame bytes, so the
    content column carries through opaque — exactly what a downstream
    batched decode stage would consume.
    """
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        df.filter(F.col("modality") == "video")
        .select(
            F.col(id_col),
            F.explode(frames).alias("frame_idx"),
            F.col(content_col),
            F.col("meta"),
        )
    )


def audio_chunks(
    df: DataFrame,
    chunk_seconds: float = 30.0,
    samples_per_chunk: int | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Audio chunking: one row per fixed-duration chunk, computed from
    meta.sample_rate and the content byte length (2 bytes/sample mono).
    JVM-side arithmetic + explode; decode stays downstream."""
    n_samples = (F.length(F.col("content")) / F.lit(2)).cast("long")
    spc = (
        F.lit(samples_per_chunk)
        if samples_per_chunk is not None
        else (F.col("meta.sample_rate") * F.lit(chunk_seconds)).cast("long")
    )
    n_chunks = F.ceil(n_samples / spc).cast("int")
    return (
        df.filter(F.col("modality") == "audio")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_idx"),
            "content",
            "meta",
        )
        .withColumn("start_sample", F.col("chunk_idx").cast("long") * spc)
    )


def sql_fake_features(text_expr: str, dim: int) -> str:
    """DuckDB twin of _fake_hash_features over a utf8 text column."""
    elems = ", ".join(
        f"('0x' || substr(md5({text_expr} || ':{i}'), 1, 15))::BIGINT / {_SCALE}"
        for i in range(dim)
    )
    return f"[{elems}]"
