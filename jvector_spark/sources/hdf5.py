"""HDF5 + multi-file-dataset (MFD) benchmark sources (SURVEY §2.1 S3).

Reference: ``jvector-examples/.../benchmarks/datasets/DataSetLoader.java:29-49``
loads ann-benchmarks HDF5 files (datasets ``train`` / ``test`` /
``neighbors``) and ``DataSetLoaderSimpleMFD`` loads a multi-file dataset
described by a small catalog. Spark-native mapping:

- **HDF5** is a single local benchmark file, not a splittable distributed
  format — the loader reads it on the driver in bounded chunks and
  parallelizes each chunk (exactly the role the reference's loader plays:
  staging a benchmark corpus, after which everything lives in Parquet).
  Gated behind an import-try: ``h5py`` is not installed in this
  environment, so the call raises NotImplementedError with the conversion
  path; the chunking/schema plumbing is exercised through the MFD tests.
- **MFD** is a JSON catalog naming member files (parquet / fvecs), read
  with the distributed readers and unioned — this is the scale path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHUNK_ROWS = 65536


def read_hdf5(
    spark: SparkSession,
    path: str,
    dataset: str = "train",
    id_offset: int = 0,
    vec_col: str = "vec",
) -> DataFrame:
    """Read one HDF5 dataset into (id, vec) — ann-benchmarks layout.

    Requires ``h5py``. Ids are the dataset row index plus ``id_offset``.
    """
    try:
        import h5py  # noqa: F401
    except ImportError as e:  # environment ships no HDF5 libs
        raise NotImplementedError(
            "h5py is not available in this environment; convert the file to "
            "parquet or fvecs once (sources.fvecs.write_fvecs) and load that "
            "— the distributed path is identical from there"
        ) from e

    import h5py

    out: DataFrame | None = None
    with h5py.File(path, "r") as f:
        ds = f[dataset]
        n = ds.shape[0]
        for lo in range(0, n, _CHUNK_ROWS):
            chunk = ds[lo : lo + _CHUNK_ROWS]
            df = spark.createDataFrame(
                [
                    (id_offset + lo + i, [float(x) for x in row])
                    for i, row in enumerate(chunk)
                ],
                f"id long, {vec_col} array<float>",
            )
            out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError(f"empty HDF5 dataset {dataset!r} in {path}")
    return out


def read_mfd(spark: SparkSession, catalog_path: str, vec_col: str = "vec") -> DataFrame:
    """Multi-file dataset: a JSON catalog of member files, unioned.

    Catalog format (DataSetLoaderSimpleMFD analog)::

        {"name": "...", "files": [
            {"path": "part0.parquet", "format": "parquet"},
            {"path": "part1.fvecs",   "format": "fvecs", "id_offset": 100000},
            ...
        ]}

    Relative member paths resolve against the catalog's directory. Parquet
    members must have (id, vec) columns; fvecs members get ids from the
    reader plus an optional per-file ``id_offset``.
    """
    from jvector_spark.sources.fvecs import read_fvecs

    with open(catalog_path) as f:
        catalog = json.load(f)
    base = os.path.dirname(os.path.abspath(catalog_path))
    parts: list[DataFrame] = []
    for entry in catalog.get("files", []):
        p = entry["path"]
        if not os.path.isabs(p):
            p = os.path.join(base, p)
        fmt = entry.get("format", "parquet")
        if fmt == "parquet":
            df = spark.read.parquet(p).select("id", F.col(vec_col).alias(vec_col))
        elif fmt == "fvecs":
            df = read_fvecs(spark, p, vec_col=vec_col)
            off = int(entry.get("id_offset", 0))
            if off:
                df = df.select((F.col("id") + off).alias("id"), vec_col)
        elif fmt == "hdf5":
            df = read_hdf5(
                spark, p, dataset=entry.get("dataset", "train"),
                id_offset=int(entry.get("id_offset", 0)), vec_col=vec_col,
            )
        else:
            raise ValueError(f"unknown MFD member format {fmt!r}")
        parts.append(df)
    if not parts:
        raise ValueError(f"MFD catalog {catalog_path} lists no files")
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out
