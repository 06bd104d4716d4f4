"""HDF5 + multi-file-dataset (MFD) benchmark sources (SURVEY §2.1 S3).

Reference: ``jvector-examples/.../benchmarks/datasets/DataSetLoader.java:29-49``
loads ann-benchmarks HDF5 files (datasets ``train`` / ``test`` /
``neighbors``) and ``DataSetLoaderSimpleMFD`` loads a multi-file dataset
described by a small catalog. Spark-native mapping:

- **HDF5** is a single local benchmark file, not a splittable distributed
  format — the loader reads it on the driver in bounded chunks and
  parallelizes each chunk (exactly the role the reference's loader plays:
  staging a benchmark corpus, after which everything lives in Parquet).
  ``h5py`` is preferred when installed; without it the vendored
  pure-python classic-format reader (``hdf5_lite``) handles the
  ann-benchmarks shape (contiguous uncompressed LE numeric datasets)
  directly, so the source works in this environment too.
- **MFD** is a JSON catalog naming member files (parquet / fvecs), read
  with the distributed readers and unioned — this is the scale path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_hdf5(
    spark: SparkSession,
    path: str,
    dataset: str = "train",
    id_offset: int = 0,
    vec_col: str = "vec",
) -> DataFrame:
    """Read one HDF5 dataset into (id, vec) — ann-benchmarks layout.

    Uses ``h5py`` when installed (any HDF5 file); otherwise falls back to
    the vendored pure-python classic-format reader
    (:mod:`jvector_spark.sources.hdf5_lite`), which covers exactly the
    shape ann-benchmarks files have — contiguous uncompressed LE numeric
    datasets (``DataSetLoader.java:29-49``'s inputs). Ids are the dataset
    row index plus ``id_offset``.

    Staging materializes the full dataset on the driver (HDF5 is a
    single local benchmark artifact, not a splittable distributed
    format) and hands Spark ONE ``createDataFrame`` — plan size is O(1)
    in rows, and the rows are plain Python values so both the Arrow and
    the non-Arrow ``createDataFrame`` paths accept them. For files too
    large to stage driver-side, convert once with
    ``tools/hdf5_to_parquet.py`` and read the parquet distributedly.
    """
    try:
        import h5py

        with h5py.File(path, "r") as f:
            mat = f[dataset][()]
    except ImportError:
        from jvector_spark.sources.hdf5_lite import read_hdf5_dataset

        mat = read_hdf5_dataset(path, dataset)

    if mat.ndim == 1:
        mat = mat.reshape(-1, 1)
    n = mat.shape[0]
    if n == 0:
        raise ValueError(f"empty HDF5 dataset {dataset!r} in {path}")
    # Element type follows the stored width: 8-byte ints -> bigint (an
    # int32 mapping would truncate), float64 -> double (float would lose
    # precision); 4-byte-or-narrower kinds keep the compact Spark type.
    if mat.dtype.kind in "iu":
        elem = "bigint" if mat.dtype.itemsize >= 8 else "int"
    else:
        elem = "double" if mat.dtype.itemsize >= 8 else "float"
    rows = ((id_offset + i, row) for i, row in enumerate(mat.tolist()))
    return spark.createDataFrame(rows, f"id long, {vec_col} array<{elem}>")


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
