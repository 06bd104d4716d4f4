"""Sources: readers that turn external vector formats into DataFrames.

SURVEY §2.1: S1 (in-memory) is `spark.createDataFrame`; S4 is a plain
Parquet scan handled by Catalyst. This package covers the formats Spark
has no native reader for — S2 fvecs/ivecs (TexMex), S3 HDF5/MFD benchmark
datasets."""

from jvector_spark.sources.fvecs import read_fvecs, read_ivecs, write_fvecs, write_ivecs
from jvector_spark.sources.hdf5 import read_hdf5, read_mfd

__all__ = ["read_fvecs", "read_ivecs", "write_fvecs", "write_ivecs", "read_hdf5", "read_mfd"]
