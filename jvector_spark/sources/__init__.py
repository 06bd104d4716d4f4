"""Sources: readers that turn external vector formats into DataFrames.

SURVEY §2.1: S1 (in-memory) is `spark.createDataFrame`; S3/S4 are plain
Parquet scans handled by Catalyst. This package covers the formats Spark
has no native reader for — S2 fvecs/ivecs (TexMex)."""

from jvector_spark.sources.fvecs import read_fvecs, read_ivecs, write_fvecs, write_ivecs

__all__ = ["read_fvecs", "read_ivecs", "write_fvecs", "write_ivecs"]
