"""VectorCompressor SPI (SURVEY §2.10 X5).

Reference: ``quantization/VectorCompressor.java`` — the interface PQ / BQ /
NVQ implement (encode / encodeAll / write / load). The Spark-native
contract is the same surface over numpy batches and DataFrames; anything
implementing it plugs into two-phase search as the stage-1 codec and into
the index build as a stored feature.
"""

from __future__ import annotations

import abc

import numpy as np
from pyspark.sql import DataFrame


class VectorCompressor(abc.ABC):
    """A lossy vector codec: train once, bulk-encode, round-trip to disk.

    Implementations: :class:`ProductQuantizer` (codes + ADC scoring),
    :class:`BinaryQuantizer` (sign-bit words + hamming), :class:`NVQuantizer`
    (per-row non-uniform 8-bit + params). Encoded representations differ
    (bytes / packed longs / bytes+params), so ``encode_numpy`` returns a
    codec-specific value; the DataFrame ``encode`` always returns columns
    keyed by the input id column.
    """

    @abc.abstractmethod
    def encode_numpy(self, mat: np.ndarray):
        """Encode an (n, d) float matrix to the codec's representation."""

    @abc.abstractmethod
    def encode(self, df: DataFrame, vec_col: str = "vec", id_col: str = "id") -> DataFrame:
        """Bulk-encode a DataFrame (ref encodeAll) via mapInPandas."""

    @abc.abstractmethod
    def save(self, path: str) -> None:
        """Persist codec parameters (ref write)."""

    @classmethod
    @abc.abstractmethod
    def load(cls, path: str) -> "VectorCompressor":
        """Restore a codec from :meth:`save` output (ref load)."""
