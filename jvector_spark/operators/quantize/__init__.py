"""Lossy vector compression codecs: PQ, BQ, NVQ.

Reference: ``quantization/`` package of datastax/jvector (SURVEY.md §2.5).
Each codec implements the same surface the reference's ``VectorCompressor``
SPI declares (``quantization/VectorCompressor.java``): train on a sampled
corpus, bulk-encode a DataFrame, score compressed vectors against a query
(the "approximate" first pass of two-phase search), decode for diagnostics,
and round-trip to disk.
"""

from jvector_spark.operators.quantize.base import VectorCompressor  # noqa: F401
from jvector_spark.operators.quantize.pq import ProductQuantizer  # noqa: F401
from jvector_spark.operators.quantize.bq import BinaryQuantizer  # noqa: F401
from jvector_spark.operators.quantize.nvq import NVQuantizer  # noqa: F401
