"""Scalar vector functions: JVM column expressions + numpy kernels.

- :mod:`jvector_spark.functions.similarity` — Column-expression builders
  (JVM-side, whole-stage-codegen'd, oracle-exact double math).
- :mod:`jvector_spark.functions.kernels` — numpy kernels backing the
  Arrow-batched fast paths (ADC scoring, partial top-k, quantizer training).
"""

from jvector_spark.functions import kernels, similarity  # noqa: F401
