"""Pluggable score-function registry (SURVEY §2.10 X1/X2).

Reference: ``graph/similarity/ScoreFunction.java:30-79`` lets callers supply
arbitrary similarity lambdas, and ``SearchScoreProvider`` pairs an
approximate function with an exact reranker. The Spark-native analog is a
named registry consulted by every operator that takes a ``metric`` string:

- ``kernel``: numpy pairwise scorer ``(m, d) x (n, d) -> (m, n)`` used on
  the Arrow-batched fast paths (exact.knn_join numpy/blocked, IVF rerank,
  LSH rerank). REQUIRED.
- ``column``: a pyspark Column builder ``(a, b) -> Column`` for JVM-side
  expression scoring (exact.topk / crossJoin plans). Optional — operators
  that need it raise if absent.
- ``sql``: DuckDB fragment builder ``(a, b) -> str`` so a user metric can
  still be oracle-tested. Optional.

The three built-in metrics are pre-registered with exactly the reference's
normalization contract (``VectorSimilarityFunction.java:37-69``); custom
metrics should likewise return scores where HIGHER is better (top-k and
threshold semantics assume it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass(frozen=True)
class ScoreFunction:
    """X1 SPI: a named scoring strategy (ref ScoreFunction.java:30-79)."""

    name: str
    kernel: Callable[[np.ndarray, np.ndarray], np.ndarray]
    column: Optional[Callable] = None
    sql: Optional[Callable[[str, str], str]] = None


_REGISTRY: dict[str, ScoreFunction] = {}


def register_score_function(spec: ScoreFunction) -> None:
    """Register (or replace a previously registered CUSTOM) scoring
    strategy under ``spec.name``. Every operator taking ``metric=``
    accepts the name afterwards: ``exact.topk(df, q, k, metric="my_metric")``.

    The three builtin names cannot be overridden — operators resolve them
    before consulting the registry, so accepting a replacement here would
    silently never execute it. Use a new name instead.
    """
    from jvector_spark.functions import kernels

    if spec.name in kernels.METRICS:
        raise ValueError(
            f"{spec.name!r} is a builtin metric and cannot be overridden; "
            f"register under a different name"
        )
    _REGISTRY[spec.name] = spec


def get_score_function(name: str) -> ScoreFunction:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown metric {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_metrics() -> tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def resolve_kernel(name: str) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Resolve a metric name to its numpy kernel ON THE DRIVER, for shipping
    into pandas-UDF closures. Registrations live in the driver process;
    executors import modules fresh and never see them — so operators must
    resolve here and let cloudpickle carry the callable to the workers
    (builtins resolve to a module-level partial, custom ones to the user's
    function)."""
    import functools

    from jvector_spark.functions import kernels

    if name in kernels.METRICS:
        return functools.partial(kernels.similarity, name)
    return get_score_function(name).kernel


def _register_builtins() -> None:
    from jvector_spark.functions import kernels, similarity

    for name in kernels.METRICS:
        # direct insert: the public register function refuses builtin names
        _REGISTRY[name] = ScoreFunction(
            name=name,
            kernel=(lambda met: lambda a, b: kernels.similarity(met, a, b))(name),
            column=(lambda met: lambda a, b: similarity.similarity(met, a, b))(name),
            sql=(lambda met: lambda a, b: similarity.sql_similarity(met, a, b))(name),
        )


_register_builtins()
