"""Similarity scalar functions as JVM-side Column expressions.

These are the engine's default expression library (reference
``vector/VectorUtil.java`` / ``vector/VectorSimilarityFunction.java:37-69``
— see SURVEY.md §2.3). Built from higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) so they run inside
whole-stage codegen with no Python boundary — the hot path stays JVM-side,
and Catalyst can still push filters/projections around them.

All arithmetic is float64 (inputs cast from ``array<float>``) so results are
bit-comparable with a DuckDB double oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EUCLIDEAN = "EUCLIDEAN"
DOT_PRODUCT = "DOT_PRODUCT"
COSINE = "COSINE"
METRICS = (EUCLIDEAN, DOT_PRODUCT, COSINE)


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum a_i * b_i. Ref VectorUtil.java:45 (dotProduct)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance_sq(a: Column | str, b: Column | str) -> Column:
    """Sum (a_i - b_i)^2. Ref VectorUtil.java:84 (squareL2Distance)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm ||a||."""
    return F.sqrt(dot_product(a, a))


def l2_normalize(a: Column | str) -> Column:
    """a / ||a|| (zero vector passes through). Ref VectorUtil.java:108."""
    a = _as_double(a)
    n = l2_norm(a)
    safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(a, lambda x: x / safe)


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a|| ||b||). Ref VectorUtil.java:70."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def similarity(metric: str, a: Column | str, b: Column | str) -> Column:
    """Normalized similarity score in (0, 1].

    Must match reference ``VectorSimilarityFunction.java:37-69`` exactly:
    EUCLIDEAN 1/(1+d^2), DOT_PRODUCT (1+dot)/2, COSINE (1+cos)/2.
    """
    if metric == EUCLIDEAN:
        return F.lit(1.0) / (F.lit(1.0) + l2_distance_sq(a, b))
    if metric == DOT_PRODUCT:
        return (F.lit(1.0) + dot_product(a, b)) / F.lit(2.0)
    if metric == COSINE:
        return (F.lit(1.0) + cosine(a, b)) / F.lit(2.0)
    # X1 SPI fallback: user-registered score functions (registry.py)
    from jvector_spark.functions.registry import get_score_function

    spec = get_score_function(metric)
    if spec.column is None:
        raise ValueError(f"metric {metric!r} registered without a Column builder")
    return spec.column(a, b)


# ---------------------------------------------------------------------------
# E6 elementwise arithmetic (ref VectorUtil.java:117-165,194-205: sum, scale,
# addInPlace, subInPlace, minInPlace, max, min). Batch engines have no
# "in place"; each op returns a new array column, JVM-side via HOFs.
# ---------------------------------------------------------------------------


def vec_scale(a: Column | str, s: float) -> Column:
    """a * s elementwise. Ref VectorUtil scale."""
    return F.transform(_as_double(a), lambda x: x * F.lit(float(s)))


def vec_add(a: Column | str, b: Column | str) -> Column:
    """a + b elementwise. Ref VectorUtil addInPlace."""
    return F.zip_with(_as_double(a), _as_double(b), lambda x, y: x + y)


def vec_sub(a: Column | str, b: Column | str) -> Column:
    """a - b elementwise. Ref VectorUtil sub/subInPlace."""
    return F.zip_with(_as_double(a), _as_double(b), lambda x, y: x - y)


def vec_min(a: Column | str, b: Column | str) -> Column:
    """Elementwise minimum. Ref VectorUtil minInPlace."""
    return F.zip_with(_as_double(a), _as_double(b), lambda x, y: F.least(x, y))


def vec_max(a: Column | str, b: Column | str) -> Column:
    """Elementwise maximum. Ref VectorUtil max-style pairing."""
    return F.zip_with(_as_double(a), _as_double(b), lambda x, y: F.greatest(x, y))


def vec_sum_elems(a: Column | str) -> Column:
    """Sum of a vector's elements. Ref VectorUtil sum(v)."""
    return F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x)


def vector_literal(vec) -> Column:
    """A query vector as an array<double> literal column (constant-folded)."""
    return F.array(*[F.lit(float(x)) for x in vec])


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments — the same math as the Column builders above,
# used by __spark_entry__.oracle_sql(). Kept adjacent so the two stay in sync.
# ---------------------------------------------------------------------------

def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def sql_l2sq(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])"
        f" + list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])"
        f" - 2.0 * list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]))"
    )


def sql_similarity(metric: str, a: str, b: str) -> str:
    if metric == EUCLIDEAN:
        # expand (a-b).(a-b) termwise like the Spark zip_with fold does NOT —
        # use the exact same formula as l2_distance_sq via list_transform zip.
        pairwise = (
            f"list_sum(list_transform(range(1, len({a})+1), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
            f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
        )
        return f"1.0 / (1.0 + {pairwise})"
    if metric == DOT_PRODUCT:
        return f"(1.0 + {sql_dot(a, b)}) / 2.0"
    if metric == COSINE:
        return (
            f"(1.0 + {sql_dot(a, b)} / "
            f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)}))) / 2.0"
        )
    from jvector_spark.functions.registry import get_score_function

    spec = get_score_function(metric)
    if spec.sql is None:
        raise ValueError(f"metric {metric!r} registered without a SQL twin")
    return spec.sql(a, b)
