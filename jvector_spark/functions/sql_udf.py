"""SQL-surface registration of the similarity expression library.

SURVEY §4: "an optional ``spark.udf`` registration of score functions
exposes the surface to SQL". Spark 4 SQL scalar UDFs (``CREATE FUNCTION
... RETURN <expr>``) let us do this with PURE SQL expression bodies — the
functions inline into the caller's plan and stay inside whole-stage
codegen, unlike a Python UDF registration (which would put every score on
the slow path).

After ``register_sql_functions(spark)``, plain ``spark.sql`` users get the
reference's scoring semantics (VectorSimilarityFunction.java:37-69)::

    SELECT id, jv_cosine_sim(vec, q.vec) AS score
    FROM corpus, q ORDER BY score DESC, id LIMIT 10
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
_L2SQ = (
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)

_FUNCTIONS: dict[str, str] = {
    # E1-E4 raw kernels
    "jv_dot": f"RETURNS DOUBLE RETURN {_DOT}",
    "jv_l2sq": f"RETURNS DOUBLE RETURN {_L2SQ}",
    "jv_norm": (
        "RETURNS DOUBLE RETURN sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    ),
    "jv_cosine": (
        f"RETURNS DOUBLE RETURN {_DOT} / (jv_norm(a) * jv_norm(b))"
    ),
    # E5 normalized (0,1] similarity scores — MUST match the reference
    "jv_euclidean_sim": f"RETURNS DOUBLE RETURN 1.0 / (1.0 + {_L2SQ})",
    "jv_dot_sim": f"RETURNS DOUBLE RETURN (1.0 + {_DOT}) / 2.0",
    "jv_cosine_sim": "RETURNS DOUBLE RETURN (1.0 + jv_cosine(a, b)) / 2.0",
}

_UNARY = {"jv_norm"}


def register_sql_functions(spark: SparkSession, replace: bool = True) -> list[str]:
    """Register the jv_* SQL function family on the session's catalog.

    Returns the registered names. ``replace=True`` makes re-registration
    idempotent within a session.
    """
    created = []
    for name, body in _FUNCTIONS.items():
        args = "a ARRAY<DOUBLE>" if name in _UNARY else "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
        or_replace = "OR REPLACE " if replace else ""
        spark.sql(f"CREATE {or_replace}TEMPORARY FUNCTION {name}({args}) {body}")
        created.append(name)
    return created
