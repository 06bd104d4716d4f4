"""Similarity expression library vs numpy kernels (reference E1-E5).

Mirrors the reference's cross-provider agreement tests
(jvector-tests/.../vector/TestVectorizationProvider.java): the JVM column
expressions and the numpy kernels must agree to float64 precision, and the
score normalization must match VectorSimilarityFunction.java:37-69.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jvector_spark.functions import kernels, similarity as S


@pytest.fixture(scope="module")
def pair_df(spark, rng):
    a = rng.uniform(-1, 1, size=(200, 16)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(200, 16)).astype(np.float32)
    rows = [(i, a[i].tolist(), b[i].tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")
    return df, a.astype(np.float64), b.astype(np.float64)


def test_dot_matches_numpy(pair_df):
    df, a, b = pair_df
    got = np.array([r[0] for r in df.orderBy("i").select(S.dot_product("a", "b")).collect()])
    want = np.einsum("ij,ij->i", a, b)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_l2sq_matches_numpy(pair_df):
    df, a, b = pair_df
    got = np.array([r[0] for r in df.orderBy("i").select(S.l2_distance_sq("a", "b")).collect()])
    want = np.einsum("ij,ij->i", a - b, a - b)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_cosine_matches_numpy(pair_df):
    df, a, b = pair_df
    got = np.array([r[0] for r in df.orderBy("i").select(S.cosine("a", "b")).collect()])
    want = np.einsum("ij,ij->i", a, b) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("metric", list(kernels.METRICS))
def test_similarity_normalization(pair_df, metric):
    """Scores land in (0,1] with the reference formulas (E5)."""
    df, a, b = pair_df
    got = np.array(
        [r[0] for r in df.orderBy("i").select(S.similarity(metric, "a", "b")).collect()]
    )
    want = np.array([kernels.similarity(metric, a[i : i + 1], b[i : i + 1])[0, 0] for i in range(len(a))])
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # cosine/euclidean scores always in (0,1]; dot on [-1,1) data can exceed
    if metric == "EUCLIDEAN":
        assert (got > 0).all() and (got <= 1).all()


def test_l2_normalize(pair_df):
    df, a, _ = pair_df
    got = df.orderBy("i").select(S.l2_norm(S.l2_normalize("a")).alias("n")).collect()
    np.testing.assert_allclose([r["n"] for r in got], 1.0, rtol=1e-9)


def test_kernels_pairwise_shapes(rng):
    a = rng.uniform(-1, 1, size=(5, 8))
    b = rng.uniform(-1, 1, size=(7, 8))
    for metric in kernels.METRICS:
        s = kernels.similarity(metric, a, b)
        assert s.shape == (5, 7)


def test_topk_per_row_tiebreak():
    scores = np.array([[0.5, 0.9, 0.9, 0.1]])
    idx, vals = kernels.topk_per_row(scores, 3)
    # score desc, index asc on ties (ref SearchResult.java:101-106)
    assert idx.tolist() == [[1, 2, 0]]
    np.testing.assert_allclose(vals, [[0.9, 0.9, 0.5]])


def test_score_function_registry_custom_metric(random_vectors, spark):
    """X1 SPI (ref ScoreFunction.java:30-79): a user-registered metric is
    usable by name through every operator that takes metric=."""
    import numpy as np
    from pyspark.sql import functions as F

    from jvector_spark.functions import kernels
    from jvector_spark.functions.registry import ScoreFunction, register_score_function
    from jvector_spark.operators import exact

    # "manhattan similarity" 1/(1+L1) — higher is better, like the builtins
    def l1_kernel(a, b):
        return 1.0 / (1.0 + np.abs(a[:, None, :] - b[None, :, :]).sum(axis=-1))

    def l1_column(a, b):
        ac = a.cast("array<double>") if hasattr(a, "cast") else F.col(a).cast("array<double>")
        bc = b.cast("array<double>") if hasattr(b, "cast") else F.col(b).cast("array<double>")
        l1 = F.aggregate(
            F.zip_with(ac, bc, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, x: s + x
        )
        return F.lit(1.0) / (F.lit(1.0) + l1)

    register_score_function(ScoreFunction(name="L1_SIM", kernel=l1_kernel, column=l1_column))

    df, mat = random_vectors
    q = mat[3]
    got = exact.topk(df, q, 5, metric="L1_SIM").collect()
    s = kernels.similarity("L1_SIM", q[None, :].astype(np.float64), mat.astype(np.float64))[0]
    order = np.lexsort((np.arange(len(mat)), -s))[:5]
    assert [r["id"] for r in got] == order.tolist()
    # and through the numpy k-NN join path
    queries = spark.createDataFrame([(0, mat[3].tolist())], "qid long, vec array<float>")
    join_rows = exact.knn_join(df, queries, 5, metric="L1_SIM", strategy="numpy").collect()
    assert [r["id"] for r in join_rows] == order.tolist()


def test_vector_compressor_spi():
    """X5 SPI: the three codecs implement the VectorCompressor contract."""
    from jvector_spark.operators.quantize import (
        BinaryQuantizer, NVQuantizer, ProductQuantizer, VectorCompressor,
    )

    assert issubclass(ProductQuantizer, VectorCompressor)
    assert issubclass(BinaryQuantizer, VectorCompressor)
    assert issubclass(NVQuantizer, VectorCompressor)
    for cls in (ProductQuantizer, BinaryQuantizer, NVQuantizer):
        for meth in ("encode_numpy", "encode", "save", "load"):
            assert callable(getattr(cls, meth))


def test_sql_function_registration(spark, random_vectors):
    """SURVEY §4 SQL surface: jv_* SQL scalar UDFs inline into plans and
    reproduce the Column-builder scores exactly, enabling pure-SQL top-k."""
    import numpy as np

    from jvector_spark.functions import kernels
    from jvector_spark.functions.sql_udf import register_sql_functions

    names = register_sql_functions(spark)
    assert "jv_cosine_sim" in names
    df, mat = random_vectors
    df.createOrReplaceTempView("jvtest_corpus")
    q = mat[5].astype(np.float64)
    qlit = "array(" + ",".join(f"CAST({float(x)} AS DOUBLE)" for x in q) + ")"
    rows = spark.sql(
        f"""SELECT id, jv_cosine_sim(CAST(vec AS ARRAY<DOUBLE>), {qlit}) AS score
            FROM jvtest_corpus ORDER BY score DESC, id ASC LIMIT 5"""
    ).collect()
    s = kernels.similarity("COSINE", q[None, :], mat.astype(np.float64))[0]
    order = np.lexsort((np.arange(len(mat)), -s))[:5]
    assert [r["id"] for r in rows] == order.tolist()
    np.testing.assert_allclose([r["score"] for r in rows], s[order], rtol=1e-9)
