"""VectorIndex facade: the reference's IPC/library verbs end-to-end
(SURVEY §2.11 P1/P2; IPCService.java:80-87 CREATE/WRITE/BULKLOAD/
OPTIMIZE/SEARCH/MEMORY)."""

import numpy as np
import pytest

from jvector_spark.api import VectorIndex
from jvector_spark.metrics import recall_at_k
from jvector_spark.operators import exact


@pytest.fixture(scope="module")
def corpus(spark, rng):
    n, dim = 2000, 32
    mat = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(n)], "id long, vec array<float>"
    ).cache()
    return df, mat


def test_full_verb_lifecycle(spark, tmp_path, corpus):
    df, mat = corpus
    idx = VectorIndex.create(spark, str(tmp_path / "vidx"), dim=32, metric="COSINE")

    # BULKLOAD then WRITE a few more, then OPTIMIZE merges to one segment
    idx.bulkload(df.filter("id < 1900"))
    idx.write([(i, mat[i].tolist()) for i in range(1900, 2000)])
    idx.optimize()
    assert len(idx._index.manifest.segments) == 1

    # SEARCH: decent recall vs exact ground truth
    queries = spark.createDataFrame(
        [(i, mat[i * 97 % 2000].tolist()) for i in range(10)], "qid long, vec array<float>"
    )
    # uniform random vectors are IVF's worst case (no cluster structure to
    # prune by) — probe 16/~44 partitions and require sanity-level recall;
    # the quality contract on realistic data lives in test_index.py
    got = idx.search(queries, top_k=10, n_probe=16, overquery=8.0)
    gt = exact.knn_join(df, queries, 10, metric="COSINE", strategy="numpy")
    assert recall_at_k(got, gt, 10) >= 0.6

    # DELETE excludes ids from results
    victim = got.filter("qid = 0 and rank = 1").collect()[0]["id"]
    idx.delete([int(victim)])
    got2 = idx.search(queries, top_k=10)
    assert got2.filter(f"id = {victim}").count() == 0

    # MEMORY reports component sizes
    mem = idx.memory()
    assert mem["bytes_total"] > 0
    assert "segments" in mem["bytes_by_component"]


def test_write_assigns_dense_ids(spark, tmp_path, corpus):
    _df, mat = corpus
    idx = VectorIndex.create(spark, str(tmp_path / "vidx2"), dim=32)
    idx.write([mat[i].tolist() for i in range(50)])  # no explicit ids
    res = idx.search_vectors([mat[0].tolist()], top_k=3)
    rows = res.collect()
    assert rows[0]["id"] == 0 and rows[0]["score"] > 0.999


def test_open_roundtrip(spark, tmp_path, corpus):
    df, mat = corpus
    p = str(tmp_path / "vidx3")
    idx = VectorIndex.create(spark, p, dim=32)
    idx.bulkload(df.filter("id < 500"))
    idx.optimize()

    re = VectorIndex.open(spark, p)
    assert re.dim == 32 and re.metric == "COSINE"
    out = re.search_vectors([mat[7].tolist()], top_k=5)
    assert out.collect()[0]["id"] == 7
