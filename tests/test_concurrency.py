"""ST2: concurrent reader/writer correctness via manifest snapshots.

The reference's contract (TestConcurrentReadWriteDeletes.java): readers
see a consistent index while writers mutate. Our analog is the atomic
manifest swap (types.py save: tmp + os.replace) over immutable segment
dirs — a loaded IVFIndex is a SNAPSHOT; mutations become visible only on
reload.
"""

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from jvector_spark.operators.index import IVFIndex, IVFIndexBuilder

N, DIM, K = 2000, 16, 5


@pytest.fixture(scope="module")
def setup(spark, rng, tmp_path_factory):
    mat = rng.normal(size=(N, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(N)], "id long, vec array<float>"
    ).cache()
    df.count()
    path = str(tmp_path_factory.mktemp("ivf_conc") / "index")
    idx = IVFIndexBuilder(metric="COSINE", n_partitions=8, pq_m=4).fit(
        df.filter("id < 1000"), path
    )
    return df, path, idx


def test_snapshot_isolation_across_append(spark, setup):
    """A reader loaded before an append keeps answering from its manifest
    snapshot (old segments are immutable); a fresh load sees the append."""
    df, path, _ = setup
    queries = df.limit(8).selectExpr("id as qid", "vec")
    reader = IVFIndex.load(spark, path)
    before = {(r["qid"], r["id"]) for r in reader.search(queries, K, n_probe=8).collect()}
    assert all(i < 1000 for _, i in before)

    writer = IVFIndex.load(spark, path)
    writer.append(df.filter("id >= 1000"))

    # the old snapshot still answers identically — append touched only a
    # new segment dir and the (atomically swapped) manifest
    again = {(r["qid"], r["id"]) for r in reader.search(queries, K, n_probe=8).collect()}
    assert again == before

    fresh = IVFIndex.load(spark, path)
    assert len(fresh.manifest.segments) == 2
    ids_after = {r["id"] for r in fresh.search(queries, 50, n_probe=8).collect()}
    assert any(i >= 1000 for i in ids_after)


def test_concurrent_searches_during_mutation(spark, setup):
    """Thread stress: parallel searches against a live handle while
    another handle tombstones ids — every search completes and never
    returns a row the READER's snapshot considers deleted at its own
    execution time (tombstones are shared state by design, segments are
    not)."""
    df, path, _ = setup
    queries = df.limit(8).selectExpr("id as qid", "vec")
    reader = IVFIndex.load(spark, path)
    writer = IVFIndex.load(spark, path)

    def do_search(_):
        return reader.search(queries, K, n_probe=8).collect()

    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(do_search, i) for i in range(6)]
        writer.delete(list(range(0, 20)))
        results = [f.result(timeout=300) for f in futs]
    for rows in results:
        assert len(rows) > 0  # every concurrent search completed

    # post-mutation: deletions are visible to every handle (tombstone file
    # is the shared liveness source, matching two-phase delete M5)
    after = reader.search(queries, K, n_probe=8).collect()
    assert not ({r["id"] for r in after} & set(range(20)))
