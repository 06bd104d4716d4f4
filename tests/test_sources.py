"""fvecs/ivecs source round-trip (SURVEY §2.1 S2, SiftLoader.java analog)."""

import os

import numpy as np
import pytest

from jvector_spark.sources import read_fvecs, read_ivecs, write_fvecs, write_ivecs


def test_fvecs_roundtrip(spark, tmp_path, rng):
    mat = rng.uniform(-1.0, 1.0, size=(200, 24)).astype(np.float32)
    write_fvecs(mat, str(tmp_path / "base.fvecs"))
    df = read_fvecs(spark, str(tmp_path / "base.fvecs"))
    rows = {r["id"]: np.asarray(r["vec"], dtype=np.float32) for r in df.collect()}
    assert len(rows) == 200
    for i in range(200):
        np.testing.assert_array_equal(rows[i], mat[i])


def test_ivecs_roundtrip(spark, tmp_path, rng):
    gt = rng.integers(0, 10_000, size=(50, 10)).astype(np.int32)
    write_ivecs(gt, str(tmp_path / "gt.ivecs"))
    df = read_ivecs(spark, str(tmp_path / "gt.ivecs"))
    rows = {r["id"]: np.asarray(r["neighbors"], dtype=np.int32) for r in df.collect()}
    assert len(rows) == 50
    for i in range(50):
        np.testing.assert_array_equal(rows[i], gt[i])


def test_fvecs_multifile_stable_ids(spark, tmp_path, rng):
    """Sorted-path file order + per-file stride keeps ids unique & stable."""
    a = rng.uniform(size=(10, 4)).astype(np.float32)
    b = rng.uniform(size=(7, 4)).astype(np.float32)
    write_fvecs(a, str(tmp_path / "part-000.fvecs"))
    write_fvecs(b, str(tmp_path / "part-001.fvecs"))
    df = read_fvecs(spark, str(tmp_path))
    ids = [r["id"] for r in df.collect()]
    assert len(ids) == len(set(ids)) == 17


def test_fvecs_corrupt_raises(spark, tmp_path):
    p = tmp_path / "bad.fvecs"
    p.write_bytes(b"\x04\x00\x00\x00" + b"\x00" * 10)  # truncated record
    with pytest.raises(Exception):
        read_fvecs(spark, str(p)).collect()


def test_mfd_catalog_union(spark, tmp_path, rng):
    """S3 MFD: a JSON catalog of parquet + fvecs members reads as one
    DataFrame with non-colliding ids (DataSetLoaderSimpleMFD analog)."""
    import json

    import numpy as np

    from jvector_spark.sources import read_mfd, write_fvecs

    a = rng.normal(size=(20, 8)).astype(np.float32)
    b = rng.normal(size=(10, 8)).astype(np.float32)
    pq_path = str(tmp_path / "part0.parquet")
    spark.createDataFrame(
        [(i, a[i].tolist()) for i in range(len(a))], "id long, vec array<float>"
    ).write.parquet(pq_path)
    fv_path = str(tmp_path / "part1.fvecs")
    write_fvecs(b, fv_path)
    catalog = {
        "name": "toy",
        "files": [
            {"path": "part0.parquet", "format": "parquet"},
            {"path": "part1.fvecs", "format": "fvecs", "id_offset": 1000},
        ],
    }
    cat_path = str(tmp_path / "catalog.json")
    with open(cat_path, "w") as f:
        json.dump(catalog, f)
    df = read_mfd(spark, cat_path)
    rows = df.collect()
    assert len(rows) == 30
    ids = {r["id"] for r in rows}
    assert set(range(20)) <= ids and {1000 + i for i in range(10)} <= ids


def test_hdf5_lite_roundtrip_all_dtypes(tmp_path):
    """S3 HDF5 (ref DataSetLoader.java:29-49): the vendored pure-python
    classic-format writer/reader round-trips every ann-benchmarks dtype
    bit-exactly (train/test f32, neighbors i32, distances f64, plus 1-D
    and i64)."""
    import numpy as np

    from jvector_spark.sources.hdf5_lite import (
        list_hdf5,
        read_hdf5_dataset,
        write_hdf5,
    )

    rng = np.random.default_rng(81)  # private: keep the shared stream untouched
    sets = {
        "train": rng.normal(size=(500, 24)).astype(np.float32),
        "test": rng.normal(size=(20, 24)).astype(np.float32),
        "neighbors": rng.integers(0, 500, size=(20, 10)).astype(np.int32),
        "distances": rng.random(size=(20, 10)).astype(np.float64),
        "ids": np.arange(33, dtype=np.int64),
    }
    p = str(tmp_path / "bench.hdf5")
    write_hdf5(p, sets)
    assert list_hdf5(p) == {k: v.shape for k, v in sets.items()}
    for nm, ref in sets.items():
        got = read_hdf5_dataset(p, nm)
        assert got.dtype == ref.dtype and got.shape == ref.shape
        assert np.array_equal(got, ref)


def test_hdf5_lite_unsupported_raises(tmp_path):
    """Out-of-scope files fail loudly with the conversion path named."""
    import pytest as _pytest

    from jvector_spark.sources.hdf5_lite import read_hdf5_dataset

    bad = tmp_path / "not.hdf5"
    bad.write_bytes(b"not an hdf5 file at all______")
    with _pytest.raises(ValueError, match="signature"):
        read_hdf5_dataset(str(bad), "train")
    # v2 superblock: signature + version byte 2
    v2 = tmp_path / "v2.hdf5"
    v2.write_bytes(b"\x89HDF\r\n\x1a\n\x02" + b"\x00" * 64)
    with _pytest.raises(NotImplementedError, match="superblock"):
        read_hdf5_dataset(str(v2), "train")


def test_read_hdf5_dataframe(spark, tmp_path):
    """S3 end-to-end: read_hdf5 -> (id, vec) DataFrame with row-index ids,
    float32-lossless values, and int datasets typed as int arrays."""
    import numpy as np

    from jvector_spark.sources import read_hdf5
    from jvector_spark.sources.hdf5_lite import write_hdf5

    rng = np.random.default_rng(82)  # private: keep the shared stream untouched
    train = rng.normal(size=(200, 16)).astype(np.float32)
    nbrs = rng.integers(0, 200, size=(8, 5)).astype(np.int32)
    p = str(tmp_path / "ds.hdf5")
    write_hdf5(p, {"train": train, "neighbors": nbrs})
    df = read_hdf5(spark, p, dataset="train", id_offset=100)
    rows = {r["id"]: r["vec"] for r in df.collect()}
    assert sorted(rows) == list(range(100, 300))
    got = np.array([rows[100 + i] for i in range(200)], dtype=np.float32)
    assert np.array_equal(got, train)
    ndf = read_hdf5(spark, p, dataset="neighbors")
    assert ndf.schema["vec"].dataType.simpleString() == "array<int>"
    assert ndf.count() == 8


def test_read_hdf5_wide_dtypes_and_plain_python(spark, tmp_path):
    """8-byte kinds map to lossless Spark types (i64 -> bigint, f64 ->
    double, not int/float truncation), and the rows handed to
    createDataFrame are plain Python values — the non-Arrow verifier
    (the driver-contract session) accepts them (CORRECTNESS_r08's one
    red row)."""
    import numpy as np

    from jvector_spark.sources import read_hdf5
    from jvector_spark.sources.hdf5_lite import write_hdf5

    big = np.array([[2**40 + 7, -(2**35)], [1, 2]], dtype=np.int64)
    dist = np.array([[1e-12, 2.5], [3.5, 4.5]], dtype=np.float64)
    p = str(tmp_path / "wide.hdf5")
    write_hdf5(p, {"ids64": big, "distances": dist})
    bdf = read_hdf5(spark, p, dataset="ids64")
    assert bdf.schema["vec"].dataType.simpleString() == "array<bigint>"
    got = {r["id"]: r["vec"] for r in bdf.collect()}
    assert got[0] == [2**40 + 7, -(2**35)]
    ddf = read_hdf5(spark, p, dataset="distances")
    assert ddf.schema["vec"].dataType.simpleString() == "array<double>"
    assert {r["id"]: r["vec"] for r in ddf.collect()}[0] == [1e-12, 2.5]


def test_write_hdf5_dataset_count_guard(tmp_path):
    """>8 datasets exceeds the single-SNOD layout and must fail loudly,
    not with an opaque struct.error."""
    import numpy as np
    import pytest as _pytest

    from jvector_spark.sources.hdf5_lite import write_hdf5

    sets = {f"d{i}": np.ones(3, dtype=np.float32) for i in range(9)}
    with _pytest.raises(NotImplementedError, match="8 datasets"):
        write_hdf5(str(tmp_path / "many.hdf5"), sets)


# ---------------------------------------------------------------------------
# SIFT-small golden-dataset harness (r6 verdict item 7; ref siftsmall/,
# SiftSmall.java:134-145, SiftLoader.java). The reference repo ships only
# the query fvecs + ground-truth ivecs — the base-vector file
# (siftsmall_base.fvecs) is NOT in the repo, so published recall@k cannot
# be recomputed here (the GT ids index the absent base set). What CAN be
# proven against the reference's own binary files: our TexMex decoders
# parse them byte-exactly (vs an independent numpy parse), and the real
# 128-d SIFT vectors flow through the full build/search pipeline with
# exact results.
# ---------------------------------------------------------------------------

SIFT_DIR = "/root/reference/siftsmall"


@pytest.mark.skipif(
    not os.path.exists(f"{SIFT_DIR}/siftsmall_query.fvecs"),
    reason="reference siftsmall dataset not present",
)
def test_sift_query_fvecs_golden(spark):
    """read_fvecs on the reference's real query file: 100 x 128 float32,
    byte-identical to an independent flat numpy parse."""
    df = read_fvecs(spark, f"{SIFT_DIR}/siftsmall_query.fvecs")
    rows = {r["id"]: np.asarray(r["vec"], dtype=np.float32) for r in df.collect()}
    assert len(rows) == 100
    raw = np.fromfile(f"{SIFT_DIR}/siftsmall_query.fvecs", dtype=np.int32)
    dim = int(raw[0])
    assert dim == 128
    mat = raw.reshape(100, dim + 1)[:, 1:].view(np.float32)
    for i in (0, 1, 50, 99):
        np.testing.assert_array_equal(rows[i], mat[i])


@pytest.mark.skipif(
    not os.path.exists(f"{SIFT_DIR}/siftsmall_groundtruth.ivecs"),
    reason="reference siftsmall dataset not present",
)
def test_sift_groundtruth_ivecs_golden(spark):
    """read_ivecs on the reference's real ground-truth file: 100 queries x
    100 neighbor ids, every id inside the 10k base set, byte-identical to
    an independent parse."""
    df = read_ivecs(spark, f"{SIFT_DIR}/siftsmall_groundtruth.ivecs")
    rows = {r["id"]: np.asarray(r["neighbors"], dtype=np.int32) for r in df.collect()}
    assert len(rows) == 100
    raw = np.fromfile(f"{SIFT_DIR}/siftsmall_groundtruth.ivecs", dtype=np.int32)
    k = int(raw[0])
    assert k == 100
    mat = raw.reshape(100, k + 1)[:, 1:]
    assert mat.min() >= 0 and mat.max() < 10_000  # ids index the 10k base set
    for i in (0, 13, 99):
        np.testing.assert_array_equal(rows[i], mat[i])


@pytest.mark.skipif(
    not os.path.exists(f"{SIFT_DIR}/siftsmall_query.fvecs"),
    reason="reference siftsmall dataset not present",
)
def test_sift_vectors_through_index_pipeline(spark, tmp_path):
    """Real SIFT vectors end-to-end: build an IVF index over the 100 query
    vectors (EUCLIDEAN, the SIFT metric), search exhaustively, and match
    the exact brute-force join row-for-row — golden DATA, exact contract."""
    from jvector_spark.metrics import recall_at_k
    from jvector_spark.operators import exact
    from jvector_spark.operators.index import IVFIndexBuilder

    corpus = read_fvecs(spark, f"{SIFT_DIR}/siftsmall_query.fvecs")
    queries = corpus.limit(16).selectExpr("id as qid", "vec")
    idx = IVFIndexBuilder(metric="EUCLIDEAN", pq_m=8, n_partitions=8).fit(
        corpus, str(tmp_path / "sift_idx")
    )
    got = idx.search(queries, k=5, n_probe=8, overquery=20.0)
    gt = exact.knn_join(corpus, queries, k=5, metric="EUCLIDEAN", strategy="numpy")
    assert recall_at_k(got, gt, 5) == 1.0
