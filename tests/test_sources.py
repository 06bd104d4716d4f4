"""fvecs/ivecs source round-trip (SURVEY §2.1 S2, SiftLoader.java analog)."""

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


def test_hdf5_gated_without_h5py(spark, tmp_path):
    """S3 HDF5: raises the documented NotImplementedError when h5py is
    absent (this container), instead of failing obscurely."""
    import pytest as _pytest

    from jvector_spark.sources import read_hdf5

    try:
        import h5py  # noqa: F401
        _pytest.skip("h5py present; gating path not applicable")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError, match="h5py"):
        read_hdf5(spark, str(tmp_path / "x.hdf5"))
