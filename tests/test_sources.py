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
