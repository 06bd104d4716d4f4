"""Multimodal plumbing tests: schema, batch shape, determinism, stubs."""

import pytest
from pyspark.sql import functions as F

from jvector_spark.pipeline import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNGfakebytes0", (64, 48, 3, None, None, "png")),
        (1, "image", b"\x89PNGfakebytes1", (128, 96, 3, None, None, "png")),
        (2, "video", b"fakevideobytes", (640, 480, 3, None, 25, "mp4")),
        (3, "audio", b"\x00" * 64000, (None, None, 1, 16000, None, "pcm16")),
        (4, "image", None, (8, 8, 1, None, None, "png")),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(media):
    out = M.extract_features(media, dim=8)
    rows = {r.id: r.feature for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0.0 <= x < 1.0 for v in rows.values() for x in v)
    assert rows[0] != rows[1]  # different bytes -> different features
    rows2 = {r.id: r.feature for r in M.extract_features(media, dim=8).collect()}
    assert rows == rows2  # deterministic

    expected = M._fake_hash_features(b"\x89PNGfakebytes0", 8).tolist()
    assert rows[0] == pytest.approx(expected)


def test_extract_features_feeds_vector_search(media, spark):
    from jvector_spark.operators import exact

    feats = M.extract_features(media, dim=8).withColumnRenamed("feature", "vec")
    q = feats.filter(F.col("id") == 0).selectExpr("0 as qid", "vec")
    res = exact.knn_join(feats, q, k=2, metric="COSINE")
    assert res.collect()[0].id == 0  # self is nearest


def test_real_backend_raises_not_implemented(media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, backend="pillow").collect()
    assert "NotImplementedError" in str(ei.value) or "backend" in str(ei.value)


def test_resize_rewrites_meta_only(media):
    out = M.resize_images(media, 32, 32)
    r = {x.id: x for x in out.collect()}
    assert r[0].meta.width == 32 and r[0].meta.height == 32
    assert r[0].meta.channels == 3 and r[0].meta.fmt == "png"
    assert bytes(r[0].content) == b"\x89PNGfakebytes0"  # content untouched


def test_sample_frames_explodes_videos_only(media):
    out = M.sample_frames(media, every_n=10).collect()
    assert {r.id for r in out} == {2}
    assert [r.frame_idx for r in out] == [0, 10, 20]  # 25 frames, every 10th


def test_audio_chunks(media):
    out = M.audio_chunks(media, chunk_seconds=1.0).collect()
    # 64000 bytes -> 32000 samples @16kHz -> 2 one-second chunks
    assert [(r.chunk_idx, r.start_sample) for r in out] == [(0, 0), (1, 16000)]
