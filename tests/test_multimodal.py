"""Multimodal column plumbing: schema, batch shape, deterministic fake
decode, frame sampling (the codec itself is stubbed — SURVEY-extras)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text {i} " * (i + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    return M.synthesize_media(docs).cache()


def test_media_schema_and_counts(media):
    assert media.count() == 30
    assert set(media.select("kind").distinct().toPandas()["kind"]) == {
        "image", "audio", "video"
    }
    row = media.filter(F.col("doc_id") == 3).collect()[0]
    assert bytes(row["payload"])[:4] == M.MAGIC
    assert row["meta"]["width"] >= 16
    assert row["meta"]["mime"].startswith("x-fake/")


def test_extract_features(media):
    feats = M.extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        h = np.array(r["features"])
        assert h.shape == (16,)
        assert abs(h.sum() - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] > 13
    # deterministic: same input → same features
    again = M.extract_features(media).collect()
    a = {r["media_id"]: list(r["features"]) for r in feats}
    b = {r["media_id"]: list(r["features"]) for r in again}
    assert a == b


def test_extract_features_strict_raises_without_decoder(media):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present — strict mode would use it")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        M.extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_sample_frames(media):
    frames = M.sample_frames(media, every_k=7).collect()
    assert frames  # every doc_id % 3 == 2 is a video
    for r in frames:
        samp = list(r["sampled"])
        assert samp == list(range(0, r["n_frames"], 7))


def test_rejects_unknown_container(spark):
    bad = spark.createDataFrame(
        [(1, 1, "image", b"JUNKJUNKJUNKJUNK", {"width": 1, "height": 1,
                                               "mime": "x"})],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        M.extract_features(bad).collect()
