"""Multimodal plumbing: schema, Arrow batching, deterministic fake decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.pipeline import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251]) * (100 + i * 37)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, media binary")
    return mm.attach_media_meta(df, "media", kind="image", mime="image/png").cache()


def test_meta_schema(media):
    f = dict(media.dtypes)["media_meta"]
    assert "kind" in f and "duration_ms" in f


def test_fake_features_deterministic(media):
    a = mm.extract_features(media, "id", "media").orderBy("id").collect()
    b = mm.extract_features(media, "id", "media").orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    r0 = a[0]
    assert r0["sha256"] == hashlib.sha256(bytes([0]) * 100).hexdigest()
    assert len(r0["embedding"]) == 16
    assert abs(sum(x * x for x in r0["embedding"]) - 1.0) < 1e-5  # unit norm
    assert r0["kind"] == "image"


def test_real_decoder_is_gated(media):
    with pytest.raises(Exception) as e:
        mm.extract_features(media, "id", "media", decoder="real").collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sampling(media):
    frames = mm.sample_frames(media, "id", "media", every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    doc0 = sorted(by_id[0], key=lambda r: r["frame_idx"])
    assert [r["ts_ms"] for r in doc0] == [i * 500 for i in range(len(doc0))]
    assert len({r["frame_sha256"] for r in doc0}) == len(doc0)
    assert max(len(v) for v in by_id.values()) <= 16


def test_invalid_decoder(media):
    with pytest.raises(ValueError):
        mm.extract_features(media, "id", "media", decoder="bogus")
