"""Multimodal asset plumbing: schema, metadata, Arrow-batched kernels."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.errors.exceptions.captured import PythonException

from youtube_scraper_db_spark.llm import multimodal as M


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, "payload-one"), (2, ""), (3, None)], "id long, blob string"
    )
    return M.attach_binary(df, "id", "blob", "image")


def test_attach_binary_metadata(media):
    rows = {r.asset_id: r for r in media.collect()}
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    one = rows[1]
    assert one.media_type == "image"
    assert bytes(one.content) == b"payload-one"
    assert one.byte_len == len(b"payload-one")
    assert one.sha256 == hashlib.sha256(b"payload-one").hexdigest()
    assert rows[2].byte_len == 0
    assert rows[3].content is None and rows[3].sha256 is None


def test_decode_image_features_deterministic(media):
    a = {r.asset_id: (r.width, r.height, r.mean_luma) for r in M.decode_image_features(media).collect()}
    b = {r.asset_id: (r.width, r.height, r.mean_luma) for r in M.decode_image_features(media).collect()}
    assert a == b and set(a) == {1, 2, 3}
    w, h, luma = a[1]
    assert 64 <= w <= 64 + 255 * 4 and 64 <= h <= 64 + 255 * 4
    assert 0.0 <= luma <= 1.0


def test_decode_strict_raises_without_decoder(media):
    with pytest.raises(PythonException, match="requires PIL"):
        M.decode_image_features(media, strict=True).collect()


def test_sample_frames_fanout(media):
    rows = M.sample_frames(media, every_n=5, max_frames=3).collect()
    assert len(rows) == 9  # 3 assets × 3 frames
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r.asset_id, []).append(r.frame_no)
    assert all(sorted(v) == [0, 5, 10] for v in per_asset.values())
    # frame hashes differ per frame and per asset, except the empty and
    # NULL payloads which collide by design (both hash b"")
    assert len({r.frame_sha256 for r in rows}) == 6
