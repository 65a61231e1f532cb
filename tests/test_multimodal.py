"""Multimodal plumbing tests: schema contract, Arrow batch iteration,
row explosion, determinism, and the clearly-marked decode stub."""

from __future__ import annotations

import pytest

from openmrs_patient_migration_script_spark.operators.multimodal import (
    decode_media,
    fake_decode,
    frame_sample,
    image_features,
    make_media_table,
    resize_images,
)
from openmrs_patient_migration_script_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _media(spark):
    return make_media_table(load_table(spark, SF, "documents"))


def test_media_table_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes) == {
        "media_id": "bigint",
        "content": "binary",
        "media_type": "string",
        "n_bytes": "int",
    }
    row = m.first()
    assert isinstance(bytes(row["content"]), bytes) and row["n_bytes"] > 0


def test_decode_media_is_a_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_fake_decode_deterministic_and_bounded():
    a, b = fake_decode(b"payload"), fake_decode(b"payload")
    assert a == b
    assert 16 <= a["width"] < 528 and 16 <= a["height"] < 528
    assert 0.0 <= a["mean_intensity"] < 1.0
    assert 1 <= a["n_frames"] <= 8 and 1 <= a["duration_s"] <= 300
    assert fake_decode(b"other") != a


def test_image_features_one_row_per_media(spark):
    m = _media(spark)
    feats = image_features(m)
    assert feats.count() == m.count()
    r = feats.first()
    assert r["width"] >= 16 and r["height"] >= 16


def test_frame_sample_explodes_rows(spark):
    m = _media(spark)
    frames = frame_sample(m)
    # every media row yields between 1 and 8 frames, frame 0 at ts 0.0
    per = {r["media_id"]: r["count"] for r in frames.groupBy("media_id").count().collect()}
    assert len(per) == m.count()
    assert all(1 <= n <= 8 for n in per.values())
    firsts = frames.filter("frame_index = 0").select("frame_ts_s").distinct().collect()
    assert [r["frame_ts_s"] for r in firsts] == [0.0]


def test_resize_preserves_payload_and_caps_side(spark):
    m = _media(spark)
    out = resize_images(m, max_side=64)
    assert out.count() == m.count()
    for r in out.limit(20).collect():
        assert max(r["target_width"], r["target_height"]) <= 64
        assert min(r["target_width"], r["target_height"]) >= 1
        assert bytes(r["content"])  # payload passed through
