"""Multimodal plumbing tests: Arrow-batched mapInPandas operators over
binary media columns (codecs stubbed; shapes and determinism real)."""

import pytest

from openlogreplicator_spark.functions.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synth_media(spark, n=30)
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    assert len(f1) == 30
    assert all(len(v) == 16 for v in f1.values())
    assert f1 == f2  # deterministic across runs
    norm = sum(x * x for x in f1[0]) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_resize_only_images_and_bounds(spark):
    media = synth_media(spark, n=30)
    out = resize_images(media, max_side=32).collect()
    assert len(out) == 10  # every third row is an image
    assert all(max(r["thumb_w"], r["thumb_h"]) <= 32 for r in out)
    assert all(len(r["thumb"]) >= 1 for r in out)


def test_frame_sampling_fanout(spark):
    media = synth_media(spark, n=30)
    frames = sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # video rows have duration 1000*(1 + id%7) → id%7+1 frames
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(mid % 7 + 1))


def test_real_decode_is_explicitly_stubbed(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception) as ei:
        extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or "not in this container" in str(ei.value)
