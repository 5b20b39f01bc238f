"""Multimodal plumbing: media filtering, stub decode features,
frame sampling (real codecs are stubbed — the schemas, batching and
partitioning are what's under test)."""

import pyspark.sql.functions as F
import pytest

from frontier import synth
from frontier.spark import media, parse


@pytest.fixture(scope="module")
def resources(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir)
    res = parse.parse_pages(pages).cache()
    res.count()
    return res


def test_media_resources_filter(resources):
    m = media.media_resources(resources)
    kinds = {r.media_kind for r in m.select("media_kind")
             .distinct().collect()}
    # synth: image/png subresources + a video/mp4 third part
    assert kinds == {"image", "video"}
    assert m.where(F.col("n_bytes") <= 0).count() == 0


def test_extract_features_deterministic_shape(resources):
    m = media.media_resources(resources)
    feats = media.extract_features(m).cache()
    assert feats.count() == m.count()
    row = feats.first()
    assert len(row.feature) == 8
    assert 16 <= row.width <= 255 and 16 <= row.height <= 255
    # deterministic: same blob → same feature
    again = media.extract_features(m)
    joined = feats.alias("a").join(
        again.alias("b"), ["url", "part_index"])
    diff = joined.where(F.col("a.width") != F.col("b.width")).count()
    assert diff == 0


def test_frame_sample_explodes_video_only(resources, spark):
    # synth corpus carries video parts (doc_id%4==3) → sampled rows,
    # and ONLY from video parts
    m = media.media_resources(resources)
    feats = media.extract_features(m)
    sampled = media.frame_sample(feats, every=2)
    assert sampled.columns == ["url", "part_index", "frame_idx"]
    assert sampled.count() > 0
    n_videos = m.where(F.col("media_kind") == "video").count()
    per_part = sampled.groupBy("url", "part_index").count()
    assert per_part.count() == n_videos
    # synthetic video row exercises the explode shape
    vid = spark.createDataFrame(
        [("u", 1, "video", 100, 80, 4, [0.0] * 8)],
        "url string, part_index int, media_kind string, width int, "
        "height int, n_frames int, feature array<float>")
    got = media.frame_sample(vid, every=2).collect()
    assert [r.frame_idx for r in got] == [0, 2]
