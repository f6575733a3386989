"""Multimodal column plumbing: binary payloads + typed metadata + Arrow
mapInPandas decode path (operators/multimodal).  Real codecs are absent in
this container, so decode runs the documented deterministic stub; every
Spark-side contract (schema, batching, pruning) is exercised for real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    sample_frames,
    with_media_columns,
)
from real_time_stock_market_data_pipeline_spark.sources.readers import load_table


@pytest.fixture()
def media(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .filter(F.col("text").isNotNull())
        .limit(50)
    )
    return with_media_columns(docs, payload="text", media_type="image")


def test_media_columns_schema_and_metadata(media):
    row = media.select("media_bytes", "media_meta").first()
    assert isinstance(row.media_bytes, (bytes, bytearray))
    assert row.media_meta.media_type == "image"
    assert row.media_meta.byte_length == len(row.media_bytes)
    assert row.media_meta.content_hash is not None


def test_decode_requires_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        decode_image_meta(media, fake=False).first()


def test_decode_stub_is_deterministic_and_batched(media):
    got = decode_image_meta(media, fake=True).select(
        "doc_id", "width", "height", "channels", "media_meta.byte_length"
    )
    rows = {r.doc_id: r for r in got.collect()}
    assert len(rows) == media.count()
    for r in rows.values():
        assert r.width == r.byte_length % 1920 + 1
        assert r.height == r.byte_length % 1080 + 1
        assert r.channels == 3


def test_metadata_only_query_prunes_binary(media):
    """A metadata rollup must not carry media_bytes past the scan-side
    projection (the 100 TB requirement: bytes and metadata are separate
    leaf columns)."""
    agg = media.groupBy("source").agg(
        F.sum("media_meta.byte_length").alias("total_bytes")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # the aggregate's exchange must not ship the binary column
    exchange_part = plan[plan.find("Exchange"):]
    assert "media_bytes" not in exchange_part


def test_sample_frames_pure_filter(spark):
    frames = spark.range(100).select(
        F.lit(1).alias("video_id"), F.col("id").alias("frame_idx")
    )
    kept = sample_frames(frames, every_n=10)
    assert kept.count() == 10
    assert kept.agg(F.max("frame_idx")).first()[0] == 90
    assert "Exchange" not in kept._jdf.queryExecution().executedPlan().toString()


def test_resize_stub_contract(media):
    from real_time_stock_market_data_pipeline_spark.operators.multimodal import resize_image

    out = resize_image(media, 8, 6, fake=True)
    rows = out.select("doc_id", "resized", "resized_w", "resized_h").collect()
    assert rows
    for r in rows:
        assert len(r.resized) == 8 * 6 * 3
        assert (r.resized_w, r.resized_h) == (8, 6)


def test_resize_raises_without_codec(media):
    import pytest as _pytest

    from real_time_stock_market_data_pipeline_spark.operators.multimodal import resize_image

    with _pytest.raises(NotImplementedError):
        resize_image(media, 8, 6)


def test_feature_extract_composes_with_similarity(media, spark):
    """The fake feature vectors are a REAL embedding column: brute-force
    cosine top-k over them runs unchanged."""
    from real_time_stock_market_data_pipeline_spark.operators.multimodal import (
        N_FEATURES,
        extract_features,
    )
    from real_time_stock_market_data_pipeline_spark.operators.similarity import cosine_topk

    feats = extract_features(media, fake=True).select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    first = feats.limit(1).collect()[0]
    assert len(first.embedding) == N_FEATURES
    q = feats.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    top = cosine_topk(q, feats, k=3)
    got = top.groupBy("query_id").count().collect()
    assert got and all(r["count"] == 3 for r in got)
    # deterministic: same bytes -> same features
    again = extract_features(media, fake=True).select("doc_id", "features").collect()
    feat_map = {r.doc_id: r.features for r in again}
    assert feat_map[first.vec_id] == list(first.embedding)
