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
