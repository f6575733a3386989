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


def test_real_decode_unknown_bytes_null_dims(media):
    """The real header parser on non-image bytes (the documents fixture's
    text) yields NULL format/dims instead of fabricating values."""
    row = decode_image_meta(media, fake=False).select(
        "format", "width", "height", "channels"
    ).first()
    assert (row.format, row.width, row.height, row.channels) == (None,) * 4


def _png(w, h, color_type=2):
    return (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _bmp(w, h, bpp=24):
    return (
        b"BM" + b"\x00" * 12
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER DIB size
        + w.to_bytes(4, "little", signed=True)
        + (-h).to_bytes(4, "little", signed=True)  # top-down BMP: negative height
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little") + b"\x00" * 8
    )


def _jpeg(w, h):
    # SOI, a DHT the SOF scan must skip (marker C4), then SOF0
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    sof = (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 5
    )
    return b"\xff\xd8" + dht + sof


def _bmp_os2_core(w, h):
    # 12-byte BITMAPCOREHEADER: uint16 dims at 18/20 — must parse as None,
    # not as garbage int32 reads at the BITMAPINFOHEADER offsets
    return (
        b"BM" + b"\x00" * 12 + (12).to_bytes(4, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 8
    )


def test_real_header_decode_all_formats(spark):
    """PNG/GIF/BMP/JPEG headers parsed byte-for-byte — no codec library."""
    rows = [
        ("png", _png(640, 480, color_type=2), 640, 480, 3),
        ("png_rgba", _png(31, 17, color_type=6), 31, 17, 4),
        ("gif", _gif(320, 200), 320, 200, 3),
        ("bmp", _bmp(800, 600, bpp=24), 800, 600, 3),
        ("bmp_os2", _bmp_os2_core(100, 50), None, None, None),
        ("jpeg", _jpeg(1024, 768), 1024, 768, 3),
        ("jpeg_padded", b"\xff\xd8\xff" + _jpeg(64, 32)[2:], 64, 32, 3),
        ("garbage", b"not an image at all", None, None, None),
    ]
    df = spark.createDataFrame(
        [(n, b) for n, b, *_ in rows], "name string, media_bytes binary"
    )
    got = {r.name: r for r in decode_image_meta(df, fake=False).collect()}
    for name, _b, w, h, c in rows:
        assert (got[name].width, got[name].height, got[name].channels) == (w, h, c), name
    assert got["png"].format == "png" and got["jpeg"].format == "jpeg"
    assert got["gif"].format == "gif" and got["bmp"].format == "bmp"
    assert got["garbage"].format is None


def test_truncated_jpeg_fill_bytes_return_none():
    """Fill bytes (0xFF runs) right before a SOF marker at the end of a
    truncated buffer must not walk past the bound re-check: the documented
    contract is (None, None, None, None), never IndexError."""
    from real_time_stock_market_data_pipeline_spark.operators.multimodal import parse_image_header

    truncated = b"\xff\xd8\xff\xff\xc0\x00\x11\x08\x00\x10\x00\x10"
    assert parse_image_header(truncated) == (None, None, None, None)
    # every prefix of a valid padded JPEG parses or returns Nones — no crash
    full = b"\xff\xd8\xff" + _jpeg(64, 32)[2:]
    for cut in range(len(full)):
        got = parse_image_header(full[:cut])
        assert got == (None, None, None, None) or got == ("jpeg", 64, 32, 3)


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
