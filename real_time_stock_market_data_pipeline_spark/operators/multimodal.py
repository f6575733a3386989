"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs; all
per-item compute (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` so media bytes never round-trip through Python
row objects.  The container has no codec libraries, so the actual decode is
STUBBED: ``decode_image_meta`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic parse (byte-length-derived
dimensions) keeping every Spark-side contract — schema, batching,
partitioning — real and testable.

Scale notes: binary payloads dominate I/O, so (a) media tables should be
partitioned by content kind + bucketed by item id, (b) metadata-only queries
must prune the binary column (Parquet column pruning makes the scan cheap —
keep bytes and metadata in SEPARATE leaf columns, never one struct blob),
(c) decode stages size Arrow batches via ``spark.sql.execution.arrow.
maxRecordsPerBatch`` to bound executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("byte_length", T.LongType()),
        T.StructField("content_hash", T.LongType()),   # engine-neutral poly hash
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def with_media_columns(df: DataFrame, payload: str, media_type: str) -> DataFrame:
    """Attach the binary payload + metadata struct for a media table."""
    bin_col = F.col(payload).cast("binary")
    return df.withColumn("media_bytes", bin_col).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(bin_col).cast("long").alias("byte_length"),
            F.xxhash64(bin_col).alias("content_hash"),
        ),
    )


def decode_image_meta(df: DataFrame, bytes_col: str = "media_bytes", fake: bool = False) -> DataFrame:
    """Decode image headers → (width, height, channels).

    Real decode requires an image library not present in this container —
    STUB: raises unless ``fake=True``.  The fake parse derives deterministic
    dimensions from the byte length, preserving schema/batching semantics.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library (PIL/opencv) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, width int, height int, channels int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            nbytes = pdf[bytes_col].map(lambda b: len(b) if b is not None else 0)
            pdf["width"] = (nbytes % 1920 + 1).astype("int32")
            pdf["height"] = (nbytes % 1080 + 1).astype("int32")
            pdf["channels"] = 3
            yield pdf

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, every_n: int = 10, frame_idx: str = "frame_idx"
) -> DataFrame:
    """Keep every n-th frame per media item (video frame-sampling shape):
    pure filter, no shuffle."""
    return df.filter(F.pmod(F.col(frame_idx), F.lit(every_n)) == 0)


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bytes_col: str = "media_bytes",
    fake: bool = False,
) -> DataFrame:
    """Resize decoded images to (target_w, target_h).

    STUB like ``decode_image_meta``: the pixel transform needs a codec
    library — ``fake=True`` substitutes a deterministic byte-slice
    "thumbnail" (first w·h·3 payload bytes, cycled) so the Spark contract
    (bytes in → smaller bytes out + updated dims, Arrow batching, schema)
    is real and tested.  The fake output length is the real output length
    an RGB resize would produce."""
    if not fake:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/opencv) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, resized binary, resized_w int, resized_h int"
    out_len = target_w * target_h * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()

            def shrink(b: bytes | None) -> bytes:
                if not b:
                    return b""
                reps = out_len // len(b) + 1
                return (b * reps)[:out_len]

            pdf["resized"] = pdf[bytes_col].map(shrink)
            pdf["resized_w"] = target_w
            pdf["resized_h"] = target_h
            yield pdf

    return df.mapInPandas(run, schema=schema)


N_FEATURES = 16


def extract_features(
    df: DataFrame, bytes_col: str = "media_bytes", fake: bool = False
) -> DataFrame:
    """Per-item feature vector (``array<float>``) from media bytes — the
    embed-the-image stage of a multimodal pipeline.

    STUB: a real extractor is a model forward pass (no ML runtime here) —
    ``fake=True`` computes a deterministic 16-dim byte-histogram projection
    (numpy, vectorized per Arrow batch).  The output column is a regular
    embedding column: everything downstream (``cosine_topk``, ``ivf_topk``,
    ``lsh_near_dup_pairs``) composes with it unchanged."""
    if not fake:
        raise NotImplementedError(
            "feature extraction requires a model runtime not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    import numpy as np

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()

            def hist(b: bytes | None) -> list[float]:
                if not b:
                    return [0.0] * N_FEATURES
                arr = np.frombuffer(b, dtype=np.uint8)
                h = np.bincount(arr % N_FEATURES, minlength=N_FEATURES)
                return (h / max(len(arr), 1)).astype(np.float32).tolist()

            pdf["features"] = pdf[bytes_col].map(hist)
            yield pdf

    return df.mapInPandas(run, schema=schema)
