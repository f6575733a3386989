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
