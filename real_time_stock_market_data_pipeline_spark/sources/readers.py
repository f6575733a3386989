"""Batch readers over the driver's parquet testdata (TESTDATA.md).

``ticks_from_events`` applies the FIXTURES.md §2 mapping: the ``events``
stream table plays the reference's tick stream (``stock_prices_realtime``,
reference db/current_schema.sql:23-33) with

    user_id        → company_id / ticker_symbol (entity key)
    ts             → trade_datetime
    value          → current_price
    props ->> 'k'  → volume (semi-structured JSON extraction, SURVEY §2.8)

All plans select columns explicitly so Catalyst prunes the parquet scan to
exactly the referenced columns (check ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet table that may not exist yet (the incremental
    tables' first batch; the upsert's first write) and return ``None``
    when it doesn't.  Local paths are stat-checked up front — the
    try/except-AnalysisException form is semantically identical but the
    JVM logs the full PATH_NOT_FOUND stack at ERROR before the Python
    side catches it, which pollutes bench/driver output with stacks for
    an expected condition.  The stat check is an optimization of the
    exception form, NOT a replacement: a path that EXISTS but is
    unreadable as parquet (a kill mid-first-write leaves a dir holding
    only ``_temporary``) must still be treated as table-absent so the
    next batch self-heals — both branches keep the catch for that rare
    case, where one logged stack is correct.  Scheme-prefixed URIs
    (``hdfs://``, ``s3a://``, and the single-slash ``file:/`` form —
    anything ``os.path`` can't see) skip the stat check."""
    import os
    import re

    from pyspark.sql.utils import AnalysisException

    # 2+ char scheme: a Windows drive path ("C:\\tables\\t") is NOT a URI
    # and must take the cheap stat-check branch, not the logged-exception
    # fallback this helper exists to avoid
    is_uri = re.match(r"^[A-Za-z][A-Za-z0-9+.-]+:", path) is not None
    if not is_uri and not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as LongType; truncate to
    # microseconds exactly like DuckDB casts nanos → its native µs TIMESTAMP.
    for f in df.schema.fields:
        if name == "events" and f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ticks_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → tick-stream view (FIXTURES.md §2 row 1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("tick_id"),
        F.col("user_id").alias("company_id"),
        F.col("event_type"),
        F.col("ts").alias("trade_datetime"),
        F.col("value").alias("current_price"),
        F.get_json_object("props", "$.k").cast("long").alias("volume"),
    )
