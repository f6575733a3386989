"""Maintenance jobs (reference R5 + T7).

R5 — ``daily_analytics_summary`` is a Postgres materialized view with a
manual refresh function (db/enhanced_schema.sql:297-325).  OSS Spark has no
auto matview; the idiomatic equivalent is a recompute-and-overwrite batch
job producing a partitioned parquet table (or an incrementally-maintained
streaming aggregation — the tumbling-window variant in T5).  Overwrite is
dynamic-partition so a refresh only rewrites touched days.

T7 — realtime→historical migration (db/current_schema.sql:165-200): the
latest tick per (company, day) upserted into the SCD-flagged historical
table.  Without a transactional table format, MERGE is emulated with the
standard anti-join + union overwrite; on Delta/Iceberg this becomes a real
MERGE INTO (noted in README).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalars import dsum, r6
from .operators.relational import latest_per_group


def daily_summary(ticks: DataFrame) -> DataFrame:
    """A4 aggregation shaped like the reference matview: one shuffle with
    map-side partial aggregation."""
    return (
        ticks.groupBy(
            "company_id", F.to_date("trade_datetime").alias("trade_date")
        )
        .agg(
            r6(dsum(F.col("current_price")) / F.count("current_price")).alias("avg_price"),
            F.max("current_price").alias("max_price"),
            F.min("current_price").alias("min_price"),
            F.sum("volume").alias("total_volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def refresh_daily_summary(spark: SparkSession, ticks: DataFrame, path: str) -> None:
    """R5 refresh: recompute + dynamic-partition overwrite by trade_date."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    daily_summary(ticks).write.mode("overwrite").partitionBy("trade_date").parquet(path)


def migrate_realtime_to_historical(
    ticks: DataFrame, historical: DataFrame | None
) -> DataFrame:
    """T7: latest tick per (company_id, day) → historical rows; existing
    (company, day) keys win (the reference inserts only when absent,
    producer.py:368-380).  Returns the merged historical table."""
    latest = latest_per_group(
        ticks.withColumn("trade_date", F.to_date("trade_datetime")),
        ["company_id", "trade_date"],
        "trade_datetime",
        "tick_id",
    ).select(
        "company_id",
        "trade_date",
        F.col("current_price").alias("close_price"),
        "volume",
        F.lit(True).alias("is_current"),
    )
    if historical is None:
        return latest
    new_rows = latest.join(
        historical.select("company_id", "trade_date"), ["company_id", "trade_date"], "left_anti"
    )
    return historical.unionByName(new_rows)
