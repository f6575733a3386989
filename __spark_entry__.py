"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All plans live in ``real_time_stock_market_data_pipeline_spark.plans``; this
module only adapts them to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_stock_market_data_pipeline_spark.plans import ORACLES, QUERIES, flagship

SF0001 = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Session tweaks the plans rely on (driver builds its own session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; readers handle both layouts
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Reproduces the reference's analytics pipeline as one declarative plan:
    validate ticks → per-symbol indicator windows (RSI/SMA/EMA/Bollinger/
    MACD/volatility) → broadcast-join dimensions → latest 1000 rows.
    """
    return flagship(_configure(spark), SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (key prefix =
    SURVEY operator id)."""

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for each ``queries()`` entry.  Keys absent here (none in
    this round's relational batch) get the driver's rows-only check."""
    return dict(ORACLES)
