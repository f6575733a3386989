from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.maintenance import (
    daily_summary,
    migrate_realtime_to_historical,
    refresh_daily_summary,
)
from real_time_stock_market_data_pipeline_spark.plans.queries import QUERIES
from real_time_stock_market_data_pipeline_spark.sources.readers import (
    ticks_from_events,
)


def test_daily_summary_matches_oracle_checked_plan(spark, sf_dir):
    ours = daily_summary(ticks_from_events(spark, sf_dir))
    plan = QUERIES["a4_daily_summary"](spark, sf_dir)
    a = sorted(map(tuple, ours.collect()))
    b = sorted(map(tuple, plan.collect()))
    assert a == b


def test_refresh_daily_summary_partitioned(spark, sf_dir, tmp_path):
    ticks = ticks_from_events(spark, sf_dir)
    path = str(tmp_path / "summary")
    refresh_daily_summary(spark, ticks, path)
    back = spark.read.parquet(path)
    assert back.count() == daily_summary(ticks).count()
    # partition pruning works on the layout
    one_day = back.select("trade_date").distinct().limit(1).collect()[0][0]
    assert back.filter(F.col("trade_date") == one_day).count() > 0


def test_migration_existing_days_win(spark, sf_dir):
    ticks = ticks_from_events(spark, sf_dir)
    first = migrate_realtime_to_historical(ticks, None)
    n = first.count()
    assert n == first.select("company_id", "trade_date").distinct().count()
    # pre-existing rows survive untouched; duplicate keys not re-inserted
    poisoned = first.withColumn("close_price", F.lit(-1.0))
    merged = migrate_realtime_to_historical(ticks, poisoned)
    assert merged.count() == n
    assert merged.filter("close_price <> -1.0").count() == 0
