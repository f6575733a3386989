"""Partitioned tick store: layout + partition pruning (sources/sinks)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.sources.readers import ticks_from_events
from real_time_stock_market_data_pipeline_spark.sources.sinks import (
    read_ticks_partitioned,
    write_ticks_partitioned,
)


def test_partitioned_store_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ticks = ticks_from_events(spark, sf_dir)
    path = str(tmp_path / "store")
    write_ticks_partitioned(ticks, path, mode="overwrite")

    # hive-style date partition directories on disk
    parts = [d for d in os.listdir(path) if d.startswith("trade_date=")]
    assert len(parts) > 1

    back = read_ticks_partitioned(spark, path)
    assert back.count() == ticks.count()

    # a date predicate must prune partitions at the scan, not post-filter
    one_day = sorted(parts)[0].split("=", 1)[1]
    q = back.filter(F.col("trade_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.find("FileScan") :]
    assert "PartitionFilters" in scan
    assert "trade_date" in scan.split("PartitionFilters")[1][:200]
    expected = ticks.filter(F.to_date("trade_datetime") == one_day).count()
    assert q.count() == expected


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key join with NO shuffle Exchange —
    the co-location layout a 100 TB fact⋈fact join depends on."""
    from real_time_stock_market_data_pipeline_spark.sources.sinks import write_bucketed

    spark.sql("DROP TABLE IF EXISTS bkt_ticks")
    spark.sql("DROP TABLE IF EXISTS bkt_daily")
    ticks = ticks_from_events(spark, sf_dir)
    daily = (
        ticks.groupBy("company_id")
        .agg(F.avg("current_price").alias("avg_price"))
    )
    write_bucketed(ticks, "bkt_ticks", str(tmp_path / "bt"), "company_id", 8)
    write_bucketed(daily, "bkt_daily", str(tmp_path / "bd"), "company_id", 8)
    try:
        # hint forces SortMergeJoin (the fixture's dim side is broadcast-small;
        # at real scale both sides are facts and SMJ is the only option)
        joined = (
            spark.table("bkt_ticks")
            .hint("merge")
            .join(spark.table("bkt_daily").hint("merge"), "company_id")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket co-location
        assert joined.count() == ticks.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_ticks")
        spark.sql("DROP TABLE IF EXISTS bkt_daily")
