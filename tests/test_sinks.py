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
