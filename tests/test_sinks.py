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


def test_range_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path):
    """write_range_sorted gives each file a disjoint value range, so a
    range predicate's parquet footer min/max check (zone map) skips whole
    row groups: the scan MATERIALIZES only the overlapping groups, while
    the same predicate over a shuffled layout reads every row.  Results
    are identical — the layout changes IO, not semantics."""
    from real_time_stock_market_data_pipeline_spark.sources.sinks import (
        write_range_sorted,
    )

    ev = spark.read.parquet(f"{sf_dir}/../sf0.01/events.parquet")
    write_range_sorted(ev, str(tmp_path / "sorted"), "value", 8)
    ev.repartition(8).write.parquet(str(tmp_path / "shuffled"))

    def scan_rows(path):
        q = spark.read.parquet(path).filter("value >= 100 AND value < 110")
        rows = sorted(r["event_id"] for r in q.collect())
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        read = leaves.apply(0).metrics().apply("numOutputRows").value()
        return rows, read

    sorted_rows, sorted_read = scan_rows(str(tmp_path / "sorted"))
    shuffled_rows, shuffled_read = scan_rows(str(tmp_path / "shuffled"))
    assert sorted_rows == shuffled_rows and len(sorted_rows) > 0
    assert shuffled_read == ev.count()        # no skipping: reads the world
    assert sorted_read <= shuffled_read / 2   # zone maps cut materialized IO


def test_zordered_layout_skips_on_both_columns(spark, tmp_path):
    """Z-ordering clusters files along a Morton curve over (value,
    user_id): a range predicate on EITHER column materializes a fraction
    of what a shuffled layout reads — single-column sorting can only do
    this for its own column."""
    from real_time_stock_market_data_pipeline_spark.sources.sinks import (
        write_range_sorted,
        write_zordered,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    n = ev.count()
    write_zordered(ev, str(tmp_path / "z"), ["value", "user_id"], 16)
    write_range_sorted(ev, str(tmp_path / "v"), "value", 16)
    ev.repartition(16).write.parquet(str(tmp_path / "shuf"))

    def read_rows(path, pred):
        q = spark.read.parquet(path).filter(pred)
        got = q.count(), None
        q = spark.read.parquet(path).filter(pred)
        rows = len(q.collect())
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        return rows, leaves.apply(0).metrics().apply("numOutputRows").value()

    for pred in ["value >= 100 AND value < 130", "user_id >= 100 AND user_id < 160"]:
        z_rows, z_read = read_rows(str(tmp_path / "z"), pred)
        s_rows, s_read = read_rows(str(tmp_path / "shuf"), pred)
        assert z_rows == s_rows > 0
        assert s_read == n            # shuffled layout reads the world
        assert z_read <= 0.6 * n      # z-order skips on BOTH columns
    # the single-column layout skips on its own column but NOT the other
    _, v_read_own = read_rows(str(tmp_path / "v"), "value >= 100 AND value < 130")
    _, v_read_other = read_rows(str(tmp_path / "v"), "user_id >= 100 AND user_id < 160")
    assert v_read_own <= 0.3 * n
    assert v_read_other == n


def test_curriculum_shard_write_matches_manifest_and_prunes(
    spark, sf_dir, tmp_path
):
    """sp15's docstring claims the physical shard write IS the
    range-partition its rank defines — pin it: write_curriculum_shards
    materializes the doc-level frame hive-partitioned on shard_id, the
    written files re-aggregate EXACTLY to the published manifest (docs,
    tokens, ppl band, content checksum — write and manifest read the
    same CTE chain), and a one-shard read (the loader's per-phase
    access) prunes at the scan."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES
    from real_time_stock_market_data_pipeline_spark.plans.dialect import tok_hash
    from real_time_stock_market_data_pipeline_spark.plans.text_parity import (
        SP15_CKSUM_MOD,
        write_curriculum_shards,
    )

    path = str(tmp_path / "shards")
    write_curriculum_shards(spark, sf_dir, path)
    parts = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    manifest = {
        r.shard_id: r
        for r in QUERIES["sp15_curriculum_shards"](spark, sf_dir).collect()
    }
    assert len(parts) == len(manifest)
    back = spark.read.parquet(path)
    h = tok_hash("spark", "'s' || CAST(doc_id AS STRING)")
    agg = {
        r.shard_id: r
        for r in back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("ppl").alias("ppl_min"),
            F.max("ppl").alias("ppl_max"),
            F.sum(F.expr(f"({h}) % {SP15_CKSUM_MOD}"))
            .cast("bigint")
            .alias("checksum"),
        )
        .collect()
    }
    assert set(agg) == set(manifest)
    for sid, m in manifest.items():
        a = agg[sid]
        assert (a.n_docs, a.n_tokens, a.checksum) == (
            m.n_docs, m.n_tokens, m.checksum,
        ), sid
        assert a.ppl_min == m.ppl_min and a.ppl_max == m.ppl_max, sid
    # the loader's per-phase read prunes to one shard directory
    one = int(parts[0].split("=", 1)[1])
    q = back.filter(F.col("shard_id") == one)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.find("FileScan"):]
    assert "PartitionFilters" in scan
    assert "shard_id" in scan.split("PartitionFilters")[1][:200]
    assert q.count() == manifest[one].n_docs
