from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.maintenance import (
    daily_summary,
    merge_upsert,
    migrate_realtime_to_historical,
    refresh_daily_summary,
    upsert_parquet,
    upsert_sink,
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


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, v double")


def test_merge_upsert_semantics(spark):
    """ON CONFLICT DO UPDATE: updates win on conflict, untouched keys
    survive, new keys insert, batch-internal dups resolve last-write-wins."""
    existing = _kv(spark, [("a", 1, 10.0), ("b", 1, 20.0)]).withColumn("seq", F.lit(0))
    # key ('a',1) appears twice in the batch with seq 1 and 2: last wins
    updates = _kv(spark, [("a", 1, 11.0), ("c", 1, 30.0)]).withColumn(
        "seq", F.lit(1)
    ).unionByName(_kv(spark, [("a", 1, 12.0)]).withColumn("seq", F.lit(2)))
    out = merge_upsert(existing, updates, ["k", "ts"], order_col="seq")
    got = {(r.k, r.ts): r.v for r in out.collect()}
    assert got == {("a", 1): 12.0, ("b", 1): 20.0, ("c", 1): 30.0}
    # one row per key always
    assert out.count() == out.select("k", "ts").distinct().count()


def test_upsert_parquet_overlapping_batches(spark, tmp_path):
    """Two overlapping batches through the parquet merge sink: one row per
    key at the end; second batch's payload wins on the overlap."""
    path = str(tmp_path / "store")
    b1 = _kv(spark, [("a", 1, 1.0), ("b", 1, 2.0), ("b", 2, 3.0)])
    b2 = _kv(spark, [("b", 2, 30.0), ("c", 1, 4.0)])
    upsert_parquet(spark, b1, path, ["k", "ts"])
    upsert_parquet(spark, b2, path, ["k", "ts"])
    got = {(r.k, r.ts): r.v for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 1.0, ("b", 1): 2.0, ("b", 2): 30.0, ("c", 1): 4.0}


def test_upsert_parquet_partition_pruned(spark, tmp_path):
    """With partition_col, an upsert batch touching one partition reads and
    rewrites ONLY that partition: untouched partition files stay
    byte-identical on disk."""
    import os

    path = str(tmp_path / "pstore")
    b1 = _kv(spark, [("a", 1, 1.0), ("b", 1, 2.0), ("a", 2, 3.0), ("c", 2, 4.0)])
    upsert_parquet(spark, b1, path, ["k", "ts"], partition_col="ts")
    p1 = os.path.join(path, "ts=1")

    def files(d):
        return {
            f: open(os.path.join(d, f), "rb").read()
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    before = files(p1)
    # batch touches only ts=2
    b2 = _kv(spark, [("a", 2, 30.0), ("d", 2, 5.0)])
    upsert_parquet(spark, b2, path, ["k", "ts"], partition_col="ts")
    assert files(p1) == before  # ts=1 not rewritten
    got = {(r.k, r.ts): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        ("a", 1): 1.0, ("b", 1): 2.0,           # untouched partition
        ("a", 2): 30.0, ("c", 2): 4.0, ("d", 2): 5.0,  # merged partition
    }
    with pytest.raises(ValueError):
        upsert_parquet(spark, b2, path, ["k"], partition_col="ts")


def test_upsert_parquet_flat_store_converts_layout(spark, tmp_path):
    """A pruned upsert against a store written WITHOUT partitioning falls
    back to the full swap (converting the layout) instead of renaming
    partition dirs in next to the flat files."""
    import os

    path = str(tmp_path / "flat")
    upsert_parquet(spark, _kv(spark, [("a", 1, 1.0), ("b", 2, 2.0)]), path, ["k", "ts"])
    upsert_parquet(
        spark, _kv(spark, [("a", 1, 10.0)]), path, ["k", "ts"], partition_col="ts"
    )
    got = {(r.k, r.ts): r.v for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 10.0, ("b", 2): 2.0}
    assert any(e.startswith("ts=") for e in os.listdir(path))  # now partitioned


def test_upsert_parquet_null_partition_rejected(spark, tmp_path):
    path = str(tmp_path / "nstore")
    upsert_parquet(spark, _kv(spark, [("a", 1, 1.0)]), path, ["k", "ts"], partition_col="ts")
    bad = spark.createDataFrame([("b", None, 2.0)], "k string, ts long, v double")
    with pytest.raises(ValueError):
        upsert_parquet(spark, bad, path, ["k", "ts"], partition_col="ts")


def test_upsert_sink_foreach_batch(spark, tmp_path):
    """The foreachBatch wrapper applies the same merge per micro-batch."""
    path = str(tmp_path / "stream_store")
    sink = upsert_sink(path, ["k", "ts"])
    sink(_kv(spark, [("a", 1, 1.0), ("b", 1, 2.0)]), 0)
    sink(_kv(spark, [("a", 1, 10.0), ("c", 1, 3.0)]), 1)
    got = {(r.k, r.ts): r.v for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 10.0, ("b", 1): 2.0, ("c", 1): 3.0}


def test_upsert_sink_through_real_stream(spark, tmp_path):
    """S9 end-to-end: two overlapping micro-batches delivered by an actual
    bounded stream (file source, one file per trigger) through
    ``writeStream.foreachBatch(upsert_sink(...))`` — the store ends with one
    row per key and the later micro-batch's payload on the overlap."""
    import time

    src = tmp_path / "src"
    b1 = _kv(spark, [("a", 1, 1.0), ("b", 1, 2.0)]).withColumn("seq", F.lit(1))
    b2 = _kv(spark, [("a", 1, 10.0), ("c", 1, 3.0)]).withColumn("seq", F.lit(2))
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    time.sleep(1.1)  # file-source orders batches by modification time
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/")
    )
    store = str(tmp_path / "store")
    q = (
        stream.writeStream.foreachBatch(upsert_sink(store, ["k", "ts"], order_col="seq"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.k, r.ts): (r.v, r.seq) for r in spark.read.parquet(store).collect()}
    assert got == {("a", 1): (10.0, 2), ("b", 1): (2.0, 1), ("c", 1): (3.0, 2)}


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
