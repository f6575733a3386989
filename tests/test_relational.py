from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.operators.relational import (
    anti_join_new_rows,
    dedup_keep_first,
    latest_per_group,
    split_valid_invalid,
    valid_tick_predicate,
)


def _ticks(spark):
    rows = [
        # (tick_id, company_id, trade_datetime, current_price, volume)
        (1, "A", dt.datetime(2024, 1, 1, 10, 0), 10.0, 5),
        (2, "A", dt.datetime(2024, 1, 1, 10, 0), 10.0, 5),   # exact dup ts
        (3, "A", dt.datetime(2024, 1, 1, 11, 0), 11.0, 0),   # volume 0 allowed
        (4, "A", dt.datetime(2024, 1, 2, 9, 0), -1.0, 5),    # invalid price
        (5, "B", dt.datetime(2024, 1, 1, 10, 30), 20.0, -3), # invalid volume
        (6, "B", dt.datetime(2024, 1, 1, 12, 0), float("nan"), 1),  # NaN
        (7, "B", dt.datetime(2024, 1, 1, 13, 0), 21.0, None),
    ]
    return spark.createDataFrame(
        rows, "tick_id long, company_id string, trade_datetime timestamp, "
        "current_price double, volume long"
    )


def test_valid_tick_predicate(spark):
    valid, invalid = split_valid_invalid(_ticks(spark), valid_tick_predicate())
    assert sorted(r.tick_id for r in valid.collect()) == [1, 2, 3, 7]
    assert sorted(r.tick_id for r in invalid.collect()) == [4, 5, 6]


def test_dedup_keep_first(spark):
    out = dedup_keep_first(_ticks(spark), ["company_id", "trade_datetime"], "tick_id")
    assert sorted(r.tick_id for r in out.collect()) == [1, 3, 4, 5, 6, 7]


def test_latest_per_group(spark):
    t = _ticks(spark).withColumn("d", F.to_date("trade_datetime"))
    out = latest_per_group(t, ["company_id", "d"], "trade_datetime", "tick_id")
    assert sorted(r.tick_id for r in out.collect()) == [3, 4, 7]


def test_anti_join(spark):
    new = _ticks(spark)
    existing = new.filter(F.col("tick_id") <= 3).select("company_id", "trade_datetime")
    out = anti_join_new_rows(new, existing, ["company_id", "trade_datetime"])
    assert sorted(r.tick_id for r in out.collect()) == [4, 5, 6, 7]


def test_asof_join_semantics(spark):
    """Inclusive at-or-before match, NULLs before the first quote, per-key
    isolation."""
    import datetime as dt

    from real_time_stock_market_data_pipeline_spark.operators.relational import asof_join

    def ts(m):
        return dt.datetime(2024, 1, 1, 10, m)

    left = spark.createDataFrame(
        [("A", 1, ts(0)), ("A", 2, ts(5)), ("A", 3, ts(10)), ("B", 4, ts(5))],
        "k string, id long, t timestamp",
    )
    right = spark.createDataFrame(
        [("A", ts(5), 100.0), ("A", ts(9), 200.0), ("B", ts(6), 300.0)],
        "k string, t timestamp, v double",
    )
    got = {
        r.id: r.v_asof
        for r in asof_join(left, right, "k", "t", ["v"]).collect()
    }
    assert got[1] is None          # before any quote
    assert got[2] == 100.0         # inclusive: quote AT 10:05 visible
    assert got[3] == 200.0         # latest at-or-before 10:10
    assert got[4] is None          # B's only quote is later (10:06 > 10:05)


def test_asof_join_null_payload_matches_duckdb(spark):
    """A matched right row with a NULL payload value must carry that NULL
    (DuckDB ASOF semantics) — not a stale value backfilled from an older
    right row — and every carried column must come from the SAME matched
    right row.  Cross-checked against DuckDB's native ASOF LEFT JOIN."""
    import datetime as dt

    import duckdb

    from real_time_stock_market_data_pipeline_spark.operators.relational import asof_join

    def ts(m):
        return dt.datetime(2024, 1, 1, 10, m)

    left = spark.createDataFrame(
        [("A", 1, ts(0)), ("A", 2, ts(7)), ("A", 3, ts(20))],
        "k string, id long, t timestamp",
    )
    # the 10:06 quote has price NULL but size 9 — a match at 10:07/10:20
    # must carry (NULL, 9), never (100.0, 9) mixed across rows
    right = spark.createDataFrame(
        [("A", ts(5), 100.0, 7.0), ("A", ts(6), None, 9.0)],
        "k string, t timestamp, price double, size double",
    )
    got = {
        r.id: (r.price_asof, r.size_asof)
        for r in asof_join(left, right, "k", "t", ["price", "size"]).collect()
    }
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT l.id, r.price, r.size FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want
    assert got[2] == (None, 9.0)  # matched row's NULL carried, same-row size


def test_range_join_buckets_semantics(spark):
    """Bucket-grid range join ≡ the naive inequality join, including
    intervals spanning multiple buckets and boundary-inclusive matches."""
    import datetime as dt

    from real_time_stock_market_data_pipeline_spark.operators.relational import (
        range_join_buckets,
    )

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    probe = spark.createDataFrame(
        [("A", 1, ts(10, 0)), ("A", 2, ts(10, 30)), ("A", 3, ts(13, 0)),
         ("B", 4, ts(10, 30)), ("A", 5, ts(9, 59))],
        "k string, id long, t timestamp",
    )
    ivals = spark.createDataFrame(
        # 3h-wide interval spans 4 hour-buckets; starts mid-bucket
        [("A", ts(10, 0), ts(13, 0)), ("B", ts(11, 0), ts(12, 0))],
        "k string, s timestamp, e timestamp",
    )
    got = sorted(
        r.id for r in range_join_buckets(probe, ivals, "k", "t", "s", "e").collect()
    )
    assert got == [1, 2, 3]  # boundary-inclusive both ends; 4 and 5 outside
    plan = (
        range_join_buckets(probe, ivals, "k", "t", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
