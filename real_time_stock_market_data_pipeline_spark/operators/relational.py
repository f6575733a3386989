"""Relational operator building blocks (SURVEY.md §2.2–§2.7).

Everything here is pure DataFrame algebra — Catalyst handles pushdown,
pruning, join strategy, and the rank-based top-k rewrite (WindowGroupLimit).
Helpers return DataFrames/Columns so plans compose into single optimized
physical plans; nothing collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    group_cols: Sequence[str | Column],
    order_col: str | Column,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Latest row per group — Postgres ``DISTINCT ON`` (reference
    db/current_schema.sql:134-162, the realtime→historical migration, W1).

    ``row_number`` (not rank) so exactly one row per group; a deterministic
    tiebreak column keeps batch output stable.  Spark ≥3.5 rewrites the
    rank-filter into WindowGroupLimit, so this never materializes full groups.
    """
    order = [F.col(order_col).desc() if isinstance(order_col, str) else order_col.desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc() if isinstance(tiebreak, str) else tiebreak.desc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Deterministic exact dedup: keep the lowest-``tiebreak`` row per key.

    Semantics of the reference producer's duplicate-tick suppression
    (producer/producer.py:220-251, P9): one surviving row per
    (company_id, trade_datetime).  ``dropDuplicates`` picks an arbitrary
    survivor; ordering by the tiebreak makes output deterministic so the
    oracle can reproduce it.  Streaming twin: ``dropDuplicatesWithinWatermark``.
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(F.col(tiebreak).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def valid_tick_predicate(
    price: str = "current_price", volume: str = "volume"
) -> Column:
    """P7 validation filter (reference producer/producer.py:254-281,
    shared/error_handling.py:70-106): reject NULL/NaN, price ≤ 0,
    volume < 0 (volume 0 allowed).  One vectorized predicate instead of the
    reference's 90 lines of row-at-a-time checks.
    """
    p, v = F.col(price), F.col(volume)
    return (
        p.isNotNull()
        & ~F.isnan(p)
        & (p > 0)
        & (v.isNull() | (v >= 0))
    )


def split_valid_invalid(df: DataFrame, pred: Column) -> tuple[DataFrame, DataFrame]:
    """Valid rows forward, invalid rows to the error side-output
    (reference skip-and-log behavior, analytics/analytics_consumer.py:97-192).
    """
    return df.filter(pred), df.filter(~F.coalesce(pred, F.lit(False)))


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k (dashboard fetches O1–O5, dashboard/app.py:74-76).
    Spark executes this as TakeOrderedAndProject — no global sort.
    Callers must pass a total order (include a tiebreak) for determinism.
    """
    return df.orderBy(*order).limit(k)


def anti_join_new_rows(
    new: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Exists-check-then-insert as a left anti join (reference
    producer/producer.py:360-410, J7): rows of ``new`` whose key is absent
    from ``existing``.
    """
    return new.join(existing.select(*keys).distinct(), list(keys), "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_vals: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the LATEST right row with
    ``right.ts <= left.ts`` per ``on`` key (inclusive, the time-series
    point-in-time lookup Spark has no native operator for; DuckDB's native
    ``ASOF JOIN`` is the test oracle).

    Spark-first formulation — union-and-sweep, NOT a range join:
    tag right rows side=0 and left rows side=1, sort each key partition
    once by (ts, side), and sweep ``last(..., ignorenulls=True)`` over the
    unbounded-preceding frame so every left row sees the most recent right
    payload at-or-before its timestamp.  ONE shuffle + one sort total,
    linear in |L|+|R| — a range-condition join would rescan right per left
    row, and a windowed self-join per left timestamp would shuffle twice.
    Left rows with no prior right row keep NULLs (ASOF LEFT JOIN).

    All right-side values travel in ONE struct column that is NULL exactly
    on left-side rows, and a single ``last(ignorenulls=True)`` sweeps the
    struct.  This keeps DuckDB ASOF semantics when a matched right row has
    NULL payload values: the struct itself is non-NULL, so the match's
    NULL fields carry through instead of being backfilled from an older
    right row — and every carried column comes from the SAME right row.

    ``right`` should be unique per (on, ts) — pre-dedupe with
    ``dedup_keep_first`` — so ties are well-defined in both engines.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    r_fields = {f.name: f for f in right.schema.fields}
    r_struct = StructType([StructField(c, r_fields[c].dataType) for c in right_vals])
    l_side = left.select(
        F.col(on), F.col(ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in (on,)],
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r_side = right.select(
        F.col(on), F.col(ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in (on,)],
        F.struct(*[F.col(c) for c in right_vals]).alias("__r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_side.unionByName(r_side).withColumn(
        "__r_match", F.last("__r", ignorenulls=True).over(w)
    )
    return (
        swept.filter(F.col("__side") == 1)
        .select(
            F.col(on),
            *[F.col(c) for c in lcols if c not in (on,)],
            *[F.col("__r_match")[c].alias(f"{c}{suffix}") for c in right_vals],
        )
    )


def range_join_buckets(
    probe: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    start: str,
    end: str,
    bucket: str = "hour",
) -> DataFrame:
    """Range (interval-containment) join: probe rows matched to every
    interval of the same key with ``start <= ts <= end`` — Spark's planner
    turns a bare inequality join into BroadcastNestedLoopJoin/cartesian,
    which dies at scale.

    Bucket-grid formulation: each interval EXPLODES into the time buckets
    it covers; each probe row maps to its single bucket; the pair meets on
    an equi-join of (key, bucket) and the exact BETWEEN predicate filters
    inside the bucket.  Shuffle key = (key, bucket) — high-cardinality and
    time-local.  A (probe, interval) pair meets in EXACTLY one bucket (the
    probe's), so no post-join dedup is needed.  Work is linear in
    |probe| + Σ interval-spans/bucket; pick the bucket width near the
    median interval length so the explode factor stays small.
    """
    grid = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start)),
                F.date_trunc(bucket, F.col(end)),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ),
    )
    keyed = probe.withColumn("__b", F.date_trunc(bucket, F.col(ts)))
    return (
        keyed.join(grid, [on, "__b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("__b")
    )
