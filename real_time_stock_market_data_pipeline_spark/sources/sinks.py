"""Persistence sinks (reference S6–S11) and the partitioned tick store.

The reference persists to PostgreSQL with per-row INSERTs and ON CONFLICT
upserts (producer/producer.py:283-308, shared/database.py:316-345).  The
engine's equivalents:

* **Partitioned parquet store** — the primary analytical sink.  Partitioned
  by trade date: the storage-layout analogue of the reference's
  ``(company_id, trade_datetime DESC)`` B-tree indexes (SURVEY §4 R1) —
  time-range queries prune whole partitions, and parquet row-group min/max
  stats give file skipping within them.  At 100 TB, date partitions keep
  files bounded and make retention a metadata operation.
* **JDBC append** — thin config over ``df.write.jdbc`` (S6–S8): Spark's
  JDBC writer batches ``batchsize`` rows per round-trip per partition,
  replacing the reference's hand-rolled ``execute_values`` batching (R8)
  and connection pool (R9).
* **Upserts (S9/S10)** — ``maintenance.merge_upsert`` is the generic
  key-based ON CONFLICT DO UPDATE (updates win, last-write-wins within a
  batch); ``maintenance.upsert_parquet`` applies it to the store with a
  staging-dir swap, rewriting ONLY the batch's touched partitions when
  ``partition_col`` is given; ``maintenance.upsert_sink`` is the
  ``foreachBatch`` streaming delivery.  Same end state as the reference's
  ON CONFLICT DO UPDATE without row-level lock contention (R10); on a
  transactional table format (Delta/Iceberg) the helper becomes a real
  MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .readers import read_parquet_cached_schema as _read_pq


def write_ticks_partitioned(
    df: DataFrame,
    path: str,
    ts: str = "trade_datetime",
    mode: str = "append",
) -> None:
    """Append tick/analytics rows to a date-partitioned parquet store."""
    (
        df.withColumn("trade_date", F.to_date(F.col(ts)))
        .write.mode(mode)
        .partitionBy("trade_date")
        .parquet(path)
    )


def read_ticks_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned store; date predicates become partition pruning
    (check PartitionFilters in the scan — tests/test_sinks.py pins this)."""
    return _read_pq(spark, path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed by ``key`` (Spark bucketing, SURVEY §4 R1's
    co-location analogue): two tables bucketed the same way join WITHOUT any
    Exchange — the join reads matching buckets side by side.  At 100 TB this
    is the difference between shuffling the fact table on every
    ticks ⋈ analytics ⋈ predictions query and shuffling it once at write
    time.  ``sortBy(key)`` additionally removes the join's Sort.
    Bucketing requires the table catalog (``saveAsTable``); the path makes
    it an external table, so the files outlive the in-memory catalog."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on ``col``: ``repartitionByRange``
    gives each output file a DISJOINT value range and an in-file sort, so
    every parquet row-group's footer min/max (its zone map) is tight.  A
    range predicate on ``col`` then skips whole row groups at the reader —
    on a time-series store this turns "scan the year" into "scan the hour"
    WITHOUT hive partitioning's directory explosion (a partition column
    must be low-cardinality; a sort column need not be).

    The two layouts compose: partition by date for pruning + retention,
    range-sort within partitions by (symbol, ts) for row-group skipping —
    that is the 100 TB tick-store layout.  Limits to be honest about:
    plain parquet skips at ROW-GROUP level only (each task still opens its
    file's footer); FILE-level skipping from a stats catalog is what
    Delta/Iceberg add.  ``repartitionByRange`` samples the column to place
    balanced split points, so files come out size-uniform even on skewed
    timestamps.  tests/test_sinks.py pins the skipping with scan metrics
    (sorted layout reads ~matching rows; shuffled layout reads the world).
    """
    parts = (
        df.repartitionByRange(n_files, F.col(col))
        if n_files
        else df.repartitionByRange(F.col(col))
    )
    parts.sortWithinPartitions(col).write.mode(mode).parquet(path)


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 1000,
    options: dict[str, str] | None = None,
) -> None:
    """S6–S8: append via Spark's JDBC writer (one connection per partition,
    ``batchsize`` rows per executeBatch — the engine-native replacement for
    the reference's pooled ``execute_values``).  Requires a JDBC driver on
    the classpath; untestable in this environment, kept as thin config."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode("append").save()


def zorder_key_col(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key interleaving ``bits`` bucket bits per
    column.  Buckets are EQUAL-DEPTH: boundaries come from one
    ``approxQuantile`` pass per write (a bounded sketch — 2^bits doubles
    to the driver), assignment is ``pyspark.ml.feature.Bucketizer`` (JVM
    binary search per row).  Equal-depth matters: real columns are skewed
    (this corpus's ``value`` has p50≈35 of max≈490), and equal-width
    buckets would pile most rows into a few codes, collapsing the curve's
    selectivity exactly where the data is dense.  Bit interleaving is
    pure JVM integer algebra, fully codegen'd."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    keyed = df
    bcols = []
    for i, c in enumerate(cols):
        keyed = keyed.withColumn(f"__zd{i}", F.col(c).cast("double"))
        splits = sorted(set(keyed.approxQuantile(f"__zd{i}", qs, 0.001)))
        buck = Bucketizer(
            splits=[float("-inf"), *splits, float("inf")],
            inputCol=f"__zd{i}",
            outputCol=f"__zb{i}",
            handleInvalid="keep",
        )
        keyed = buck.transform(keyed)
        bcols.append(f"__zb{i}")
    key = F.lit(0).cast("bigint")
    for i, b in enumerate(bcols):
        bucket = F.col(b).cast("bigint")
        for j in range(bits):
            key = key + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                j * len(cols) + i,
            )
    keyed = keyed.withColumn("__zkey", key)
    for i in range(len(cols)):
        keyed = keyed.drop(f"__zd{i}", f"__zb{i}")
    return keyed, "__zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-ORDERED parquet layout: cluster files along a Morton curve over
    several columns, so row-group zone maps stay selective for predicates
    on ANY of them — the multi-column generalization of
    ``write_range_sorted`` (which is optimal for one column and useless
    for the others).  The same operation Delta/Iceberg expose as
    OPTIMIZE ZORDER BY, here as a plain-parquet write: range-partition on
    the interleaved key, sort within partitions, drop the key.
    tests/test_sinks.py pins with scan metrics that BOTH columns' range
    predicates materialize a fraction of a shuffled layout's rows."""
    keyed, k = zorder_key_col(df, cols, bits)
    parts = (
        keyed.repartitionByRange(n_files, F.col(k))
        if n_files
        else keyed.repartitionByRange(F.col(k))
    )
    parts.sortWithinPartitions(k).drop(k).write.mode(mode).parquet(path)
