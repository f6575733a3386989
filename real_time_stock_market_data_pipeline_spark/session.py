"""SparkSession factory tuned for the test/bench harness.

Local mode is a single JVM; ``spark.driver.memory`` is the only memory knob.
The settings below are also what we would ship as cluster defaults: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to the parallelism at hand instead of the 200 default, Arrow
for every pandas boundary, and UTC timestamps so results compare cleanly
against external engines (the DuckDB oracle, Postgres in the reference).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rtsm_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.  Shuffle
    partitions default to the core count — at cluster scale this should be
    sized to total executor cores (AQE coalesces the excess anyway).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # no console progress bar: its \r-prefixed stderr lines glue onto
        # stdout when a consumer merges streams, corrupting the one-line
        # JSON contract bench.py prints (observed as BENCH parsed=None)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events.parquet stores TIMESTAMP(NANOS) which vanilla
        # Spark rejects; read as long and convert (sources.readers)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
