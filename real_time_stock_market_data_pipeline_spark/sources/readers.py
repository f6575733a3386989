"""Batch readers over the driver's parquet testdata (TESTDATA.md).

``ticks_from_events`` applies the FIXTURES.md §2 mapping: the ``events``
stream table plays the reference's tick stream (``stock_prices_realtime``,
reference db/current_schema.sql:23-33) with

    user_id        → company_id / ticker_symbol (entity key)
    ts             → trade_datetime
    value          → current_price
    props ->> 'k'  → volume (semi-structured JSON extraction, SURVEY §2.8)

All plans select columns explicitly so Catalyst prunes the parquet scan to
exactly the referenced columns (check ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# --- r19 optimization: session memo for parquet SCHEMA inference ------------
# Measured (OPTIMIZATION_r19.md "schema-inference jobs"): every
# ``spark.read.parquet(path)`` CONSTRUCTION submits one footer-reading
# Spark job before any action runs — ~0.1-0.5 s of fixed overhead per read
# site on this box, paid again on every re-read of the same store (the
# incremental tables are re-read per batch, and every query re-reads its
# sf_dir tables per bench pass).  The engine's stores have a FIXED schema
# for the life of their path (single-writer module contract: appends are
# schema-checked loudly, rebuild/compaction/purge swaps preserve columns
# by construction, and the sf_dir testdata tables are immutable), so the
# inferred StructType is memoized per (applicationId, absolute path) and
# later constructions pass it explicitly — ``spark.read.schema(s)`` skips
# the inference job, returning a frame with the IDENTICAL schema object
# the inference path produced (pinned by test).
#
# Safety guard: the memo entry carries a WITNESS — the (relpath, size,
# mtime_ns) set of the data files present at inference time (driver-side
# os.walk, no Spark job).  A later read validates witness ⊆ current
# files: appends keep the witness (cache hit — the hot path), while any
# REWRITE (overwrite, compaction, purge, staged swap) replaces part
# files, breaks the subset, and forces a fresh inference — so even an
# out-of-contract schema change re-infers.  Scheme-prefixed URIs skip
# the memo entirely (no local stat access), same rule as
# ``read_parquet_if_exists``'s stat check.
_STORE_SCHEMA_CACHE: dict = {}


def _is_uri(path: str) -> bool:
    import re

    return re.match(r"^[A-Za-z][A-Za-z0-9+.-]+:", path) is not None


def _schema_witness(path: str) -> frozenset | None:
    import os

    files = []
    try:
        for root, _dirs, names in os.walk(path):
            rel = os.path.relpath(root, path)
            for n in names:
                if n.startswith(("_", ".")):
                    continue  # markers/_SUCCESS churn carries no schema
                st = os.stat(os.path.join(root, n))
                files.append((os.path.join(rel, n), st.st_size, st.st_mtime_ns))
    except OSError:
        return None
    return frozenset(files) if files else None


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the schema-inference job skipped
    on re-reads of a store this application already inferred — see the
    module note above for the witness-guarded value-invisibility
    argument.  Falls back to plain inference for URIs, absent paths, or
    any witness mismatch."""
    import os

    if _is_uri(path):
        return spark.read.parquet(path)
    key = (spark.sparkContext.applicationId, os.path.abspath(path))
    hit = _STORE_SCHEMA_CACHE.get(key)
    if hit is not None:
        witness, schema = hit
        current = _schema_witness(path)
        if current is not None and witness <= current:
            return spark.read.schema(schema).parquet(path)
        _STORE_SCHEMA_CACHE.pop(key, None)
    witness = _schema_witness(path)
    df = spark.read.parquet(path)
    if witness:
        _STORE_SCHEMA_CACHE[key] = (witness, df.schema)
    return df


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet table that may not exist yet (the incremental
    tables' first batch; the upsert's first write) and return ``None``
    when it doesn't.  Local paths are stat-checked up front — the
    try/except-AnalysisException form is semantically identical but the
    JVM logs the full PATH_NOT_FOUND stack at ERROR before the Python
    side catches it, which pollutes bench/driver output with stacks for
    an expected condition.  The stat check is an optimization of the
    exception form, NOT a replacement: a path that EXISTS but is
    unreadable as parquet (a kill mid-first-write leaves a dir holding
    only ``_temporary``) must still be treated as table-absent so the
    next batch self-heals — both branches keep the catch for that rare
    case, where one logged stack is correct.  Scheme-prefixed URIs
    (``hdfs://``, ``s3a://``, and the single-slash ``file:/`` form —
    anything ``os.path`` can't see) skip the stat check."""
    import os
    import re

    from pyspark.sql.utils import AnalysisException

    # 2+ char scheme: a Windows drive path ("C:\\tables\\t") is NOT a URI
    # and must take the cheap stat-check branch, not the logged-exception
    # fallback this helper exists to avoid
    is_uri = re.match(r"^[A-Za-z][A-Za-z0-9+.-]+:", path) is not None
    if not is_uri and not os.path.exists(path):
        return None
    try:
        # schema-memoized construction (witness-guarded; see module note)
        # — the incremental stores are re-read every batch and paid one
        # footer-inference job per read
        return read_parquet_cached_schema(spark, path)
    except AnalysisException:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # sf_dir tables are immutable for a bench/driver session: the schema
    # memo removes one footer-inference job from EVERY query's table load
    df = read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as LongType; truncate to
    # microseconds exactly like DuckDB casts nanos → its native µs TIMESTAMP.
    for f in df.schema.fields:
        if name == "events" and f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ticks_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → tick-stream view (FIXTURES.md §2 row 1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("tick_id"),
        F.col("user_id").alias("company_id"),
        F.col("event_type"),
        F.col("ts").alias("trade_datetime"),
        F.col("value").alias("current_price"),
        F.get_json_object("props", "$.k").cast("long").alias("volume"),
    )
