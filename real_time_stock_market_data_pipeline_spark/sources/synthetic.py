"""Deterministic synthetic tick source for streaming tests and demos —
the engine-side stand-in for the reference's Yahoo-Finance poller (S1).

Built on the ``rate`` source: each generated row is a pure function of its
sequence number, so bounded runs are reproducible.  Cadence maps to the
reference's POLL_INTERVAL via ``rowsPerSecond``; a bounded test run uses
``trigger(availableNow=True)`` like MAX_CYCLES caps the reference (T1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SYMBOLS = [f"SYM{i:02d}" for i in range(17)]  # 17 tickers (producer.py:54)


def synthetic_tick_stream(
    spark: SparkSession,
    rows_per_second: int = 17,
    symbols: list[str] | None = None,
) -> DataFrame:
    """rate → tick rows: symbol round-robins, price is a deterministic
    bounded walk (sin-mixed hash of the sequence number)."""
    symbols = symbols or DEFAULT_SYMBOLS
    n = len(symbols)
    sym_array = F.array(*[F.lit(s) for s in symbols])
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    seq = F.col("value")
    price = (
        F.lit(100.0)
        + F.lit(10.0) * F.sin(seq.cast("double") / F.lit(7.0))
        + (F.pmod(seq * F.lit(2654435761), F.lit(1000)).cast("double") - 500.0) / F.lit(100.0)
    )
    return raw.select(
        seq.alias("tick_id"),
        F.element_at(sym_array, (F.pmod(seq, F.lit(n)) + 1).cast("int")).alias("company_id"),
        F.col("timestamp").alias("trade_datetime"),
        price.alias("current_price"),
        F.pmod(seq * F.lit(40503), F.lit(10000)).alias("volume"),
    )
