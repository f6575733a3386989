"""Skew-mitigation operators (SURVEY §4 physical-execution knobs).

At 100 TB a handful of hot keys (one ticker with 100× the ticks, one
stop-shingle, one mega-customer) can pin a single reducer while 999
executors idle.  Two standing mitigations:

* **AQE skew-join splitting** — enabled session-wide
  (``spark.sql.adaptive.skewJoin.enabled``, session.py); handles skewed
  JOIN sides automatically by splitting oversized partitions.
* **Salted two-phase aggregation** (this module) — for skewed GROUP BY
  keys.  Spark's hash aggregate already does map-side partial aggregation,
  which absorbs *moderate* skew; but when one key's partials still
  overwhelm a reducer (huge cardinality aggregates, or partial agg
  disabled by non-combinable functions), salting splits each hot key into
  ``#input-partition`` sub-groups, aggregates each locally-sized piece,
  then merges the per-salt partials in a second, uniformly-keyed pass.

The salt here is ``spark_partition_id()``: zero hashing cost, splits every
key exactly along input-partition lines (the worst a hot key can do is one
partial row per input partition), and needs no tuning.  Correctness never
depends on the salt value — it is aggregated away — so input-layout
nondeterminism is harmless.  Only DECOMPOSABLE aggregates (sum, count,
min, max, and anything expressible over those, e.g. mean = sum/count)
can be salted this way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str | Column],
    partials: dict[str, Column],
    merges: dict[str, Column],
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partials``: alias → aggregate expression for phase 1, evaluated per
    (keys..., salt) sub-group.  ``merges``: alias → aggregate expression
    over the phase-1 column of the same alias, producing the final value
    per key.  Phase 1's shuffle is uniform even under key skew because the
    salt splits hot keys; phase 2 shuffles only #distinct-keys × #salts
    pre-aggregated rows.
    """
    p1 = df.groupBy(*keys, F.spark_partition_id().alias(SALT)).agg(
        *[expr.alias(a) for a, expr in partials.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merges[a].alias(a) for a in partials]
    )
