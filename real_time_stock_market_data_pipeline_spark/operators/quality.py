"""Declarative data-quality expectations over the pipeline's tables.

The reference validates ticks row-by-row at ingest (P7,
``shared/data_validation.py``: price/volume range + required-field checks,
invalid rows routed to an error sink).  At warehouse scale, validation is
also needed as a BATCH AUDIT — one report over whole tables answering "how
many rows violate each contract?" before data is trusted for training.
This module is that audit: a declarative expectation spec compiled into
per-table single-pass aggregates.

Three expectation kinds:

  pred    — a boolean SQL predicate every row must satisfy; a NULL
            predicate result counts as a violation (unknown ≠ satisfied)
  unique  — a column whose values must not repeat (NULLs don't count —
            count(col) skips them; pair with a pred NOT NULL check)
  fk      — a child key that must exist in a parent table's key column;
            a NULL child key counts as a violation (NULL never matches —
            model nullable references as `fk_col IS NULL OR ...` preds)

Scale shape: ALL pred/unique checks against one table fold into a single
aggregate over one scan (map-side-combinable sums; the unique check adds a
count-distinct expand on the same pass).  Each fk check is one left join
against the parent's distinct keys — broadcast when the parent is a dim,
shuffle-on-key when it is not (Catalyst/AQE decides; no hint is forced
because at 100 TB a "parent" can be a fact table).  The report output is
O(#checks) rows regardless of input size — nothing collects to the driver.

A failed check REPORTS (passed=false, n_violations>0); it never throws —
auditing is observability, not a gate.  Gate semantics belong to the
caller: ``assert report.filter(~col('passed')).count() == 0``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    table: str
    kind: str  # 'pred' | 'unique' | 'fk'
    expr: str  # pred: SQL predicate; unique: column; fk: child key column
    parent_table: str = ""  # fk only
    parent_key: str = ""  # fk only


# Contracts for the synthetic star schema + events stream — the domains the
# generator guarantees (TESTDATA.md); violations therefore mean pipeline
# corruption, not data drift.
DEFAULT_EXPECTATIONS: list[Expectation] = [
    Expectation("events_value_present", "events", "pred", "value IS NOT NULL"),
    Expectation("events_value_positive", "events", "pred", "value > 0"),
    Expectation(
        "events_type_in_domain",
        "events",
        "pred",
        "event_type IN ('click','signup','error','view','purchase')",
    ),
    Expectation("events_id_unique", "events", "unique", "event_id"),
    Expectation("orders_price_positive", "orders", "pred", "o_totalprice > 0"),
    Expectation(
        "lineitem_qty_in_range", "lineitem", "pred", "l_quantity BETWEEN 1 AND 50"
    ),
    Expectation(
        "lineitem_discount_in_range",
        "lineitem",
        "pred",
        "l_discount BETWEEN 0.0 AND 0.1",
    ),
    Expectation(
        "orders_customer_fk", "orders", "fk", "o_custkey", "customer", "c_custkey"
    ),
    Expectation(
        "lineitem_orders_fk", "lineitem", "fk", "l_orderkey", "orders", "o_orderkey"
    ),
]


def expectations_report(
    tables: dict[str, DataFrame],
    specs: list[Expectation] = DEFAULT_EXPECTATIONS,
) -> DataFrame:
    """(check_name, table_name, n_rows, n_violations, passed) — one row per
    expectation.  One scan per audited table for all its pred/unique checks
    (explode-from-struct keeps it a single aggregate job branch); one join
    per fk check."""
    spark = next(iter(tables.values())).sparkSession
    branches: list[DataFrame] = []

    by_table: dict[str, list[Expectation]] = {}
    for s in specs:
        if s.kind in ("pred", "unique"):
            by_table.setdefault(s.table, []).append(s)

    for table, checks in by_table.items():
        df = tables[table]
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in checks:
            if c.kind == "pred":
                viol = F.sum(
                    F.when(~F.expr(c.expr) | F.expr(c.expr).isNull(), 1).otherwise(0)
                )
            else:  # unique
                viol = F.count(F.col(c.expr)) - F.countDistinct(F.col(c.expr))
            aggs.append(viol.cast("bigint").alias(f"__v_{c.name}"))
        one = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check_name"),
                    F.col(f"__v_{c.name}").alias("n_violations"),
                )
                for c in checks
            ]
        )
        branches.append(
            one.select(
                F.explode(pairs).alias("c"), F.col("n_rows")
            ).select(
                F.col("c.check_name"),
                F.lit(table).alias("table_name"),
                F.col("n_rows"),
                F.col("c.n_violations"),
            )
        )

    for s in specs:
        if s.kind != "fk":
            continue
        child, parent = tables[s.table], tables[s.parent_table]
        pk = parent.select(F.col(s.parent_key).alias("__pk")).distinct()
        joined = child.join(pk, F.col(s.expr) == F.col("__pk"), "left")
        branches.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_violations"),
            ).select(
                F.lit(s.name).alias("check_name"),
                F.lit(s.table).alias("table_name"),
                "n_rows",
                "n_violations",
            )
        )

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.withColumn("passed", F.col("n_violations") == 0)


def expectations_sql(specs: list[Expectation] = DEFAULT_EXPECTATIONS) -> str:
    """ANSI rendering of the same report — one UNION ALL branch per check
    (the oracle text; engines share it verbatim).  The per-table single-scan
    fusion is a Spark-plan concern, not a semantics one, so the SQL keeps
    the simplest correct shape."""
    branches = []
    for s in specs:
        if s.kind == "pred":
            viol = (
                f"sum(CASE WHEN NOT ({s.expr}) OR ({s.expr}) IS NULL "
                f"THEN 1 ELSE 0 END)"
            )
            body = (
                f"SELECT '{s.name}' AS check_name, '{s.table}' AS table_name, "
                f"count(*) AS n_rows, CAST({viol} AS BIGINT) AS n_violations "
                f"FROM {s.table}"
            )
        elif s.kind == "unique":
            body = (
                f"SELECT '{s.name}' AS check_name, '{s.table}' AS table_name, "
                f"count(*) AS n_rows, "
                f"CAST(count({s.expr}) - count(DISTINCT {s.expr}) AS BIGINT) "
                f"AS n_violations FROM {s.table}"
            )
        else:  # fk
            body = (
                f"SELECT '{s.name}' AS check_name, '{s.table}' AS table_name, "
                f"count(*) AS n_rows, "
                f"CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
                f"AS n_violations "
                f"FROM {s.table} c LEFT JOIN "
                f"(SELECT DISTINCT {s.parent_key} AS __pk FROM {s.parent_table}) p "
                f"ON c.{s.expr} = p.__pk"
            )
        branches.append(body)
    union = " UNION ALL ".join(branches)
    return (
        f"SELECT check_name, table_name, n_rows, n_violations, "
        f"(n_violations = 0) AS passed FROM ({union}) r"
    )


def audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convenience: run the default expectation suite over the standard
    table layout."""
    from ..sources.readers import load_table

    names = {s.table for s in DEFAULT_EXPECTATIONS} | {
        s.parent_table for s in DEFAULT_EXPECTATIONS if s.parent_table
    }
    tables = {n: load_table(spark, sf_dir, n) for n in names}
    return expectations_report(tables)


# --- Model-based quality classifier (txt18) ----------------------------------
QC_DIM = 17  # 16 hashed feature buckets + intercept
QC_RIDGE = 1  # integer ridge keeps the normal equations exact integers
QC_CUT = 0.5  # keep iff r6(score) >= this


def train_quality_classifier(
    marked: DataFrame, dim: int = QC_DIM, ridge: int = QC_RIDGE
) -> list[float]:
    """Fit a ridge-regularized linear quality classifier IN-ENGINE (the
    C4/fastText curation shape: a cheap linear model over hashed
    bag-of-token features, trained against a weak-label rule — no
    sklearn, no external model).  ``marked`` carries integer features
    x0..x{dim-1} (x0 = 1 intercept, x1.. = txt13's exact ±1 bucket sums)
    and the weak label y ∈ {0, 1} (txt10 non-repetitive ∧ txt15
    perplexity band in the registered txt18 plan).

    Training is ONE distributed aggregate: all dim·(dim+1) normal-
    equation sums (XᵀX and Xᵀy) are exact INTEGER map-combinable sums
    computed in a single corpus pass — the classic scan-bound shape; the
    driver then solves the (dim×dim ≈ 17×17) ridge system with the
    fixed-order Gauss-Jordan twin (ml/regression.gj_solve), a
    codebook-sized O(d³) step.  Because XᵀX is integer-exact, the
    coefficients are bit-identical to the txt18 DuckDB oracle's in-SQL
    elimination — a fully value-checkable trained model.

    Scale: the aggregate state is dim² longs per partition (~2.4 KB) —
    independent of corpus size; nothing corpus-sized reaches the driver.
    """
    exprs = []
    for i in range(dim):
        for j in range(dim):
            exprs.append(
                F.sum(F.col(f"x{i}") * F.col(f"x{j}"))
                .cast("long")
                .alias(f"a_{i}_{j}")
            )
        exprs.append(
            F.sum(F.col(f"x{i}") * F.col("y")).cast("long").alias(f"b_{i}")
        )
    row = marked.agg(*exprs).collect()[0]
    A = [
        [row[f"a_{i}_{j}"] + (ridge if i == j else 0) for j in range(dim)]
        for i in range(dim)
    ]
    b = [row[f"b_{i}"] for i in range(dim)]
    from ..ml.regression import gj_solve

    return gj_solve(A, b)


def score_quality(
    marked: DataFrame, beta: list[float], cut: float = QC_CUT
) -> DataFrame:
    """Score every document under a trained linear quality model:
    score = β₀ + Σ βⱼ·xⱼ accumulated in FIXED left-to-right order (the
    same chain the txt18 oracle SQL writes out), r6-rounded, and cut at
    ``cut`` on the ROUNDED value so both engines decide boundary docs
    identically (the txt15 rule).  Pure JVM column arithmetic — scoring
    a 100 TB corpus is one scan, no Python, no shuffle."""
    from ..functions.scalars import r6

    score = F.lit(0.0)
    for i, w in enumerate(beta):
        score = score + F.lit(float(w)) * F.col(f"x{i}").cast("double")
    rounded = r6(score)
    return marked.select(
        "doc_id",
        F.col("y").alias("weak_label"),
        rounded.alias("quality_score"),
        (rounded >= F.lit(float(cut))).alias("keep"),
    )
