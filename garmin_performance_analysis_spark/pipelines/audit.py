"""Data-quality audit: declarative constraint checks over a table,
evaluated in ONE aggregation pass.

The reference enforces integrity in its ingest pipeline rather than
with DB constraints (SURVEY.md §1.3 — FKs removed by migration,
unique indexes only for upsert idempotency); at corpus scale the same
job becomes a standing audit: every ingest batch (or the whole silver
table) gets a constraint report BEFORE downstream jobs consume it.

Design for 100 TB: every check compiles to an aggregate expression
over the same scan — nullability, set-membership, ranges, row-level
consistency predicates, and uniqueness (``count − count_distinct``,
which Spark computes in the same hash-aggregate via expand) — so N
checks cost ONE pass over the data and produce an N-row report via
``stack``.  No per-check jobs, no driver-side loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` is a boolean Column that is
    true for each ROW violating the constraint (row-level checks), or
    ``agg_violations`` an aggregate Column counting violations
    directly (table-level checks like uniqueness)."""

    name: str
    violation: Column | None = None
    agg_violations: Column | None = None


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", violation=F.col(col).isNull())


def in_set(col: str, values: list) -> Check:
    return Check(
        f"{col}_in_set",
        violation=~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"{col}_in_range",
        violation=F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Row-level consistency predicate; violation = NOT predicate
    (null predicate counts as a violation)."""
    return Check(name, violation=~F.coalesce(predicate, F.lit(False)))


def unique(col: str) -> Check:
    """Table-level: number of surplus rows beyond one per key."""
    return Check(
        f"{col}_unique",
        agg_violations=(F.count(F.col(col)) - F.count_distinct(F.col(col))).cast(
            "bigint"
        ),
    )


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one aggregation pass.

    Output: (check_name, violations, total, passed) — one row per
    check, ``total`` = table row count for every row (the denominator
    a monitoring system rates against).
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(checks):
        if c.agg_violations is not None:
            aggs.append(c.agg_violations.alias(f"_v{i}"))
        else:
            aggs.append(
                F.sum(F.when(c.violation, 1).otherwise(0))
                .cast("bigint")
                .alias(f"_v{i}")
            )
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{c.name}', _v{i}" for i, c in enumerate(checks))
    return row.select(
        F.expr(f"stack({len(checks)}, {pairs})").alias("check_name", "violations"),
        F.col("_total").alias("total"),
    ).select(
        "check_name",
        "violations",
        "total",
        (F.col("violations") == 0).alias("passed"),
    )
