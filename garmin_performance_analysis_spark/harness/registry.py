"""Query-catalog registry and numeric-parity helpers.

Parity conventions (Spark vs DuckDB oracle) used across all catalog
modules:

- SUMs of fractional doubles go through DECIMAL so the result is exact
  and order-independent (Spark sums shuffle partitions in
  nondeterministic order; a double sum would wobble in the last ulps).
- AVG/STDDEV/MEDIAN/ratio outputs are rounded to 6 decimals both sides.
- Every ordering that feeds a LIMIT ends in a unique key column.
- Dates in outputs are formatted as strings; timestamps pass through
  (both engines are microsecond/UTC after the events loader).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def r6(col):
    return F.round(col, 6)


def dec_sum(col, scale: int = 2, precision: int = 22):
    """Exact, order-independent SUM of a fractional double column."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col, scale: int = 12, precision: int = 30):
    """Deterministic AVG: DECIMAL-exact sum / count.

    Plain ``avg`` over doubles varies run-to-run with shuffle fetch
    order (hash-agg partial merge), which flickers rounded outputs at
    cutoff boundaries — see SCALING.md lesson 5.
    """
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double") / F.count(col)


def dec_std(col, sample: bool = True, scale: int = 12):
    """Deterministic STDDEV from DECIMAL-exact moment sums, guarded
    against negative cancellation (DuckDB sqrt rejects negatives)."""
    n = F.count(col)
    sx = F.sum(col.cast(f"decimal(30,{scale})")).cast("double")
    sxx = F.sum((col * col).cast(f"decimal(38,{scale})")).cast("double")
    den = (n - 1) if sample else n
    return F.when(den > 0, F.sqrt(F.greatest((sxx - sx * sx / n) / den, F.lit(0.0))))


# Oracle-side SQL fragments mirroring dec_avg / dec_std exactly.
def sql_davg(expr: str, scale: int = 12, precision: int = 30) -> str:
    return (
        f"(CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )


def sql_dstd(expr: str, sample: bool = True, scale: int = 12) -> str:
    n = f"COUNT({expr})"
    sx = f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST(({expr}) * ({expr}) AS DECIMAL(38,{scale}))) AS DOUBLE)"
    den = f"({n} - 1)" if sample else n
    return (
        f"(CASE WHEN {den} > 0 THEN sqrt(GREATEST(({sxx} - {sx} * {sx} / {n}) / {den}, 0.0)) END)"
    )
