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
