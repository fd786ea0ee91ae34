"""Date bucketing helpers (SURVEY.md §2.8 F1).

The reference computes calendar buckets two ways: ``strftime('%Y-%m')``
for months and isodow modulo arithmetic for configurable-start weeks
(``web/queries/trends.py:102-113``; ``mcp/utils/week.py:21-50``).
Both become pure column expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def week_start(date_col: Column, start_day: int = 0) -> Column:
    """Start-of-week date for a configurable week start.

    ``start_day`` follows the reference convention: 0=Monday … 6=Sunday
    (``mcp/utils/week.py:21-50``).  Spark's ``dayofweek`` is 1=Sunday …
    7=Saturday, so Monday-start is ``date_sub(d, (dayofweek(d)+5) % 7)``;
    a general start shifts the offset.
    """
    offset = (F.dayofweek(date_col) + F.lit(5 - start_day)) % 7
    return F.date_sub(F.to_date(date_col), offset)


def month_bucket(date_col: Column) -> Column:
    """``strftime('%Y-%m')`` month label (``web/queries/trends.py:102``)."""
    return F.date_format(date_col, "yyyy-MM")


def day_number(date_col: Column, epoch: str = "2024-01-01") -> Column:
    """Days since a fixed epoch — the numeric ordering key for
    day-granularity RANGE windows (ACWR, fitness curve)."""
    return F.datediff(F.to_date(date_col), F.lit(epoch))
