"""T7: range resolution + per-range stats (split → time-range → stats)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_funcs import day_number
from ..operators.windows import gaps_and_islands
from ..sources.tables import load_table
from .registry import r6 as _r6
from .registry import register


@register(
    "t7_range_resolution_stats",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dn FROM events),
num AS (
  SELECT user_id, dn, dn - LAG(dn) OVER (PARTITION BY user_id ORDER BY dn) AS gap
  FROM days
),
isl AS (
  SELECT user_id, dn,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY dn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
  FROM num
),
ranges AS (
  SELECT user_id, island_id, MIN(dn) AS start_dn, MAX(dn) AS end_dn
  FROM isl GROUP BY user_id, island_id
  HAVING MAX(dn) - MIN(dn) + 1 >= 5
),
resolved AS (
  SELECT r.user_id, r.island_id, r.start_dn, r.end_dn, e.value
  FROM ranges r
  JOIN (SELECT user_id, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dn, value FROM events) e
    ON e.user_id = r.user_id AND e.dn BETWEEN r.start_dn AND r.end_dn
)
SELECT user_id, island_id, start_dn, end_dn,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(22,2))) AS DOUBLE) / COUNT(*), 6) AS value_avg,
       ROUND(sqrt((CAST(SUM(CAST(value * value AS DECIMAL(22,4))) AS DOUBLE)
                   - CAST(SUM(CAST(value AS DECIMAL(22,2))) AS DOUBLE)
                     * CAST(SUM(CAST(value AS DECIMAL(22,2))) AS DOUBLE) / COUNT(*))
                  / (COUNT(*) - 1)), 6) AS value_stddev,
       MIN(value) AS value_min,
       MAX(value) AS value_max
FROM resolved
GROUP BY user_id, island_id, start_dn, end_dn
""",
    tags=("timeseries", "join"),
)
def t7_range_resolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: resolve logical segments (≥5-day activity streaks) to
    ``[start, end]`` ranges, then range-join the raw series back for
    per-segment stats — the split→time-range→stats pattern
    (``mcp/rag/queries/time_series_detail.py:67-106,491-669``).  The
    range join is banded by ``user_id`` equi-key so it never crosses
    users."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", day_number(F.col("ts")).alias("dn")).distinct()
    isl = gaps_and_islands(days, ["user_id"], "dn", max_gap=1)
    ranges = (
        isl.groupBy("user_id", "island_id")
        .agg(F.min("dn").alias("start_dn"), F.max("dn").alias("end_dn"))
        .filter(F.col("end_dn") - F.col("start_dn") + 1 >= 5)
    )
    series = ev.select(
        F.col("user_id").alias("e_user"), day_number(F.col("ts")).alias("e_dn"), "value"
    )
    resolved = ranges.join(
        series,
        (F.col("e_user") == F.col("user_id"))
        & F.col("e_dn").between(F.col("start_dn"), F.col("end_dn")),
    )
    # DECIMAL-exact moments: plain AVG/STDDEV wobble in the last ulp
    # across engines and can flip the 6th rounded decimal
    n = F.count(F.lit(1))
    sy = F.sum(F.col("value").cast("decimal(22,2)")).cast("double")
    syy = F.sum((F.col("value") * F.col("value")).cast("decimal(22,4)")).cast("double")
    return resolved.groupBy("user_id", "island_id", "start_dn", "end_dn").agg(
        n.alias("n"),
        _r6(sy / n).alias("value_avg"),
        _r6(F.sqrt((syy - sy * sy / n) / (n - 1))).alias("value_stddev"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
