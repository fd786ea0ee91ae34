"""D8 composite enrichment as an oracle-backed query.

The splits frame derives from lineitem with metric divisors whose
decimal expansions don't terminate (denominators with a factor 3), so
neither ROUND(.,6) nor the ``%.1f`` label formatting ever lands on an
exact decimal tie — the one place Spark (HALF_UP on the shortest repr)
and DuckDB (exact-binary rounding) genuinely disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.enrichment import build_form_efficiency
from ..sources.tables import load_table
from .registry import register

_SPLITS_CTE = """
ranked AS (
  SELECT l_orderkey AS activity_id,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey) AS split_index,
         150.0 + l_extendedprice / 500.0 AS gct,
         6.0 + l_extendedprice / 21000.0 AS vo,
         5.0 + l_extendedprice / 30000.0 AS vr
  FROM lineitem
)
"""


@register(
    "d8_form_efficiency",
    oracle=f"""
WITH {_SPLITS_CTE},
numbered AS (
  SELECT *, COUNT(*) OVER (PARTITION BY activity_id) AS n
  FROM ranked
),
agg AS (
  SELECT activity_id,
         COUNT(*) AS n,
         AVG(gct) AS gct_average, MIN(gct) AS gct_min, MAX(gct) AS gct_max,
         COALESCE(STDDEV_SAMP(gct), 0.0) AS gct_std,
         AVG(vo) AS vo_average, MIN(vo) AS vo_min, MAX(vo) AS vo_max,
         COALESCE(STDDEV_SAMP(vo), 0.0) AS vo_std,
         AVG(vr) AS vr_average, MIN(vr) AS vr_min, MAX(vr) AS vr_max,
         COALESCE(STDDEV_SAMP(vr), 0.0) AS vr_std,
         STDDEV_POP(vo) AS vo_stdp,
         AVG(CASE WHEN split_index <= n // 2 THEN vo END) AS vo_first,
         AVG(CASE WHEN split_index > n // 2 THEN vo END) AS vo_second
  FROM numbered GROUP BY activity_id
),
derived AS (
  SELECT *,
         vo_stdp / vo_average * 100.0 AS cv,
         (vo_second - vo_first) / vo_first * 100.0 AS change_pct
  FROM agg
)
SELECT activity_id,
       floor((gct_average) * 1e6 + 0.5) / 1e6 AS gct_average, floor((gct_min) * 1e6 + 0.5) / 1e6 AS gct_min,
       floor((gct_max) * 1e6 + 0.5) / 1e6 AS gct_max, floor((gct_std) * 1e6 + 0.5) / 1e6 AS gct_std,
       floor((vo_average) * 1e6 + 0.5) / 1e6 AS vo_average, floor((vo_min) * 1e6 + 0.5) / 1e6 AS vo_min,
       floor((vo_max) * 1e6 + 0.5) / 1e6 AS vo_max, floor((vo_std) * 1e6 + 0.5) / 1e6 AS vo_std,
       floor((vr_average) * 1e6 + 0.5) / 1e6 AS vr_average, floor((vr_min) * 1e6 + 0.5) / 1e6 AS vr_min,
       floor((vr_max) * 1e6 + 0.5) / 1e6 AS vr_max, floor((vr_std) * 1e6 + 0.5) / 1e6 AS vr_std,
       CASE WHEN gct_average < 220 THEN '★★★★★' WHEN gct_average < 240 THEN '★★★★☆'
            WHEN gct_average < 260 THEN '★★★☆☆' WHEN gct_average < 280 THEN '★★☆☆☆'
            ELSE '★☆☆☆☆' END AS gct_rating,
       CASE WHEN vo_average < 6.5 THEN '★★★★★' WHEN vo_average < 8.0 THEN '★★★★☆'
            WHEN vo_average < 10.0 THEN '★★★☆☆' WHEN vo_average < 12.0 THEN '★★☆☆☆'
            ELSE '★☆☆☆☆' END AS vo_rating,
       CASE WHEN vr_average < 7.0 THEN '★★★★★' WHEN vr_average < 9.0 THEN '★★★★☆'
            WHEN vr_average < 11.0 THEN '★★★☆☆' WHEN vr_average < 13.0 THEN '★★☆☆☆'
            ELSE '★☆☆☆☆' END AS vr_rating,
       CASE WHEN gct_average BETWEEN 200 AND 250
              THEN 'Excellent (' || CAST(floor(gct_average) AS INTEGER) || 'ms, optimal range)'
            WHEN (gct_average >= 180 AND gct_average < 200) OR (gct_average > 250 AND gct_average <= 280)
              THEN 'Good (' || CAST(floor(gct_average) AS INTEGER) || 'ms)'
            WHEN gct_average < 180
              THEN 'Too short (' || CAST(floor(gct_average) AS INTEGER) || 'ms, may indicate overstriding)'
            ELSE 'Too long (' || CAST(floor(gct_average) AS INTEGER) || 'ms, target <250ms)' END AS gct_evaluation,
       CASE WHEN vo_average < 8 THEN printf('Excellent (%.1fcm, minimal bounce)', vo_average)
            WHEN vo_average < 10 THEN printf('Good (%.1fcm, target <8cm for optimal efficiency)', vo_average)
            WHEN vo_average < 12 THEN printf('Acceptable (%.1fcm, reduce bounce)', vo_average)
            ELSE printf('Poor (%.1fcm, excessive vertical movement)', vo_average) END AS vo_evaluation,
       CASE WHEN vr_average < 6 THEN printf('Excellent (%.1f%%, optimal efficiency)', vr_average)
            WHEN vr_average < 8 THEN printf('Good (%.1f%%)', vr_average)
            WHEN vr_average < 10 THEN printf('Acceptable (%.1f%%, room for improvement)', vr_average)
            ELSE printf('Poor (%.1f%%, high energy waste)', vr_average) END AS vr_evaluation,
       floor((gct_std / gct_average * 100.0) * 1e6 + 0.5) / 1e6 AS gct_variability,
       CASE WHEN n < 3 THEN printf('Insufficient data (%d splits)', n)
            ELSE (CASE WHEN cv < 5 THEN 'Very stable' WHEN cv < 10 THEN 'Stable' ELSE 'Variable' END)
                 || printf(' (%.1fcm avg, CV=%.0f%%, ', vo_average, cv)
                 || (CASE WHEN ABS(change_pct) < 3 THEN 'consistent'
                          WHEN change_pct > 0 THEN printf('increasing (+%.1f%%, fatigue indicator)', change_pct)
                          ELSE printf('decreasing (%.1f%%)', change_pct) END)
                 || ')' END AS vo_trend
FROM derived
""",
    tags=("enrichment", "composite"),
)
def d8_form_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 form-efficiency table (stats + star ratings + evaluation
    strings + VO trend wording) over a lineitem-derived splits frame —
    the full composite transform oracle-verified, label strings
    included (``inserters/form_efficiency.py:18-340``)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    splits = li.select(
        F.col("l_orderkey").alias("activity_id"),
        F.row_number().over(w).alias("split_index"),
        (150.0 + F.col("l_extendedprice") / 500.0).alias("ground_contact_time"),
        (6.0 + F.col("l_extendedprice") / 21000.0).alias("vertical_oscillation"),
        (5.0 + F.col("l_extendedprice") / 30000.0).alias("vertical_ratio"),
    )
    out = build_form_efficiency(splits)

    def r6d(c):
        # floor(x*1e6+0.5)/1e6: identical IEEE ops in both engines, no
        # dependence on either engine's decimal-tie handling
        return F.floor(F.col(c) * 1e6 + 0.5) / 1e6

    rounded = [
        r6d(c).alias(c)
        if c.split("_", 1)[-1] in ("average", "min", "max", "std") or c == "gct_variability"
        else F.col(c)
        for c in out.columns
    ]
    return out.select(*rounded)
