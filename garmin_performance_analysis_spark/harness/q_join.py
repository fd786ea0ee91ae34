"""As-of / nearest-date join queries (SURVEY.md §2.3: J7-J9) — the two
join shapes the reference implements in Python rather than SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import backward_asof_join, nearest_date_asof_join
from ..sources.tables import load_table
from .registry import register


@register(
    "j7_nearest_date_asof",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS ld, value
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, CAST(ts AS DATE) AS rd, event_id AS signup_event_id, value AS signup_value
  FROM events WHERE event_type = 'signup'
),
j AS (
  SELECT l.event_id, l.user_id, l.value, r.signup_event_id, r.signup_value,
         datediff('day', l.ld, r.rd) AS gap_days,
         ROW_NUMBER() OVER (
           PARTITION BY l.event_id
           ORDER BY ABS(datediff('day', l.ld, r.rd)),
                    datediff('day', l.ld, r.rd),
                    r.signup_event_id
         ) AS rn
  FROM l JOIN r ON l.user_id = r.user_id
              AND ABS(datediff('day', l.ld, r.rd)) <= 2
)
SELECT event_id, user_id, value, signup_event_id, signup_value, gap_days
FROM j WHERE rn = 1
""",
    tags=("join", "asof"),
)
def j7_nearest_date_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 nearest-date as-of join (±2-day band, tie → past side): each
    purchase event matched to the nearest signup by the same user —
    the runs⋈body_composition weight attachment
    (``mcp/analysis/running_economy.py:115-196``, tie-break :140-154)."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.to_date("ts").alias("ld"), "value"
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.to_date("ts").alias("rd"),
        F.col("event_id").alias("signup_event_id"),
        F.col("value").alias("signup_value"),
    )
    out = nearest_date_asof_join(
        left,
        right,
        left_id_cols=["event_id"],
        join_keys=["user_id"],
        left_date="ld",
        right_date="rd",
        max_gap_days=2,
        tie_break_past=True,
        right_tiebreak="signup_event_id",
    )
    return out.select(
        "l.event_id", "l.user_id", "l.value", "signup_event_id", "signup_value", "gap_days"
    )


@register(
    "j9_backward_asof",
    oracle="""
SELECT l.event_id, l.user_id, l.value,
       r.event_id AS asof_signup_event_id,
       r.value AS asof_signup_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
""",
    tags=("join", "asof"),
)
def j9_backward_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 backward as-of (fallback temporal lookup): for each purchase,
    the most recent signup at-or-before it, per user — the reference's
    "VO2max for activity, else most recent date <= activity_date"
    (``readers/physiology.py:170-229``).  Implemented as union + sort +
    last-value-forward: one shuffle, linear scale, vs DuckDB's native
    ASOF JOIN in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_event_id"),
        F.col("value").alias("signup_value"),
    )
    out = backward_asof_join(
        left,
        right,
        keys=["user_id"],
        left_on="ts",
        right_on="ts",
        value_cols=["signup_event_id", "signup_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("asof_signup_event_id"),
        F.col("asof_signup_value"),
    )
