"""Event-stream product analytics: gap sessionization, ordered funnel
matching, and retention cohorts.

These are the per-session / per-cohort reductions an event store runs
at warehouse scale (the reference's activity/session readers are the
single-athlete analogue, e.g. ``mcp/database/readers/performance.py``'s
per-activity split sequences); here they're expressed as keyed window
passes so every stage shares ONE hash shuffle on the entity key:

- ``sessionize``: LAG + running-sum boundary marking (the t9 idiom,
  factored for reuse).  Ordering always includes a unique tiebreak
  column so duplicate timestamps cannot move a boundary between
  engines or between runs (the t3 duplicate-key lesson).
- ``ordered_funnel``: stage-k timestamp = MIN event ts of stage k
  STRICTLY AFTER the matched stage-(k-1) timestamp, computed as one
  chained window pass per stage over the same partition keys — no
  self-joins, no per-entity collect.  NULL propagates: an unmatched
  stage leaves all later stages NULL.
- ``retention_cohorts``: cohort = entity's first-seen period; one
  grouped MIN for cohorts + one distinct-activity aggregate, joined on
  the entity key (co-partitioned at scale), then a (cohort, offset)
  rollup.  The output is the classic retention triangle.

Scale shape: sessionize/funnel = one exchange on the entity key;
cohorts = two keyed aggregates + one equi-join + one small rollup.  No
global windows (gated by tests/test_plan_shapes.py catalog-wide).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_sec: int = 1800,
    out_col: str = "session_seq",
) -> DataFrame:
    """Mark gap-based sessions: a new session starts where the gap to
    the previous event (per key, ordered by ts + tiebreak) exceeds
    ``gap_sec``.  Adds ``out_col`` (1-based BIGINT).  Gaps compare at
    FULL microsecond precision (``unix_micros``, not a second-floored
    epoch cast): a true gap of ``gap_sec + 0.9s`` splits the session
    even though its whole-second floor equals ``gap_sec``."""
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    epoch = F.unix_micros(F.col(ts_col))
    gap = epoch - F.lag(epoch).over(w)
    gap_us = int(gap_sec) * 1_000_000
    return df.withColumn(
        out_col,
        F.sum(F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def ordered_funnel(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    stage_col: str,
    stages: Sequence[str],
    out_prefix: str = "stage",
) -> DataFrame:
    """Per-key ordered funnel: for each key group, stage k's matched
    timestamp is the MIN ``ts_col`` among rows whose ``stage_col``
    equals ``stages[k]`` and whose timestamp is STRICTLY after stage
    k-1's matched timestamp (stage 0 is unconstrained).  Returns the
    input with one ``{out_prefix}{k}_ts`` column per stage (window
    columns, one per row — aggregate afterwards).

    All stages share the same partitionBy, so Catalyst plans ONE
    exchange and a chain of window operators — the scale-safe shape
    for "did A then B then C happen in order" over billions of keys.
    """
    out = df
    prev: Column | None = None
    for k, stage in enumerate(stages):
        w = Window.partitionBy(*keys)
        cond = F.col(stage_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        col = F.min(F.when(cond, F.col(ts_col))).over(w)
        name = f"{out_prefix}{k}_ts"
        out = out.withColumn(name, col)
        prev = F.col(name)
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention triangle: cohort = the ``period`` of each entity's
    first event; one row per (cohort, period_offset) with the distinct
    active entities, the cohort size, and the retention rate.

    ``period_offset`` is in whole periods (weeks → days/7: both ends
    are period-truncated so the day difference is exactly divisible).
    """
    per_user = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_period")
    )
    step_days = {"week": 7, "day": 1}[period]
    activity = df.select(
        F.col(user_col).alias("_u"),
        F.date_trunc(period, F.col(ts_col)).alias("_apd"),
    ).distinct()
    joined = activity.join(
        per_user, activity["_u"] == per_user[user_col]
    ).select(
        "_u",
        "cohort_period",
        (
            F.datediff(F.col("_apd"), F.col("cohort_period")) / step_days
        ).cast("bigint").alias("period_offset"),
    )
    active = joined.groupBy("cohort_period", "period_offset").agg(
        F.count_distinct(F.col("_u")).alias("active_users")
    )
    sizes = per_user.groupBy("cohort_period").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return active.join(sizes, "cohort_period").select(
        "cohort_period",
        "period_offset",
        "active_users",
        "cohort_size",
        (F.col("active_users").cast("double") / F.col("cohort_size")).alias(
            "retention_rate"
        ),
    )
