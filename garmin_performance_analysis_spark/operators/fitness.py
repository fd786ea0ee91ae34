"""Objective fitness composites (SURVEY.md M10, M11, M15).

- M10 objective fitness curve: per-day best VDOT → trailing 90-day
  rolling max → optimism gap vs the device's VO2max estimate
  (``mcp/objective_fitness/curve.py:35-97``,
  ``mcp/database/readers/fitness_curve.py:36-158``).
- M11 blended race prediction: 0.6·curve + 0.4·VDOT time with
  agreement-based confidence (``mcp/analysis/race_prediction.py:29-186``).
- M15 fitness assessment pieces: ≥7-day training-gap detection with
  pre-gap weekly-volume context (``mcp/fitness/fitness_assessor.py:61-144``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import bounded_partition_key, rolling_range_max


def objective_fitness_curve(
    daily_vdot: DataFrame,
    day_col: str = "day_number",
    vdot_col: str = "vdot",
    garmin_col: str = "garmin_vdot",
    window_days: int = 90,
) -> DataFrame:
    """M10: per-day objective fitness = trailing-``window_days`` max of
    effort-derived VDOT, plus the optimism gap (device estimate minus
    objective) where the device value exists."""
    best = daily_vdot.groupBy(day_col).agg(
        F.max(vdot_col).alias("best_vdot"),
        F.max(garmin_col).alias("garmin_vdot"),
    )
    curve = rolling_range_max(best, [], day_col, "best_vdot", window_days, "fitness_vdot")
    gap = F.when(
        F.col("garmin_vdot").isNotNull(),
        F.col("garmin_vdot") - F.col("fitness_vdot"),
    )
    return curve.withColumn("optimism_gap", gap)


def race_prediction_blend(
    curve_time_s: Column,
    vdot_time_s: Column,
    curve_weight: float = 0.6,
) -> tuple[Column, Column]:
    """M11: blended predicted time + confidence.

    Blend = 0.6·curve + 0.4·VDOT when both exist, else the available
    one.  Confidence: ``high`` when the two predictions agree within
    3%, ``medium`` otherwise, ``low`` when only one source exists
    (``race_prediction.py:29-186``)."""
    w2 = 1.0 - curve_weight
    both = curve_time_s.isNotNull() & vdot_time_s.isNotNull()
    blended = (
        F.when(both, curve_time_s * curve_weight + vdot_time_s * w2)
        .otherwise(F.coalesce(curve_time_s, vdot_time_s))
    )
    agreement = F.abs(curve_time_s - vdot_time_s) / curve_time_s
    confidence = (
        F.when(both & (agreement <= 0.03), F.lit("high"))
        .when(both, F.lit("medium"))
        .when(blended.isNotNull(), F.lit("low"))
        .otherwise(F.lit(None).cast("string"))
    )
    return blended, confidence


def detect_training_gaps(
    activities: DataFrame,
    partition_cols: Sequence[str] = (),
    date_col: str = "activity_date",
    volume_col: str = "total_distance_km",
    min_gap_days: int = 7,
    lookback_weeks: int = 24,
) -> DataFrame:
    """M15: detect ≥``min_gap_days`` pauses between consecutive
    activities and attach the pre-gap median weekly volume over the
    prior ``lookback_weeks`` (``fitness_assessor.py:61-144``).

    One window pass for the gap lag; the weekly-volume median comes
    from a week rollup joined back by range.
    """
    part = list(partition_cols)
    # the no-partition-cols path is the single-athlete facade scope —
    # a constant key makes the bounded single-partition window explicit
    w = (
        Window.partitionBy(*part).orderBy(date_col)
        if part
        else Window.partitionBy(bounded_partition_key(date_col)).orderBy(date_col)
    )
    dated = activities.withColumn("_prev", F.lag(date_col, 1).over(w)).withColumn(
        "_gap_days", F.datediff(F.col(date_col), F.col("_prev"))
    )
    gaps = dated.filter(F.col("_gap_days") >= min_gap_days).select(
        *part,
        F.col("_prev").alias("gap_start"),
        F.col(date_col).alias("gap_end"),
        F.col("_gap_days").alias("gap_days"),
    )
    weekly = activities.groupBy(
        *part, F.date_sub(F.to_date(date_col), (F.dayofweek(date_col) + 5) % 7).alias("_wk")
    ).agg(F.sum(volume_col).alias("_wk_vol"))
    joined = gaps.join(weekly, part) if part else gaps.crossJoin(weekly)
    in_lookback = (F.col("_wk") < F.col("gap_start")) & (
        F.datediff(F.col("gap_start"), F.col("_wk")) <= lookback_weeks * 7
    )
    return (
        joined.filter(in_lookback)
        .groupBy(*part, "gap_start", "gap_end", "gap_days")
        .agg(
            F.expr("percentile(_wk_vol, 0.5)").alias("pre_gap_median_weekly_volume"),
            F.count(F.lit(1)).alias("pre_gap_weeks"),
        )
    )
