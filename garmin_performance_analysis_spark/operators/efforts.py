"""Best-effort analysis: Pareto frontier + critical-speed fit
(SURVEY.md M9) and interval segmentation (T6).

Reference: ``mcp/objective_fitness/critical_speed.py:50-157`` takes the
(duration, distance) efforts in a window, removes dominated points
(another effort with <= duration and >= distance), and least-squares
fits ``d = CS·t + D'``.  The dominance filter is a self-join here (the
effort sets per group are small after the band filter — the join is
broadcast); the LS fit reuses the closed-form OLS moments.

The dominance filter is a 2-D skyline query; dedicated Spark skyline
operators exist (cf. "Integration of Skyline Queries into Spark SQL",
EDBT 2023) with grid/angular partitioning for high dimensions — at this
operator's scale (per-group efforts after the 2-45 min band filter) the
anti-join formulation is simpler and stays in Catalyst.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..harness.registry import dec_avg

from .regression import linregress_by_group


def pareto_frontier(
    df: DataFrame,
    group_cols: Sequence[str],
    t_col: str,
    d_col: str,
) -> DataFrame:
    """Non-dominated efforts per group: drop any row for which another
    row has ``t <= t AND d >= d`` with at least one strict inequality
    (``critical_speed.py:63-88``)."""
    a = df.alias("a")
    b = df.alias("b")
    cond = F.lit(True)
    for k in group_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    dominated = (
        cond
        & (F.col(f"b.{t_col}") <= F.col(f"a.{t_col}"))
        & (F.col(f"b.{d_col}") >= F.col(f"a.{d_col}"))
        & (
            (F.col(f"b.{t_col}") < F.col(f"a.{t_col}"))
            | (F.col(f"b.{d_col}") > F.col(f"a.{d_col}"))
        )
    )
    return a.join(b, dominated, "left_anti")


def critical_speed_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    t_col: str,
    d_col: str,
    t_min: float = 2.0,
    t_max: float = 45.0,
    min_points: int = 3,
) -> DataFrame:
    """Per-group critical speed: band-filter efforts to [t_min, t_max]
    minutes, keep the Pareto frontier, fit ``d = CS·t + D'``.
    CS = slope (m/min), D' = intercept (m)."""
    banded = df.filter(F.col(t_col).between(t_min, t_max))
    frontier = pareto_frontier(banded, group_cols, t_col, d_col)
    fit = linregress_by_group(frontier, group_cols, t_col, d_col, min_points)
    return fit.select(
        *group_cols,
        F.col("n").alias("n_frontier"),
        F.col("slope").alias("critical_speed"),
        F.col("intercept").alias("d_prime"),
        "r2",
    )


def interval_segments(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    work_flag,
) -> DataFrame:
    """T6 interval (work/recovery) segmentation: consecutive rows with
    the same work/recovery state collapse into segments
    (``mcp/rag/queries/interval_analysis.py:25-120``).

    Change-detection islands: segment id = running count of state
    changes; one window + one groupBy.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(order_col)
    state = work_flag.cast("int")
    changed = F.when(
        F.lag(state, 1).over(w).isNull() | (F.lag(state, 1).over(w) != state), 1
    ).otherwise(0)
    seg = F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("_state", state).withColumn("segment_id", seg)


def interval_fatigue(
    segments: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """T6 fatigue readout: per group, first-vs-last *work* segment
    average delta (``interval_analysis.py:150-230``: last-rep vs
    first-rep comparison)."""
    from pyspark.sql import Window

    keys = [*group_cols, "segment_id"]
    per_seg = (
        segments.groupBy(*keys)
        .agg(
            F.max("_state").alias("is_work"),
            # DECIMAL-exact avg: plain avg over doubles wobbles with
            # shuffle fetch order and flips 6dp roundings (lesson 5;
            # seen as a rare in-suite t6 parity flake)
            dec_avg(F.col(value_col)).alias("seg_avg"),
            F.count(F.lit(1)).alias("seg_rows"),
        )
    )
    work = per_seg.filter(F.col("is_work") == 1)
    w_first = Window.partitionBy(*group_cols).orderBy(F.col("segment_id").asc())
    w_last = Window.partitionBy(*group_cols).orderBy(F.col("segment_id").desc())
    ranked = work.withColumn("_rf", F.row_number().over(w_first)).withColumn(
        "_rl", F.row_number().over(w_last)
    )
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_work_segments"),
        F.max(F.when(F.col("_rf") == 1, F.col("seg_avg"))).alias("first_work_avg"),
        F.max(F.when(F.col("_rl") == 1, F.col("seg_avg"))).alias("last_work_avg"),
        (
            F.max(F.when(F.col("_rl") == 1, F.col("seg_avg")))
            - F.max(F.when(F.col("_rf") == 1, F.col("seg_avg")))
        ).alias("fatigue_delta"),
    )


def work_recovery_comparison(
    segments: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    time_col: str,
    duration_col: str | None = None,
) -> DataFrame:
    """T6 work/recovery comparison + HR recovery rate
    (``mcp/rag/queries/interval_analysis.py:149-329``).

    Per group: counts and mean segment value for work vs recovery
    segments, plus the mean HR-recovery rate.  The reference pairs the
    i-th WORK interval with the i-th RECOVERY interval (ordinal within
    each type, not adjacency — ``:305-315``); each pair's rate is
    (work_avg − recovery_avg) / recovery_duration_min, pairs with a
    non-positive recovery duration are skipped (``:149-183``), and
    groups lacking either segment type emit no row (``:297-303``).

    ``time_col`` must be numeric seconds; a segment's duration is its
    last-minus-first time — right for point-event series.  When rows
    carry explicit durations (the reference's splits have start/end
    per lap), pass ``duration_col``: the segment duration is then the
    SUM of row durations, which stays correct for single-row segments
    (span would be 0).  Shape: one groupBy to per-segment rows
    (tiny), then rank-joins on the ordinal — no pass over the raw rows
    after the first aggregation.
    """
    from pyspark.sql import Window

    keys = [*group_cols, "segment_id"]
    dur = (
        F.sum(duration_col)
        if duration_col is not None
        else (F.max(time_col) - F.min(time_col))
    )
    per_seg = segments.groupBy(*keys).agg(
        F.max("_state").alias("is_work"),
        # DECIMAL-exact at every averaging level (see interval_fatigue)
        dec_avg(F.col(value_col)).alias("seg_avg"),
        dur.alias("dur_s"),
    )
    wrank = Window.partitionBy(*group_cols).orderBy("segment_id")
    work = per_seg.filter(F.col("is_work") == 1).withColumn(
        "rn", F.row_number().over(wrank)
    )
    rec = per_seg.filter(F.col("is_work") == 0).withColumn(
        "rn", F.row_number().over(wrank)
    )
    pairs = (
        work.select(*group_cols, "rn", F.col("seg_avg").alias("w_avg"))
        .join(
            rec.select(
                *group_cols,
                "rn",
                F.col("seg_avg").alias("r_avg"),
                F.col("dur_s").alias("r_dur_s"),
            ),
            [*group_cols, "rn"],
        )
        .filter(F.col("r_dur_s") > 0)
        .withColumn(
            "rate",
            (F.col("w_avg") - F.col("r_avg")) / (F.col("r_dur_s") / 60.0),
        )
    )
    w_sum = work.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("work_count"),
        dec_avg(F.col("seg_avg")).alias("avg_work_value"),
    )
    r_sum = rec.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("recovery_count"),
        dec_avg(F.col("seg_avg")).alias("avg_recovery_value"),
    )
    rate_sum = pairs.groupBy(*group_cols).agg(
        dec_avg(F.col("rate")).alias("avg_hr_recovery_rate")
    )
    return (
        w_sum.join(r_sum, list(group_cols))  # inner: both types required
        .join(rate_sum, list(group_cols), "left")
        .select(
            *group_cols,
            "work_count",
            "recovery_count",
            "avg_work_value",
            "avg_recovery_value",
            "avg_hr_recovery_rate",
        )
    )
