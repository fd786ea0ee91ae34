"""Leave-one-out regression fragility (SURVEY.md M2).

Reference: ``mcp/database/readers/durability.py:473-557`` re-fits the
trend n times, dropping each point, to flag slope-direction flips and
report the max-|Δslope| leverage point.

The reference's loop is O(n²) Python; here each LOO slope comes from
*sufficient statistics* — group sums minus the held-out point — so the
whole analysis is one window pass + one aggregation, O(n), fully
distributed and exactly equal to the re-fit (algebraic identity, not an
approximation).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def loo_slope_fragility(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    min_points: int = 4,
) -> DataFrame:
    """Per-group: full-fit slope, LOO direction-flip count, max |Δslope|
    and its leverage x.

    slope_{-i} = (n' Sxy' - Sx' Sy') / (n' Sxx' - Sx'²) with the primed
    sums = group sums minus point i.
    """
    x, y = F.col(x_col), F.col(y_col)
    rows = df.filter(x.isNotNull() & y.isNotNull())
    w = Window.partitionBy(*group_cols)
    stats = (
        rows.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_sx", F.sum(x).over(w))
        .withColumn("_sy", F.sum(y).over(w))
        .withColumn("_sxx", F.sum(x * x).over(w))
        .withColumn("_sxy", F.sum(x * y).over(w))
    )
    n, sx, sy, sxx, sxy = (
        F.col("_n"),
        F.col("_sx"),
        F.col("_sy"),
        F.col("_sxx"),
        F.col("_sxy"),
    )
    slope_full = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    np_, sxp, syp = n - 1, sx - x, sy - y
    sxxp, sxyp = sxx - x * x, sxy - x * y
    denom = np_ * sxxp - sxp * sxp
    slope_loo = F.when(denom != 0, (np_ * sxyp - sxp * syp) / denom)
    delta = F.abs(slope_loo - slope_full)
    # sign comparison guarded away from 0 so float noise can't flip the
    # flag differently across engines
    flips = F.when(
        slope_loo.isNotNull()
        & (F.abs(slope_loo) > 1e-9)
        & (F.abs(slope_full) > 1e-9)
        & (F.signum(slope_loo) != F.signum(slope_full)),
        1,
    ).otherwise(0)
    per_point = stats.select(
        *group_cols,
        x.alias("_x"),
        slope_full.alias("_slope"),
        slope_loo.alias("_slope_loo"),
        delta.alias("_delta"),
        flips.alias("_flip"),
        n.alias("_gn"),
    ).filter(F.col("_gn") >= min_points)
    rank_w = Window.partitionBy(*group_cols).orderBy(
        F.col("_delta").desc(), F.col("_x").asc()
    )
    ranked = per_point.withColumn("_rn", F.row_number().over(rank_w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.max("_slope").alias("slope"),
            F.max("_gn").alias("n"),
            F.sum("_flip").alias("direction_flips"),
            F.max("_delta").alias("max_delta_slope"),
            F.max(F.when(F.col("_rn") == 1, F.col("_x"))).alias("leverage_x"),
        )
    )
