"""Form-anomaly detection pipeline (SURVEY.md T2-T5) — the reference's
largest single operator (``mcp/rag/queries/form_anomaly_detector.py``,
1071 LoC of per-activity Python) re-expressed as one window/agg plan.

Stages (each a pure expression layer, shuffling once on the partition
key):

1. rolling centered baseline (W4)   — ``:147-179``
2. z-score + magnitude + worse-direction gates (T2) — ``:24-73,217-287``
3. sustained grouping with bounded adjacency (T3)  — ``:289-328``
4. per-event severity bands (T5)    — ``:690-786``
5. island cause classification (T4) — ``:181-215,330-425``: spike
   (extreme peak) vs drift (sustained elevation vs the early-session
   baseline) vs isolated.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import gaps_and_islands


def detect_anomalies(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    z_threshold: float = 2.5,
    magnitude_gate: float = 0.0,
    worse_is_high: bool = True,
    max_gap: int = 2,
    min_span: int = 3,
    baseline_n: int = 5,
    spike_z: float = 3.5,
    drift_pct: float = 0.10,
) -> DataFrame:
    """Sustained anomaly islands with severity and cause.

    ``order_col`` must be an integer ordinal (sequence position) per
    partition; adjacency and span gates follow the reference's
    inclusive span = last-first+1 semantics.

    Returns one row per island: bounds, size, peak z, severity of the
    peak (high >4.5-scaled band, then medium/low), and cause —
    ``spike`` when the peak z exceeds ``spike_z``, ``drift`` when the
    island mean sits ``drift_pct`` above the partition's first
    ``baseline_n`` values (the reference's first-5-minutes HR baseline,
    ``:330-425``), else ``isolated``.
    """
    wp = Window.partitionBy(*partition_cols)
    worder = wp.orderBy(order_col)

    mean = F.avg(value_col).over(wp)
    std = F.stddev_samp(value_col).over(wp)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    abs_dev = F.abs(F.col(value_col) - mean)
    direction_ok = (
        (F.col(value_col) > mean) if worse_is_high else (F.col(value_col) < mean)
    )
    flagged = (
        df.withColumn("_z", z)
        .withColumn("_flag", (F.abs(z) > z_threshold) & (abs_dev >= magnitude_gate) & direction_ok)
    )

    # early-session baseline: mean of the first `baseline_n` ordinals
    rn = F.row_number().over(worder)
    with_rn = flagged.withColumn("_rn", rn)
    baseline = with_rn.filter(F.col("_rn") <= baseline_n).groupBy(*partition_cols).agg(
        F.avg(value_col).alias("_baseline")
    )

    anomalous = with_rn.filter(F.col("_flag"))
    islands = gaps_and_islands(anomalous, partition_cols, order_col, max_gap=max_gap)
    keys = [*partition_cols, "island_id"]
    per_island = (
        islands.groupBy(*keys)
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.abs(F.col("_z"))).alias("max_abs_z"),
            F.avg(value_col).alias("island_mean"),
        )
        .filter(
            F.col("island_end").cast("long") - F.col("island_start").cast("long") + 1
            >= min_span
        )
    )
    severity = (
        F.when(F.col("max_abs_z") > 4.5, F.lit("high"))
        .when(F.col("max_abs_z") > 3.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    joined = per_island.join(baseline, list(partition_cols), "left")
    drift_cond = F.col("_baseline").isNotNull() & (
        F.col("island_mean") > F.col("_baseline") * (1.0 + drift_pct)
    )
    cause = (
        F.when(F.col("max_abs_z") > spike_z, F.lit("spike"))
        .when(drift_cond, F.lit("drift"))
        .otherwise(F.lit("isolated"))
    )
    return joined.select(
        *partition_cols,
        "island_id",
        "island_start",
        "island_end",
        "n_events",
        "max_abs_z",
        "island_mean",
        severity.alias("severity"),
        cause.alias("cause"),
    )
