"""Material-event sweep as a persisted silver table (SURVEY.md T8).

The reference scans 90 days of activities (~0.5 s each, ~17 s per
sweep) and memoizes results in process memory
(``mcp/database/db_reader.py:38-44,1133-1266``;
``mcp/analysis/form_events.py:46-127``).  The Spark-idiomatic
replacement is a **persisted table refreshed incrementally**: detect
anomalies once per new activity window, append to a parquet silver
table keyed by day, and derive the acute:chronic event-rate ratio with
the same rolling windows the ACWR uses — no driver-side cache, any
number of athletes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import rolling_range_sum


def material_event_rates(
    events: DataFrame,
    partition_cols: Sequence[str],
    day_col: str,
    severity_col: str = "severity",
    acute_days: int = 7,
    chronic_days: int = 28,
) -> DataFrame:
    """Per-day material-event counts → acute (7d) vs chronic (28d,
    normalized to the acute window length) rates and their ratio.

    "Material" = severity above ``low`` — the reference's material-
    severe gate before pooling (``form_events.py:46-127``)."""
    material = events.filter(F.col(severity_col) != "low")
    daily = material.groupBy(*partition_cols, day_col).agg(
        F.count(F.lit(1)).alias("n_material")
    )
    acute = rolling_range_sum(daily, partition_cols, day_col, "n_material", acute_days - 1, "acute_n")
    both = rolling_range_sum(acute, partition_cols, day_col, "n_material", chronic_days - 1, "chronic_n")
    chronic_rate = F.col("chronic_n") / (chronic_days / acute_days)
    ratio = F.when(chronic_rate > 0, F.col("acute_n") / chronic_rate)
    return both.withColumn("chronic_rate", chronic_rate).withColumn(
        "event_rate_ratio", ratio
    )


def refresh_material_events(
    new_anomalies: DataFrame,
    spark,
    sink_path: str,
    cursor_col: str,
) -> int:
    """Incrementally append newly-detected material events to the
    persisted silver table (idempotent on the cursor — re-running with
    no new data is a no-op)."""
    from ..streaming.ingest import incremental_append

    return incremental_append(new_anomalies, spark, sink_path, cursor_col)
