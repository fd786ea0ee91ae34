"""Composite injury-risk fusion (SURVEY.md M12) as column expressions.

Reference: ``mcp/analysis/injury_risk.py:33-239`` — weighted fusion of
four signals (ACWR .40, durability .25, wellness .20, form-anomaly .15)
with piecewise-linear risk ramps, *missing-factor renormalization* (the
available weights rescale to sum 1), a 0-100 score, and band
classification (<30 low / <=60 moderate / else high).

Everything is ``when/otherwise`` arithmetic over a joined signal frame,
so risk scoring runs at full scan speed for any number of athletes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEIGHTS = {"acwr": 0.40, "durability": 0.25, "wellness": 0.20, "form_anomaly": 0.15}


def acwr_risk(ratio: Column) -> Column:
    """Piecewise-linear ACWR ramp: <=1.3 safe (0), 1.5 -> 0.5, >=1.8 -> 1."""
    return (
        F.when(ratio.isNull(), F.lit(None).cast("double"))
        .when(ratio <= 1.3, F.lit(0.0))
        .when(ratio >= 1.8, F.lit(1.0))
        .when(ratio <= 1.5, (ratio - 1.3) / (1.5 - 1.3) * 0.5)
        .otherwise(0.5 + (ratio - 1.5) / (1.8 - 1.5) * 0.5)
    )


def durability_risk(direction: Column) -> Column:
    """worsening -> 1, improving/stable -> 0, insufficient -> NULL."""
    return (
        F.when(direction.isNull() | (direction == "insufficient_data"), F.lit(None).cast("double"))
        .when(direction == "worsening", F.lit(1.0))
        .otherwise(F.lit(0.0))
    )


def wellness_risk(adverse_count: Column, usable_count: Column) -> Column:
    """Fraction of usable wellness baselines in adverse deviation."""
    return F.when(usable_count > 0, adverse_count / usable_count)


def form_anomaly_risk(event_rate_ratio: Column, baseline_rate: Column) -> Column:
    """Acute:chronic material-event-rate ramp: <=1.2 safe, >=2.0
    saturated; baseline rates below 0.2 events/h are too sparse -> NULL."""
    return (
        F.when(
            event_rate_ratio.isNull() | (baseline_rate < 0.2),
            F.lit(None).cast("double"),
        )
        .when(event_rate_ratio <= 1.2, F.lit(0.0))
        .when(event_rate_ratio >= 2.0, F.lit(1.0))
        .otherwise((event_rate_ratio - 1.2) / (2.0 - 1.2))
    )


def composite_injury_risk(
    signals: DataFrame,
    acwr_col: str = "acwr_risk",
    durability_col: str = "durability_risk",
    wellness_col: str = "wellness_risk",
    form_col: str = "form_risk",
) -> DataFrame:
    """Fuse the four (nullable) risk fractions: weights renormalize over
    the available factors, score = weighted mean × 100, then band."""
    cols = {
        acwr_col: WEIGHTS["acwr"],
        durability_col: WEIGHTS["durability"],
        wellness_col: WEIGHTS["wellness"],
        form_col: WEIGHTS["form_anomaly"],
    }
    avail_weight = sum(
        F.when(F.col(c).isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
        for c, w in cols.items()
    )
    weighted = sum(
        F.when(F.col(c).isNotNull(), F.col(c) * F.lit(w)).otherwise(F.lit(0.0))
        for c, w in cols.items()
    )
    score = F.when(avail_weight > 0, weighted / avail_weight * 100.0)
    band = (
        F.when(score.isNull(), F.lit(None).cast("string"))
        .when(score < 30, F.lit("low"))
        .when(score <= 60, F.lit("moderate"))
        .otherwise(F.lit("high"))
    )
    return signals.withColumn("injury_risk_score", score).withColumn(
        "injury_risk_band", band
    )
