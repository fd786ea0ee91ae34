"""M10/M11/M15 composite tests."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from garmin_performance_analysis_spark.operators.fitness import (
    detect_training_gaps,
    objective_fitness_curve,
    race_prediction_blend,
)


def test_fitness_curve_rolls_forward_and_decays(spark):
    rows = [(0, 50.0, 52.0), (30, 48.0, 53.0), (150, 45.0, None)]
    df = spark.createDataFrame(rows, "day_number int, vdot double, garmin_vdot double")
    out = {r["day_number"]: r for r in objective_fitness_curve(df).collect()}
    assert out[0]["fitness_vdot"] == 50.0
    assert out[30]["fitness_vdot"] == 50.0  # day-0 effort still in 90d window
    assert out[150]["fitness_vdot"] == 45.0  # old peak aged out
    assert out[30]["optimism_gap"] == pytest.approx(3.0)
    assert out[150]["optimism_gap"] is None


def test_race_prediction_blend_and_confidence(spark):
    df = spark.createDataFrame(
        [
            (1, 2400.0, 2430.0),  # within 3% -> high
            (2, 2400.0, 2600.0),  # disagree -> medium
            (3, 2400.0, None),    # single source -> low
        ],
        "id long, curve double, vdot double",
    )
    blended, conf = race_prediction_blend(F.col("curve"), F.col("vdot"))
    out = {r["id"]: r for r in df.select("id", blended.alias("t"), conf.alias("c")).collect()}
    assert out[1]["c"] == "high" and out[1]["t"] == pytest.approx(0.6 * 2400 + 0.4 * 2430)
    assert out[2]["c"] == "medium"
    assert out[3]["c"] == "low" and out[3]["t"] == 2400.0


def test_training_gap_detection(spark):
    d = datetime.date.fromisoformat
    rows = (
        [(d(f"2024-01-{i:02d}"), 10.0) for i in range(1, 20, 2)]  # regular
        + [(d("2024-02-15"), 8.0)]  # 27-day gap
    )
    df = spark.createDataFrame(rows, "activity_date date, total_distance_km double")
    gaps = detect_training_gaps(df).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert g["gap_days"] == 27
    assert g["gap_start"] == d("2024-01-19") and g["gap_end"] == d("2024-02-15")
    assert g["pre_gap_median_weekly_volume"] > 0
