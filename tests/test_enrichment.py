"""D8/D9/D10 composite enrichment tests against reference semantics
(thresholds, label strings, tie-breaks, GPS-fragment CV exclusion,
interval structure classification)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmin_performance_analysis_spark.operators.enrichment import (
    build_form_efficiency,
    build_hr_efficiency,
    build_performance_trends,
    phase_weighted_stats,
)


def _splits(spark, rows):
    return spark.createDataFrame(
        rows,
        "activity_id long, split_index int, ground_contact_time double, "
        "vertical_oscillation double, vertical_ratio double",
    )


def test_form_efficiency_ratings_and_trend(spark):
    rows = [
        (1, i, 230.0 + i, 8.0 + 0.05 * i, 7.5) for i in range(1, 9)
    ]
    out = build_form_efficiency(_splits(spark, rows)).collect()[0]
    assert out["gct_rating"] == "★★★★☆"  # avg 234.5 < 240
    assert out["vo_rating"] == "★★★☆☆"  # avg ~8.2 -> 8-10 band
    assert out["gct_evaluation"].startswith("Excellent (234ms")
    assert out["vo_trend"].startswith("Very stable (")
    assert "consistent" in out["vo_trend"]
    assert out["gct_std"] > 0


def test_form_efficiency_single_split_zero_std(spark):
    out = build_form_efficiency(_splits(spark, [(1, 1, 250.0, 9.0, 8.0)])).collect()[0]
    assert out["gct_std"] == 0.0
    assert out["vo_trend"] == "Insufficient data (1 splits)"


def test_form_efficiency_fatigue_trend_string(spark):
    rows = [(1, i, 250.0, (7.0 if i <= 3 else 9.0), 8.0) for i in range(1, 7)]
    out = build_form_efficiency(_splits(spark, rows)).collect()[0]
    assert "increasing (+" in out["vo_trend"]
    assert "fatigue indicator" in out["vo_trend"]


def _zones(spark, pcts, total=3600.0):
    rows = [(1, z, total * p / 100.0) for z, p in enumerate(pcts, start=1)]
    return spark.createDataFrame(
        rows, "activity_id long, zone_number int, time_in_zone_seconds double"
    )


def _meta(spark, training_type, avg=140, mx=150, mn=120):
    return spark.createDataFrame(
        [(1, training_type, avg, mx, mn)],
        "activity_id long, training_type string, avg_hr int, max_hr int, min_hr int",
    )


def test_hr_efficiency_easy_excellent(spark):
    out = build_hr_efficiency(
        _zones(spark, [50, 45, 5, 0, 0]), _meta(spark, "aerobic_base")
    ).collect()[0]
    assert out["intensity_category"] == "easy"
    assert out["zone_distribution_rating"] == "Excellent"  # z1+z2 = 95
    assert out["primary_zone"] == "Zone 1"
    assert out["training_quality"] == "Excellent"
    assert out["hr_stability"] == "優秀"  # range 30/140 < 0.3


def test_hr_efficiency_moderate_refinement(spark):
    # aerobic_base label but Zone3-dominant: refined to moderate, judged
    # on the Zone2-3 band instead of failing the easy Zone1-2 test
    out = build_hr_efficiency(
        _zones(spark, [10, 25, 60, 5, 0]), _meta(spark, "aerobic_base")
    ).collect()[0]
    assert out["intensity_category"] == "moderate"
    assert out["zone_distribution_rating"] == "Excellent"  # z2+z3 = 85
    assert out["primary_zone"] == "Zone 3"


def test_hr_efficiency_vo2_and_flags(spark):
    out = build_hr_efficiency(
        _zones(spark, [5, 10, 20, 40, 25]), _meta(spark, "vo2max", avg=160, mx=190, mn=110)
    ).collect()[0]
    assert out["intensity_category"] == "vo2max"
    assert out["zone_distribution_rating"] == "Excellent"  # z4+z5 = 65
    assert bool(out["zone4_threshold_work"]) is True
    assert bool(out["zone2_focus"]) is False
    assert out["hr_stability"] == "変動あり"  # range 80/160 = 0.5


def test_hr_efficiency_primary_zone_tie_prefers_lower(spark):
    out = build_hr_efficiency(
        _zones(spark, [40, 40, 20, 0, 0]), _meta(spark, None)
    ).collect()[0]
    assert out["primary_zone"] == "Zone 1"
    assert out["intensity_category"] == "unknown"


PT_SCHEMA = (
    "activity_id long, split_index int, intensity_type string, "
    "pace_seconds_per_km double, heart_rate double, distance double, duration_seconds double"
)


def test_performance_trends_interval_structure_and_drift(spark):
    rows = [
        (1, 1, "WARMUP", 420.0, 120.0, 1.0, 420.0),
        (1, 2, "ACTIVE", 240.0, 160.0, 1.0, 240.0),
        (1, 3, "REST", 480.0, 130.0, 0.4, 192.0),
        (1, 4, "ACTIVE", 240.0, 166.0, 1.0, 240.0),
        (1, 5, "REST", 480.0, 132.0, 0.4, 192.0),
        (1, 6, "ACTIVE", 240.0, 172.0, 1.0, 240.0),
        (1, 7, "COOLDOWN", 430.0, 125.0, 1.0, 430.0),
    ]
    out = build_performance_trends(spark.createDataFrame(rows, PT_SCHEMA)).collect()[0]
    assert out["workout_structure"] == "interval"
    # same pace, HR rising -> positive drift
    assert out["rep_hr_drift_pct"] > 0
    assert out["n_work_laps"] == 3 and out["n_rest_laps"] == 2


def test_performance_trends_steady_and_fragment_exclusion(spark):
    # 5 full-km steady laps + one 0.04km GPS fragment with a wild pace;
    # the fragment must not poison the CV
    rows = [
        (1, i, "ACTIVE", 300.0 + i, 150.0, 1.0, 300.0) for i in range(1, 6)
    ] + [(1, 6, "ACTIVE", 900.0, 150.0, 0.04, 36.0)]
    df = spark.createDataFrame(rows, PT_SCHEMA)
    out = build_performance_trends(df).collect()[0]
    assert out["workout_structure"] == "steady"
    assert out["pace_consistency"] < 0.01  # fragment excluded
    # sanity: including the fragment would blow CV past 0.5
    rows_all = [(r[0], r[1], r[2], r[3], r[4], 1.0, r[6]) for r in rows]
    out_all = build_performance_trends(spark.createDataFrame(rows_all, PT_SCHEMA)).collect()[0]
    assert out_all["pace_consistency"] > 0.5


def test_phase_weighted_stats(spark):
    rows = [
        (1, 1, "WARMUP", 420.0, 120.0, 1.0, 420.0),
        (1, 2, "ACTIVE", 240.0, 160.0, 2.0, 480.0),
        (1, 3, "ACTIVE", 300.0, 150.0, 1.0, 300.0),
    ]
    out = {
        r["phase"]: r
        for r in phase_weighted_stats(spark.createDataFrame(rows, PT_SCHEMA)).collect()
    }
    # distance-weighted pace: (240*2 + 300*1) / 3 = 260
    assert out["run"]["avg_pace_seconds_per_km"] == pytest.approx(260.0)
    # time-weighted HR: (160*480 + 150*300) / 780
    assert out["run"]["avg_hr"] == pytest.approx((160 * 480 + 150 * 300) / 780)
    assert out["run"]["splits_csv"] == "2,3"
    assert out["warmup"]["splits_csv"] == "1"
