"""Smoke + semantics tests for the GarminTools facade over small silver
fixtures — the reference's tool surface end-to-end."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from garmin_performance_analysis_spark.tools import GarminTools


def d(s):
    return datetime.date.fromisoformat(s)


@pytest.fixture(scope="module")
def tools(spark):
    activities = spark.createDataFrame(
        [
            (1, d("2024-01-01"), 10.0, 300.0),
            (2, d("2024-01-03"), 12.0, 310.0),
            (3, d("2024-01-10"), 8.0, 290.0),
        ],
        "activity_id long, activity_date date, total_distance_km double, avg_pace_seconds_per_km double",
    )
    splits = spark.createDataFrame(
        [
            (1, i, "ACTIVE" if i % 2 else "RECOVERY", 300.0 + i, 150.0 + i, 180.0, 250.0,
             240.0, 8.0, 7.0, 5.0, 3.0, "2024-01")
            for i in range(1, 9)
        ],
        "activity_id long, split_index int, intensity_type string, pace_seconds_per_km double,"
        " heart_rate double, cadence double, power double, ground_contact_time double,"
        " vertical_oscillation double, vertical_ratio double, elevation_gain double,"
        " elevation_loss double, window string",
    )
    ts = spark.createDataFrame(
        [(1, s, s, 140.0 + (10.0 if 30 <= s < 40 else 0.0), 3.0) for s in range(120)],
        "activity_id long, seq_no int, timestamp_s int, heart_rate double, speed double",
    )
    weekly_reviews = spark.createDataFrame(
        [
            (1, d("2024-01-01"), d("2024-01-01"), "v1"),
            (2, d("2024-01-01"), d("2024-01-02"), "v2"),
        ],
        "review_id long, week_start_date date, created_at date, review_data string",
    )
    section_analyses = spark.createDataFrame(
        [(1, "split"), (1, "phase"), (1, "summary"), (1, "efficiency"), (1, "environment"), (2, "split")],
        "activity_id long, section_type string",
    )
    body_comp = spark.createDataFrame(
        [(1, d("2024-01-02"), 62.0), (2, d("2024-02-01"), 63.0)],
        "measurement_id long, date date, weight_kg double",
    )
    vo2 = spark.createDataFrame(
        [(d("2024-01-02"), 52.0)], "date date, precise_value double"
    )
    return GarminTools(
        spark,
        {
            "activities": activities,
            "splits": splits,
            "time_series_metrics": ts,
            "weekly_reviews": weekly_reviews,
            "section_analyses": section_analyses,
            "body_composition": body_comp,
            "vo2_max": vo2,
        },
    )


def test_point_and_range_lookups(tools):
    assert tools.get_activity(1).count() == 1
    assert tools.get_activities_by_date_range("2024-01-01", "2024-01-05").count() == 2
    assert tools.get_activities_bulk([1, 3]).count() == 2


def test_splits_statistics_modes(tools):
    full = tools.get_splits_comprehensive(1)
    assert full.count() == 8
    statsrow = tools.get_splits_comprehensive(1, statistics_only=True).collect()[0]
    assert statsrow["pace_seconds_per_km_avg"] == pytest.approx(304.5)
    assert tools.get_splits_form_metrics(1).columns[1] == "n"


def test_time_series_tools(tools):
    st = tools.get_time_series_stats(1, 0, 60, ["heart_rate"]).collect()[0]
    assert st["n"] == 60
    outliers = tools.detect_time_series_outliers(1, "heart_rate", 2.0)
    assert outliers.count() == 10  # the injected 10-second spike
    assert tools.downsample_time_series(1, 10).count() <= 12


def test_load_and_calendar(tools):
    acwr = tools.get_acwr().orderBy("dn").collect()
    assert acwr[-1]["acute"] == pytest.approx(8.0)  # only day-10 run in last 7d
    assert acwr[-1]["acwr"] == pytest.approx(8.0 / (30.0 / 4.0))
    wk = tools.get_weekly_volume().orderBy("week_start").collect()
    assert wk[0]["total_distance_km"] == pytest.approx(22.0)


def test_durability_decoupling(tools):
    row = tools.get_durability_decoupling(1).collect()[0]
    # HR higher in first half (spike at 30-40s) -> negative drift
    assert row["heart_rate_drift"] < 0


def test_versioned_reads_and_completeness(tools):
    latest = tools.get_latest_weekly_review().collect()
    assert len(latest) == 1 and latest[0]["review_data"] == "v2"
    missing = {r["activity_id"]: r["n_present"] for r in tools.find_unanalyzed_activities().collect()}
    assert 1 not in missing  # fully analyzed
    assert missing[2] == 1 and missing[3] == 0


def test_asof_tools(tools):
    w = {r["activity_id"]: r["weight_kg"] for r in tools.activities_with_nearest_weight().collect()}
    assert w[1] == 62.0 and w[2] == 62.0
    v = {r["activity_id"]: r["asof_vo2max_value"] for r in tools.vo2max_asof().collect()}
    assert v[1] is None  # no vo2max at-or-before Jan 1
    assert v[2] == 52.0 and v[3] == 52.0


def test_similarity_and_intervals(tools):
    sim = tools.find_similar_activities(300.0, 10.0, k=2).collect()
    assert sim[0]["activity_id"] == 1  # exact target match ranks first
    iv = tools.interval_analysis(1).collect()[0]
    assert iv["n_work_segments"] == 4


def test_profiler_and_sql(tools, tmp_path):
    prof = tools.profile_table("activities", ["total_distance_km"]).collect()[0]
    assert prof["n_rows"] == 3 and prof["stat_max"] == 12.0
    hist = tools.histogram("splits", "pace_seconds_per_km", bins=4)
    assert hist.count() <= 4
    out = tools.sql("SELECT COUNT(*) AS n FROM activities").collect()[0]["n"]
    assert out == 3
    assert tools.export(tools.get_activity(1), str(tmp_path / "exp"), max_rows=10) == 1
