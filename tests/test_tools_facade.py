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
             240.0, 8.0, 7.0, 5.0, 3.0, "2024-01", 300.0 * (i - 1), 300.0 * i)
            for i in range(1, 9)
        ],
        "activity_id long, split_index int, intensity_type string, pace_seconds_per_km double,"
        " heart_rate double, cadence double, power double, ground_contact_time double,"
        " vertical_oscillation double, vertical_ratio double, elevation_gain double,"
        " elevation_loss double, window string, start_time_s double, end_time_s double",
    )
    ts = spark.createDataFrame(
        [(1, s, s, 140.0 + (10.0 if 30 <= s < 40 else 0.0), 3.0) for s in range(120)]
        + [(a, s, s, 130.0 + a + (s / 30.0), 3.0) for a in (2, 3) for s in range(60)],
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
        [
            (1, d("2024-01-02"), 62.0),
            (2, d("2024-01-09"), 63.5),
            (3, d("2024-02-01"), 63.0),
        ],
        "measurement_id long, date date, weight_kg double",
    )
    vo2 = spark.createDataFrame(
        [(d("2024-01-02"), 52.0)], "date date, precise_value double"
    )
    daily_wellness = spark.createDataFrame(
        [(d(f"2024-01-{i:02d}"), 48.0 + (i % 5), 60.0 + i) for i in range(1, 21)],
        "date date, resting_heart_rate double, hrv double",
    )
    form_efficiency = spark.createDataFrame(
        [(1, 242.0, "良好")], "activity_id long, gct_avg double, gct_rating string"
    )
    form_evaluations = spark.createDataFrame(
        [(1, "gct", 4.0)], "activity_id long, metric string, stars double"
    )
    form_baseline_history = spark.createDataFrame(
        [("gct", "2024-01", -0.31), ("gct", "2024-02", -0.29)],
        "metric string, window string, slope double",
    )
    hr_efficiency = spark.createDataFrame(
        [(1, "Zone 2", "good")],
        "activity_id long, primary_zone string, distribution_rating string",
    )
    hr_zones = spark.createDataFrame(
        [(1, z, 100 + 20 * z, 119 + 20 * z, 60.0 * z) for z in range(1, 6)],
        "activity_id long, zone_number int, lower_bpm int, upper_bpm int, seconds_in_zone double",
    )
    lactate = spark.createDataFrame(
        [(d("2024-01-05"), 168.0)], "date date, threshold_hr double"
    )
    perf_trends = spark.createDataFrame(
        [(1, "steady", 0.043)],
        "activity_id long, structure string, decoupling double",
    )
    weather = spark.createDataFrame(
        [(1, 12.0, 7.0, 230.0)],
        "activity_id long, temp_c double, wind_kmh double, wind_dir_deg double",
    )
    athlete_profile = spark.createDataFrame(
        [(1, d("2024-01-01"), "v1"), (2, d("2024-01-05"), "v2")],
        "profile_id long, created_at date, payload string",
    )
    strength = spark.createDataFrame(
        [(d("2024-01-04"), '{"push": 3, "pull": 2}')],
        "date date, category_counts string",
    )
    activities = activities.withColumn(
        "avg_heart_rate", F.lit(150.0)
    ).withColumn("training_type", F.lit("easy"))
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
            "daily_wellness": daily_wellness,
            "form_efficiency": form_efficiency,
            "form_evaluations": form_evaluations,
            "form_baseline_history": form_baseline_history,
            "hr_efficiency": hr_efficiency,
            "heart_rate_zones": hr_zones,
            "lactate_threshold": lactate,
            "performance_trends": perf_trends,
            "weather": weather,
            "athlete_profile": athlete_profile,
            "strength_sessions": strength,
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


def test_physiology_point_readers(tools):
    assert tools.get_form_efficiency_summary(1).count() == 1
    assert tools.get_form_evaluations(1).count() == 1
    assert tools.get_hr_efficiency_analysis(1).count() == 1
    zones = tools.get_heart_rate_zones_detail(1).collect()
    assert [z["zone_number"] for z in zones] == [1, 2, 3, 4, 5]
    assert tools.get_vo2_max_data().count() == 1
    assert tools.get_lactate_threshold_data().count() == 1
    assert tools.get_performance_trends(1).count() == 1
    assert tools.get_weather_data(1).count() == 1
    trend = tools.get_form_baseline_trend("gct").collect()
    assert [r["window"] for r in trend] == ["2024-01", "2024-02"]


def test_metadata_date_resolution(tools):
    assert tools.get_activity_by_date("2024-01-03").collect()[0]["activity_id"] == 2
    assert str(
        tools.get_date_by_activity_id(2).collect()[0]["activity_date"]
    ) == "2024-01-03"


def test_recovery_and_wellness(tools):
    weekly = tools.get_recovery_trend().orderBy("week_start").collect()
    assert len(weekly) >= 2
    assert weekly[0]["delta"] is None and weekly[1]["delta"] is not None
    banded = tools.get_wellness_baseline_deviation(days_back=7).collect()
    assert any(r["baseline_z"] is not None for r in banded)
    status = tools.get_recovery_status().collect()
    assert len(status) == 1 and str(status[0]["date"]) == "2024-01-20"


def test_load_trend_and_risk(tools):
    assert tools.get_load_trend().count() == 0  # 2 weeks < min_points gate
    lt = tools.get_load_trend(min_points=2).collect()
    assert len(lt) == 1 and lt[0]["n"] == 2
    risk = tools.get_injury_risk().collect()[0]
    assert risk["injury_risk_band"] in ("low", "moderate", "high")
    ready = tools.get_race_readiness().collect()[0]
    assert ready["vo2max"] == 52.0


def test_athlete_versioned_reads(tools):
    prof = tools.get_athlete_profile().collect()
    assert len(prof) == 1 and prof[0]["payload"] == "v2"
    rev = tools.get_weekly_review("2024-01-01").collect()
    assert len(rev) == 1 and rev[0]["review_data"] == "v2"
    grown = tools.save_versioned(
        "athlete_profile",
        tools.spark.createDataFrame(
            [(3, datetime.date(2024, 2, 1), "v3")],
            "profile_id long, created_at date, payload string",
        ),
    )
    assert grown.count() == 3


def test_strength_and_distribution(tools):
    s = tools.get_strength_sessions("2024-01-01", "2024-01-31").collect()[0]
    assert s["category_counts"]["push"] == 3
    dist = {
        r["training_type"]: r["fraction"]
        for r in tools.get_training_type_distribution().collect()
    }
    assert abs(dist["easy"] - 1.0) < 1e-9


def test_split_ts_detail_and_anomaly_summary(tools):
    det = tools.get_split_time_series_detail(1, 1, ["heart_rate"]).collect()
    assert len(det) == 1 and det[0]["n"] > 0
    summ = tools.detect_form_anomalies_summary(1, "heart_rate", magnitude_gate=1.0)
    rows = summ.collect()
    assert all(r["severity"] in ("low", "medium", "high") for r in rows)


def test_prefetch_bundles_and_catchup(tools):
    ctx = tools.prefetch_activity_context(1)
    assert set(ctx) == {"activity", "splits", "performance_trends", "hr_zones", "weather"}
    assert ctx["activity"].count() == 1
    wctx = tools.prefetch_weekly_review_context("2024-01-01")
    assert wctx["activities"].count() == 2
    win = tools.get_catch_up_window("body_composition").collect()[0]
    assert str(win["window_start"]) == "2024-02-01"


def test_weight_economy_and_durability_trend(tools):
    assert tools.get_weight_economy_coupling().count() == 0  # n=3 < 10 gate
    we = tools.get_weight_economy_coupling(min_points=3).collect()
    assert len(we) == 1
    dt = tools.get_durability_trend().collect()
    assert len(dt) == 1 and dt[0]["n"] == 3


def test_interval_work_recovery_tool(tools):
    out = tools.interval_work_recovery(1).collect()
    assert len(out) == 1
    r = out[0]
    # 8 alternating single-split segments: 4 work (odd i), 4 recovery
    assert (r["work_count"], r["recovery_count"]) == (4, 4)
    # work HR avg over i=1,3,5,7 → 150+i → 154.0; recovery over 2,4,6,8 → 155.0
    assert r["avg_work_value"] == pytest.approx(154.0)
    assert r["avg_recovery_value"] == pytest.approx(155.0)
    # each pair: (work_hr - rec_hr) / (300 s / 60) = (151-152)/5 etc = -0.2
    assert r["avg_hr_recovery_rate"] == pytest.approx(-0.2)


def test_form_anomaly_causes_tool(tools):
    # heart_rate doubles as the form metric; no elevation/pace columns
    # exist on the fixture → those context windows default to 0 and the
    # cause falls through the chain (never elevation/pace)
    out = tools.get_form_anomaly_causes(
        1, metrics=("heart_rate",), hr_col="heart_rate", z=1.0
    ).collect()
    assert len(out) > 0
    assert {r["metric"] for r in out} == {"heart_rate"}
    # activity 1's fixture bump is at secs 30-39 (140 → 150)
    assert {r["sec"] for r in out} <= set(range(30, 40))
    assert all(r["probable_cause"] in ("fatigue", "isolated") for r in out)
    assert all(r["elevation_change_5s"] == 0.0 for r in out)


def test_every_reference_tool_is_mapped():
    """All 57 documented reference tools resolve to a real handler:
    a GarminTools method, or an existing module:callable for
    write-path / infra tools."""
    import importlib

    from garmin_performance_analysis_spark.tools import (
        REFERENCE_TOOL_MAP,
        GarminTools,
    )

    assert len(REFERENCE_TOOL_MAP) == 57
    for tool, target in REFERENCE_TOOL_MAP.items():
        if ":" in target:
            mod_name, fn = target.split(":")
            mod = importlib.import_module(
                f"garmin_performance_analysis_spark.{mod_name}"
            )
            assert callable(getattr(mod, fn)), (tool, target)
        else:
            assert callable(getattr(GarminTools, target)), (tool, target)
