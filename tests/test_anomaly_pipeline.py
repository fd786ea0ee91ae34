"""Unit tests for the composed anomaly detector (T2-T5) and the
material-event silver table (T8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from garmin_performance_analysis_spark.operators.anomaly import detect_anomalies
from garmin_performance_analysis_spark.operators.material_events import (
    material_event_rates,
    refresh_material_events,
)


def _series(spark, values):
    return spark.createDataFrame(
        [(1, i + 1, float(v)) for i, v in enumerate(values)],
        "user_id long, seq int, value double",
    )


def test_sustained_spike_is_detected_and_classified(spark):
    # flat baseline with a sustained 3-point spike: one island, spike cause
    vals = [10, 10, 10, 10, 10, 10, 10, 10, 40, 41, 42, 10, 10, 10, 10, 10]
    out = detect_anomalies(
        _series(spark, vals), ["user_id"], "seq", "value",
        z_threshold=1.5, min_span=3, spike_z=2.0,
    ).collect()
    assert len(out) == 1
    isl = out[0]
    assert (isl["island_start"], isl["island_end"]) == (9, 11)
    assert isl["cause"] == "spike"


def test_brief_blip_filtered_by_span(spark):
    vals = [10, 10, 10, 10, 40, 10, 10, 10, 10, 10, 10, 10]
    out = detect_anomalies(
        _series(spark, vals), ["user_id"], "seq", "value",
        z_threshold=1.5, min_span=3,
    ).collect()
    assert out == []  # single-point blip: span 1 < 3


def test_low_direction_not_flagged_when_worse_is_high(spark):
    vals = [10, 10, 10, 10, 0.1, 0.2, 0.1, 10, 10, 10, 10, 10]
    out = detect_anomalies(
        _series(spark, vals), ["user_id"], "seq", "value",
        z_threshold=1.0, min_span=2,
    ).collect()
    assert out == []  # deviations are LOW-side; worse_is_high gates them


def test_material_event_rates_and_refresh(spark, tmp_path):
    rows = [
        (1, d, "medium") for d in [1, 2, 3, 25, 26, 27]
    ] + [(1, 26, "low")]
    ev = spark.createDataFrame(rows, "user_id long, day int, severity string")
    rates = {r["day"]: r for r in material_event_rates(ev, ["user_id"], "day").collect()}
    # day 27: acute window (21..27) has 3 events; chronic (0..27) has 6
    assert rates[27]["acute_n"] == 3 and rates[27]["chronic_n"] == 6
    assert rates[27]["event_rate_ratio"] == pytest.approx(3 / (6 / 4))
    # low-severity events are excluded from the material count
    assert rates[26]["n_material"] == 1

    sink = str(tmp_path / "material_events")
    n1 = refresh_material_events(ev, spark, sink, "day")
    assert n1 == 7
    assert refresh_material_events(ev, spark, sink, "day") == 0  # idempotent
