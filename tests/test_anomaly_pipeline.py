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


# ---------------------------------------------------------------------------
# classify_anomaly_causes: the reference's full T4 cause chain
# (form_anomaly_detector.py:330-425) on a hand-built fixture.

from garmin_performance_analysis_spark.operators.anomaly import (  # noqa: E402
    classify_anomaly_causes,
)


def _cause_fixture(spark):
    """Five users, same form series (sustained 5-sec spike at secs 8-12),
    context engineered so each user exercises one cause branch:
    1 → elevation, 2 → pace, 3 → fatigue, 4 → isolated, 5 → isolated
    with NO context rows at all (empty-window defaults)."""
    form_rows = []
    for uid in (1, 2, 3, 4, 5):
        for s in range(20):
            v = 100.0 if 8 <= s <= 12 else 10.0
            form_rows.append((uid, "gct", s, v))
    form = spark.createDataFrame(
        form_rows, "user_id long, metric string, sec long, value double"
    )
    ctx = []
    for s in range(20):
        ctx.append((1, "elevation", s, 20.0 if s % 2 else 0.0))  # range 20 > 5
        ctx.append((2, "elevation", s, 1.0))
        ctx.append((3, "elevation", s, 1.0))
        ctx.append((4, "elevation", s, 1.0))
        ctx.append((2, "pace", s, 1.0 if s % 2 else 0.0))  # range 1 > 0.25
        ctx.append((3, "pace", s, 1.0))
        ctx.append((4, "pace", s, 1.0))
        ctx.append((3, "hr", s, 200.0 if s >= 10 else 100.0))  # -33% drift
        ctx.append((1, "hr", s, 100.0))
        ctx.append((2, "hr", s, 100.0))
        ctx.append((4, "hr", s, 100.0))
    # the operator contract: the form series rides along in context
    # under series == metric (all except user 5, who has NO context)
    for uid, m, s, v in form_rows:
        if uid != 5:
            ctx.append((uid, m, s, v))
    context = spark.createDataFrame(
        ctx, "user_id long, series string, sec long, val double"
    )
    return form, context


def test_cause_priority_chain(spark):
    form, context = _cause_fixture(spark)
    out = classify_anomaly_causes(
        form,
        context,
        z_threshold=1.0,
        magnitude_gates={"gct": 10.0},
        degradation_triggers={"gct": 5.0},
    )
    rows = out.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # every user flags exactly the 5-sec sustained spike
    assert {u: sorted(r["sec"] for r in v) for u, v in by_user.items()} == {
        u: [8, 9, 10, 11, 12] for u in (1, 2, 3, 4, 5)
    }
    causes = {u: {r["probable_cause"] for r in v} for u, v in by_user.items()}
    assert causes[1] == {"elevation_change"}
    assert causes[2] == {"pace_change"}
    assert causes[3] == {"fatigue"}
    assert causes[4] == {"isolated"}
    assert causes[5] == {"isolated"}
    # isolated anomalies carry no fabricated correlation (#666)
    assert all(r["correlation"] is None for r in by_user[4])
    # user 5 has no context rows: reference empty-window defaults = 0.0
    for r in by_user[5]:
        for c in (
            "elevation_change_5s",
            "pace_change_10s",
            "hr_drift_percent",
            "before_elevation",
            "after_elevation",
            "before_metric_avg",
            "after_metric_avg",
        ):
            assert r[c] == 0.0, (c, r[c])
    # ±30 context on the metric itself (reference _extract_context:
    # before excludes t, after includes it)
    r10 = next(r for r in by_user[1] if r["sec"] == 10)
    assert r10["before_metric_avg"] == pytest.approx(28.0)  # secs 0-9
    assert r10["after_metric_avg"] == pytest.approx(37.0)  # secs 10-19
    # severity: z ≈ 1.74 < 3.5 → low everywhere at default bands
    assert {r["severity"] for r in rows} == {"low"}


def test_degradation_halves_split_skips_nulls(spark):
    """The first/second-half degradation split positions its midpoint on
    NON-NULL values only (reference form_anomaly_detector.py:205-215
    strips None before halving; ADVICE r2).  Six leading null rows must
    not shift the midpoint into the spike — the null-stripped series is
    identical to the fatigue fixture, so the cause must stay fatigue."""
    form_rows = []
    for s in range(6):
        form_rows.append((3, "gct", s, None))  # sensor dropout prefix
    for s in range(20):
        v = 100.0 if 8 <= s <= 12 else 10.0
        form_rows.append((3, "gct", s + 6, v))
    form = spark.createDataFrame(
        form_rows, "user_id long, metric string, sec long, value double"
    )
    ctx = []
    for s in range(6, 26):
        ctx.append((3, "elevation", s, 1.0))
        ctx.append((3, "pace", s, 1.0))
        ctx.append((3, "hr", s, 200.0 if s - 6 >= 10 else 100.0))
    for uid, m, s, v in form_rows:
        ctx.append((uid, m, s, v))
    context = spark.createDataFrame(
        ctx, "user_id long, series string, sec long, val double"
    )
    out = classify_anomaly_causes(
        form,
        context,
        z_threshold=1.0,
        magnitude_gates={"gct": 10.0},
        degradation_triggers={"gct": 5.0},
    ).collect()
    assert sorted(r["sec"] for r in out) == [14, 15, 16, 17, 18]
    # null-counting midpoint would average spike rows into the first
    # half (diff < trigger) and decay to 'isolated'
    assert {r["probable_cause"] for r in out} == {"fatigue"}


def test_fatigue_requires_sustained_degradation(spark):
    """HR drift alone must NOT produce fatigue (#666): without a
    configured degradation trigger the metric can never be fatigue."""
    form, context = _cause_fixture(spark)
    out = classify_anomaly_causes(
        form.filter(F.col("user_id") == 3),
        context.filter(F.col("user_id") == 3),
        z_threshold=1.0,
        magnitude_gates={"gct": 10.0},
        degradation_triggers=None,  # no trigger configured
    )
    assert {r["probable_cause"] for r in out.collect()} == {"isolated"}
