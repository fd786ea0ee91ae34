"""Property test: the full T4 cause-classification operator against a
from-scratch Python mirror of the reference's per-activity algorithm
(``form_anomaly_detector.py:147-477``) on random series.

The SQL oracle proves Spark ≡ DuckDB on one query shape; this proves
the OPERATOR ≡ the reference's dense-array loop semantics (rolling
[i-w, i+w) windows, gate order, sustained-run spans, cause priority,
context windows) across random inputs — the strongest parity statement
available for a non-SQL source algorithm.
"""

from __future__ import annotations

import math
import random

import pytest

from garmin_performance_analysis_spark.operators.anomaly import (
    classify_anomaly_causes,
)

ROLL_W = 30
Z_THR = 0.8
GATE = 2.0
TRIGGER = 1.0
MAX_GAP = 2
MIN_SPAN = 5


def _mean(xs):
    return sum(xs) / len(xs)


def _stdev(xs):
    m = _mean(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))


def mirror_detect(series, elevation, pace, hr):
    """Python mirror of the reference pipeline for ONE user+metric.

    ``series``/``elevation``/``pace``/``hr`` are dense lists indexed by
    the ordinal axis (the reference's per-second arrays).
    """
    n = len(series)
    # rolling stats [i-30, i+30), >=2 values else skipped
    flagged = []
    for i, v in enumerate(series):
        win = series[max(0, i - ROLL_W) : min(n, i + ROLL_W)]
        if len(win) < 2:
            continue
        m, s = _mean(win), _stdev(win)
        if s == 0:
            continue
        dev = v - m
        if dev <= 0:  # worse-is-higher only
            continue
        z = dev / s
        if z <= Z_THR or dev < GATE:
            continue
        flagged.append({"t": i, "v": v, "m": m, "z": z})
    # sustained runs: adjacency <= MAX_GAP, span >= MIN_SPAN, keep members
    sustained = []
    run = []
    for a in flagged:
        if run and a["t"] - run[-1]["t"] <= MAX_GAP:
            run.append(a)
        else:
            if run and run[-1]["t"] - run[0]["t"] + 1 >= MIN_SPAN:
                sustained.extend(run)
            run = [a]
    if run and run[-1]["t"] - run[0]["t"] + 1 >= MIN_SPAN:
        sustained.extend(run)
    # sustained degradation (half-vs-half on the full series)
    sdeg = False
    if n >= 4:
        mid = n // 2
        sdeg = _mean(series[mid:]) - _mean(series[:mid]) >= TRIGGER
    out = []
    for a in sustained:
        t = a["t"]
        ev = elevation[max(0, t - 5) : t + 5]
        elev_change = max(ev) - min(ev) if len(ev) > 1 else 0.0
        pv = pace[max(0, t - 10) : t + 10]
        pace_change = max(pv) - min(pv) if len(pv) > 1 else 0.0
        base = hr[:300]
        cur = hr[max(0, t - 60) : t]
        drift = (
            (_mean(cur) - _mean(base)) / _mean(base) * 100.0
            if base and cur
            else 0.0
        )
        if elev_change > 5.0:
            cause = "elevation_change"
        elif pace_change > 0.25:
            cause = "pace_change"
        elif abs(drift) > 10.0 and sdeg:
            cause = "fatigue"
        else:
            cause = "isolated"
        before = series[max(0, t - 30) : t]
        after = series[t : t + 30]
        bel = elevation[max(0, t - 30) : t]
        ael = elevation[t : t + 30]
        out.append(
            {
                "sec": t,
                "value": a["v"],
                "baseline": a["m"],
                "z_score": a["z"],
                "probable_cause": cause,
                "elevation_change_5s": elev_change,
                "pace_change_10s": pace_change,
                "hr_drift_percent": drift,
                "before_metric_avg": _mean(before) if before else 0.0,
                "after_metric_avg": _mean(after) if after else 0.0,
                "before_elevation": _mean(bel) if bel else 0.0,
                "after_elevation": _mean(ael) if ael else 0.0,
            }
        )
    return out


def _random_series(rng, n):
    """Random walk with injected sustained bumps so the gates fire."""
    xs, v = [], 10.0
    for _ in range(n):
        v = max(0.0, v + rng.uniform(-1.5, 1.5))
        xs.append(round(v, 2))
    # inject 0-3 sustained bumps
    for _ in range(rng.randint(0, 3)):
        start = rng.randint(0, max(0, n - 8))
        width = rng.randint(3, 8)
        amp = rng.uniform(3.0, 15.0)
        for i in range(start, min(n, start + width)):
            xs[i] = round(xs[i] + amp, 2)
    return xs


def test_classify_causes_matches_python_mirror(spark):
    rng = random.Random(20240813)
    rows_form, ctx_rows, expected = [], [], {}
    for uid in range(12):
        n = rng.randint(10, 120)
        series = _random_series(rng, n)
        elevation = [round(rng.uniform(0.0, 8.0), 2) for _ in range(n)]
        pace = [round(rng.uniform(0.0, 0.4), 3) for _ in range(n)]
        hr = [round(rng.uniform(80.0, 180.0), 1) for _ in range(n)]
        for t, v in enumerate(series):
            rows_form.append((uid, "m", t, v))
            ctx_rows.append((uid, "m", t, v))
        for t in range(n):
            ctx_rows.append((uid, "elevation", t, elevation[t]))
            ctx_rows.append((uid, "pace", t, pace[t]))
            ctx_rows.append((uid, "hr", t, hr[t]))
        expected[uid] = mirror_detect(series, elevation, pace, hr)

    form = spark.createDataFrame(
        rows_form, "user_id long, metric string, sec long, value double"
    )
    context = spark.createDataFrame(
        ctx_rows, "user_id long, series string, sec long, val double"
    )
    got_rows = classify_anomaly_causes(
        form,
        context,
        z_threshold=Z_THR,
        magnitude_gates={"m": GATE},
        degradation_triggers={"m": TRIGGER},
        max_gap=MAX_GAP,
        min_span=MIN_SPAN,
        rolling_window=ROLL_W,
    ).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["user_id"], []).append(r)

    n_anoms = 0
    for uid, want in expected.items():
        have = sorted(got.get(uid, []), key=lambda r: r["sec"])
        assert [r["sec"] for r in have] == [w["sec"] for w in want], uid
        for r, w in zip(have, want):
            assert r["probable_cause"] == w["probable_cause"], (uid, r["sec"])
            for k in (
                "value",
                "baseline",
                "z_score",
                "elevation_change_5s",
                "pace_change_10s",
                "hr_drift_percent",
                "before_metric_avg",
                "after_metric_avg",
                "before_elevation",
                "after_elevation",
            ):
                assert r[k] == pytest.approx(w[k], rel=1e-9, abs=1e-9), (
                    uid,
                    r["sec"],
                    k,
                )
        n_anoms += len(want)
    # the generator must actually exercise the pipeline
    assert n_anoms >= 10
