"""Daniels VDOT math (SURVEY.md §2.10 M7).

Re-derivation of the public Daniels–Gilbert formulas the reference uses
(``mcp/fitness/vdot.py:20-170``): oxygen cost of running speed, fraction
of VO2max sustainable for a duration, race→VDOT, and race-time
prediction by binary search.  Column-expression variants keep the hot
path JVM-side; the binary search (iterative, per-row scalar) is a plain
Python helper for driver-side use and a pandas_udf for bulk scoring.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def oxygen_cost(v_m_per_min: Column) -> Column:
    """VO2 demand (ml/kg/min) at speed v (m/min):
    ``-4.60 + 0.182258 v + 0.000104 v²`` (``vdot.py:20-40``)."""
    return (
        F.lit(-4.60)
        + F.lit(0.182258) * v_m_per_min
        + F.lit(0.000104) * v_m_per_min * v_m_per_min
    )


def percent_vo2max(t_min: Column) -> Column:
    """Sustainable %VO2max for a race lasting t minutes:
    ``0.8 + 0.1894393 e^(-0.012778 t) + 0.2989558 e^(-0.1932605 t)``
    (``vdot.py:42-60``)."""
    return (
        F.lit(0.8)
        + F.lit(0.1894393) * F.exp(F.lit(-0.012778) * t_min)
        + F.lit(0.2989558) * F.exp(F.lit(-0.1932605) * t_min)
    )


def race_vdot(distance_m: Column, t_min: Column) -> Column:
    """VDOT implied by a race performance: oxygen_cost(v) / %VO2max(t)."""
    v = distance_m / t_min
    return oxygen_cost(v) / percent_vo2max(t_min)


# -- scalar (driver-side / pandas_udf) versions ----------------------------


def oxygen_cost_py(v: float) -> float:
    return -4.60 + 0.182258 * v + 0.000104 * v * v


def percent_vo2max_py(t_min: float) -> float:
    return (
        0.8
        + 0.1894393 * math.exp(-0.012778 * t_min)
        + 0.2989558 * math.exp(-0.1932605 * t_min)
    )


def race_vdot_py(distance_m: float, t_min: float) -> float:
    v = distance_m / t_min
    return oxygen_cost_py(v) / percent_vo2max_py(t_min)


def predict_race_time_s(
    vdot: float, distance_m: float, lo_s: float = 240.0, hi_s: float = 4 * 3600.0
) -> float:
    """Race-time prediction: binary search for the duration whose implied
    VDOT equals the given one, to 1-second resolution
    (``vdot.py:141-170``).  Implied VDOT decreases with duration, so the
    search brackets on that monotonicity."""
    lo, hi = lo_s, hi_s
    while hi - lo > 1.0:
        mid = (lo + hi) / 2.0
        implied = race_vdot_py(distance_m, mid / 60.0)
        if implied > vdot:
            lo = mid  # running faster than vdot supports -> time is longer
        else:
            hi = mid
    return round((lo + hi) / 2.0)


def pace_zones_from_vdot(vdot: float) -> dict[str, float]:
    """Training pace zones (s/km) at fixed %VO2max intensities, solving
    the oxygen-cost quadratic for speed (``vdot.py:61-140``)."""
    zones = {
        "easy": 0.70,
        "marathon": 0.84,
        "threshold": 0.88,
        "interval": 0.98,
        "repetition": 1.05,
    }
    out = {}
    for name, pct in zones.items():
        target_vo2 = vdot * pct
        # 0.000104 v^2 + 0.182258 v - (4.60 + target) = 0
        a, b, c = 0.000104, 0.182258, -(4.60 + target_vo2)
        v = (-b + math.sqrt(b * b - 4 * a * c)) / (2 * a)  # m/min
        out[name] = 1000.0 / v * 60.0  # s/km
    return out
