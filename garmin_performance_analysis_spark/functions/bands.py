"""Derived-column enrichment transforms (SURVEY.md §2.9, D1-D7).

Each function re-expresses one reference ingest transform as a pure
Spark column expression (no UDF → whole-stage codegen).  Thresholds and
label strings (including the Japanese terrain labels) follow the
reference's output contract exactly:

- D1 hr_zone:          ``splits_helpers/hr_calculations.py:8-44``
- D2 cadence_rating:   ``splits_helpers/cadence_power.py:8-31``
- D3 power_efficiency: ``splits_helpers/cadence_power.py:33-56``
- D4 terrain_type:     ``splits_helpers/terrain.py:8-29``
- D5 environmental:    ``splits_helpers/environmental.py:8-90``
- D6 role_phase:       ``splits_helpers/phase_mapping.py:8-32``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hr_zone(
    heart_rate: Column,
    zone_bounds: list[tuple[int, int, int]],
) -> Column:
    """D1: map HR into Garmin-native zone boundaries (never 220-age).

    ``zone_bounds`` = [(zone_number, lower_bpm, upper_bpm), ...] from the
    athlete's ``heart_rate_zones`` table; inclusive bounds, with
    below-range → "Zone 0 (Recovery)" and above-range → "Zone 5+ (Max)".
    """
    expr = F.lit(None).cast("string")
    first_lower = zone_bounds[0][1]
    last_upper = zone_bounds[-1][2]
    expr = F.when(heart_rate < first_lower, F.lit("Zone 0 (Recovery)")).otherwise(expr)
    expr = F.when(heart_rate > last_upper, F.lit("Zone 5+ (Max)")).otherwise(expr)
    for zone_num, lower, upper in zone_bounds:
        expr = F.when(
            heart_rate.between(lower, upper), F.lit(f"Zone {zone_num}")
        ).otherwise(expr)
    return F.when(heart_rate.isNull(), F.lit(None).cast("string")).otherwise(expr)


def cadence_rating(cadence: Column) -> Column:
    """D2: <170 Low / 170-180 Good / 180-190 Excellent / 190+ Elite,
    with the integer cadence interpolated into the label."""
    ci = cadence.cast("int")
    return (
        F.when(cadence.isNull(), F.lit(None).cast("string"))
        .when(cadence < 170, F.concat(F.lit("Low ("), ci, F.lit(" spm, target 180+)")))
        .when(cadence < 180, F.concat(F.lit("Good ("), ci, F.lit(" spm)")))
        .when(cadence < 190, F.concat(F.lit("Excellent ("), ci, F.lit(" spm)")))
        .otherwise(F.concat(F.lit("Elite ("), ci, F.lit(" spm)")))
    )


def power_efficiency(power: Column, weight_kg: Column) -> Column:
    """D3: W/kg bands — <2.5 Low / <3.5 Moderate / <4.5 Good / 4.5+
    Excellent."""
    wkg = power / weight_kg
    wkg_s = F.format_number(wkg, 1)
    return (
        F.when(power.isNull() | weight_kg.isNull(), F.lit(None).cast("string"))
        .when(wkg < 2.5, F.concat(F.lit("Low ("), wkg_s, F.lit(" W/kg)")))
        .when(wkg < 3.5, F.concat(F.lit("Moderate ("), wkg_s, F.lit(" W/kg)")))
        .when(wkg < 4.5, F.concat(F.lit("Good ("), wkg_s, F.lit(" W/kg)")))
        .otherwise(F.concat(F.lit("Excellent ("), wkg_s, F.lit(" W/kg)")))
    )


def terrain_type(elevation_gain: Column, elevation_loss: Column) -> Column:
    """D4: |gain|+|loss| → <5 平坦 / <15 起伏 / <30 丘陵 / else 山岳
    (Japanese labels are part of the output contract)."""
    total = F.abs(elevation_gain) + F.abs(elevation_loss)
    return (
        F.when(total < 5, F.lit("平坦"))
        .when(total < 15, F.lit("起伏"))
        .when(total < 30, F.lit("丘陵"))
        .otherwise(F.lit("山岳"))
    )


def environmental_conditions(
    temp: Column, wind: Column, humidity: Column
) -> Column:
    """D5: comma-joined condition summary — temperature band always,
    wind band if present, humidity only when extreme (>80 or <30)."""
    ti = temp.cast("int")
    wi = wind.cast("int")
    hi = humidity.cast("int")
    temp_part = (
        F.when(temp < 10, F.concat(F.lit("Cold ("), ti, F.lit("°C)")))
        .when(temp < 18, F.concat(F.lit("Cool ("), ti, F.lit("°C)")))
        .when(temp < 25, F.concat(F.lit("Mild ("), ti, F.lit("°C)")))
        .otherwise(F.concat(F.lit("Hot ("), ti, F.lit("°C)")))
    )
    wind_part = (
        F.when(wind.isNull(), F.lit(None).cast("string"))
        .when(wind < 5, F.lit("Calm"))
        .when(wind < 15, F.concat(F.lit("Breezy ("), wi, F.lit(" km/h)")))
        .otherwise(F.concat(F.lit("Windy ("), wi, F.lit(" km/h)")))
    )
    hum_part = (
        F.when(humidity > 80, F.concat(F.lit("Humid ("), hi, F.lit("%)")))
        .when(humidity < 30, F.concat(F.lit("Dry ("), hi, F.lit("%)")))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.when(temp.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws(", ", temp_part, wind_part, hum_part)
    )


def wind_impact(wind_speed: Column, wind_dir_deg: Column) -> Column:
    """D5: head/tail/cross classification by degrees at moderate speeds;
    minimal <5; significant 15+."""
    wi = wind_speed.cast("int")
    directional = (
        F.when(
            (wind_dir_deg < 45) | (wind_dir_deg > 315),
            F.concat(F.lit("Moderate headwind ("), wi, F.lit(" km/h)")),
        )
        .when(
            (wind_dir_deg > 135) & (wind_dir_deg < 225),
            F.concat(F.lit("Moderate tailwind ("), wi, F.lit(" km/h)")),
        )
        .otherwise(F.concat(F.lit("Moderate crosswind ("), wi, F.lit(" km/h)")))
    )
    return (
        F.when(wind_speed.isNull(), F.lit(None).cast("string"))
        .when(wind_speed < 5, F.lit("Minimal (<5 km/h)"))
        .when(
            wind_speed < 15,
            F.when(wind_dir_deg.isNull(), F.concat(F.lit("Moderate ("), wi, F.lit(" km/h)"))).otherwise(
                directional
            ),
        )
        .otherwise(
            F.concat(F.lit("Significant ("), wi, F.lit(" km/h, pace impact expected)"))
        )
    )


def role_phase(intensity_type: Column) -> Column:
    """D6: WARMUP→warmup, INTERVAL/ACTIVE→run, RECOVERY→recovery,
    COOLDOWN→cooldown, else NULL."""
    it = F.upper(intensity_type)
    return (
        F.when(it == "WARMUP", F.lit("warmup"))
        .when(it.isin("INTERVAL", "ACTIVE"), F.lit("run"))
        .when(it == "RECOVERY", F.lit("recovery"))
        .when(it == "COOLDOWN", F.lit("cooldown"))
        .otherwise(F.lit(None).cast("string"))
    )
