"""Enrichment-band queries (SURVEY.md §2.9: D1-D7).

Each query drives one ingest-time derived-column transform from
``functions/bands.py`` / ``functions/conversions.py`` over the driver's
synthetic tables, with a CASE-WHEN DuckDB oracle mirroring the band
thresholds exactly.  Domain inputs (heart rate, cadence, watts, wind)
are derived deterministically from integer key columns — integer-only
arithmetic, so both engines agree bit-for-bit and the oracle stays
engine-agnostic.

All transforms are pure column expressions (no UDF): at 100 TB they ride
whole-stage codegen inside the scan stage, and the groupBy outputs are
band-cardinality-sized (map-side combine does the heavy lifting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import bands
from ..functions.conversions import pace_str
from ..sources.tables import load_table
from .registry import r6 as _r6
from .registry import register, sql_davg

# Garmin-native zone bounds used by the e1 query (D1 takes the athlete's
# real bounds from heart_rate_zones; reference never uses 220-age).
_ZONES = [(1, 100, 119), (2, 120, 139), (3, 140, 159), (4, 160, 179), (5, 180, 200)]


@register(
    "e1_hr_zone",
    oracle="""
SELECT CASE
         WHEN hr > 200 THEN 'Zone 5+ (Max)'
         WHEN hr BETWEEN 180 AND 200 THEN 'Zone 5'
         WHEN hr BETWEEN 160 AND 179 THEN 'Zone 4'
         WHEN hr BETWEEN 140 AND 159 THEN 'Zone 3'
         WHEN hr BETWEEN 120 AND 139 THEN 'Zone 2'
         WHEN hr BETWEEN 100 AND 119 THEN 'Zone 1'
         ELSE 'Zone 0 (Recovery)'
       END AS hr_zone,
       COUNT(*) AS n
FROM (SELECT 85 + (l_orderkey * 7 + l_linenumber) % 120 AS hr FROM lineitem)
GROUP BY 1
""",
    tags=("enrichment",),
)
def e1_hr_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 hr_zone: Garmin-native zone boundary mapping
    (``splits_helpers/hr_calculations.py:8-44``)."""
    li = load_table(spark, sf_dir, "lineitem")
    hr = F.lit(85) + (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 120
    return (
        li.select(bands.hr_zone(hr, _ZONES).alias("hr_zone"))
        .groupBy("hr_zone")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "e2_cadence_rating",
    oracle="""
SELECT CASE
         WHEN c < 170 THEN 'Low (' || CAST(c AS VARCHAR) || ' spm, target 180+)'
         WHEN c < 180 THEN 'Good (' || CAST(c AS VARCHAR) || ' spm)'
         WHEN c < 190 THEN 'Excellent (' || CAST(c AS VARCHAR) || ' spm)'
         ELSE 'Elite (' || CAST(c AS VARCHAR) || ' spm)'
       END AS cadence_rating,
       COUNT(*) AS n
FROM (SELECT 150 + l_partkey % 55 AS c FROM lineitem)
GROUP BY 1
""",
    tags=("enrichment",),
)
def e2_cadence_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 cadence_rating bands with the cadence interpolated into the
    label (``splits_helpers/cadence_power.py:8-31``)."""
    li = load_table(spark, sf_dir, "lineitem")
    cadence = F.lit(150) + F.col("l_partkey") % 55
    return (
        li.select(bands.cadence_rating(cadence).alias("cadence_rating"))
        .groupBy("cadence_rating")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "e3_power_efficiency",
    oracle=f"""
SELECT CASE
         WHEN wkg < 2.5 THEN 'Low'
         WHEN wkg < 3.5 THEN 'Moderate'
         WHEN wkg < 4.5 THEN 'Good'
         ELSE 'Excellent'
       END AS band,
       COUNT(*) AS n,
       ROUND({sql_davg('wkg')}, 6) AS avg_wkg
FROM (SELECT (100 + l_suppkey % 300) / (50 + l_orderkey % 40) AS wkg FROM lineitem)
GROUP BY 1
""",
    tags=("enrichment",),
)
def e3_power_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 power_efficiency W/kg bands
    (``splits_helpers/cadence_power.py:33-56``); the band word is the
    label prefix from the production expression."""
    from .registry import dec_avg

    li = load_table(spark, sf_dir, "lineitem")
    power = F.lit(100) + F.col("l_suppkey") % 300
    weight = F.lit(50) + F.col("l_orderkey") % 40
    wkg = power / weight
    label = bands.power_efficiency(power.cast("double"), weight.cast("double"))
    return (
        li.select(
            F.regexp_extract(label, r"^(\w+)", 1).alias("band"), wkg.alias("wkg")
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(dec_avg(F.col("wkg"))).alias("avg_wkg"),
        )
    )


@register(
    "e4_terrain_type",
    oracle="""
SELECT CASE
         WHEN gain + loss < 5 THEN '平坦'
         WHEN gain + loss < 15 THEN '起伏'
         WHEN gain + loss < 30 THEN '丘陵'
         ELSE '山岳'
       END AS terrain_type,
       COUNT(*) AS n
FROM (SELECT l_orderkey % 45 AS gain, l_partkey % 25 AS loss FROM lineitem)
GROUP BY 1
""",
    tags=("enrichment",),
)
def e4_terrain_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 terrain_type by |gain|+|loss| with the reference's Japanese
    labels (``splits_helpers/terrain.py:8-29``)."""
    li = load_table(spark, sf_dir, "lineitem")
    gain = (F.col("l_orderkey") % 45).cast("double")
    loss = (F.col("l_partkey") % 25).cast("double")
    return (
        li.select(bands.terrain_type(gain, loss).alias("terrain_type"))
        .groupBy("terrain_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "e5_environmental",
    oracle="""
SELECT l_orderkey, l_linenumber,
       concat_ws(', ',
         CASE WHEN t < 10 THEN 'Cold (' || CAST(t AS VARCHAR) || '°C)'
              WHEN t < 18 THEN 'Cool (' || CAST(t AS VARCHAR) || '°C)'
              WHEN t < 25 THEN 'Mild (' || CAST(t AS VARCHAR) || '°C)'
              ELSE 'Hot (' || CAST(t AS VARCHAR) || '°C)' END,
         CASE WHEN w < 5 THEN 'Calm'
              WHEN w < 15 THEN 'Breezy (' || CAST(w AS VARCHAR) || ' km/h)'
              ELSE 'Windy (' || CAST(w AS VARCHAR) || ' km/h)' END,
         CASE WHEN h > 80 THEN 'Humid (' || CAST(h AS VARCHAR) || '%)'
              WHEN h < 30 THEN 'Dry (' || CAST(h AS VARCHAR) || '%)' END
       ) AS conditions,
       CASE WHEN w < 5 THEN 'Minimal (<5 km/h)'
            WHEN w < 15 THEN
              CASE WHEN d < 45 OR d > 315 THEN 'Moderate headwind (' || CAST(w AS VARCHAR) || ' km/h)'
                   WHEN d > 135 AND d < 225 THEN 'Moderate tailwind (' || CAST(w AS VARCHAR) || ' km/h)'
                   ELSE 'Moderate crosswind (' || CAST(w AS VARCHAR) || ' km/h)' END
            ELSE 'Significant (' || CAST(w AS VARCHAR) || ' km/h, pace impact expected)'
       END AS wind_impact
FROM (SELECT l_orderkey, l_linenumber,
             -5 + (l_orderkey + l_partkey) % 40 AS t,
             (l_suppkey * 3) % 30 AS w,
             l_orderkey % 101 AS h,
             (l_orderkey * 13) % 360 AS d
      FROM lineitem WHERE l_orderkey % 211 = 0)
""",
    tags=("enrichment",),
)
def e5_environmental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 environmental_conditions + wind head/tail/cross impact
    (``splits_helpers/environmental.py:8-90``); per-row over a keyed
    sample so the full label strings are hash-compared."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 211 == 0)
    t = (F.lit(-5) + (F.col("l_orderkey") + F.col("l_partkey")) % 40).cast("double")
    w = ((F.col("l_suppkey") * 3) % 30).cast("double")
    h = (F.col("l_orderkey") % 101).cast("double")
    d = ((F.col("l_orderkey") * 13) % 360).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bands.environmental_conditions(t, w, h).alias("conditions"),
        bands.wind_impact(w, d).alias("wind_impact"),
    )


@register(
    "e6_role_phase",
    oracle="""
SELECT CASE
         WHEN m = 0 THEN 'warmup'
         WHEN m IN (1, 2) THEN 'run'
         WHEN m = 3 THEN 'recovery'
         WHEN m = 4 THEN 'cooldown'
       END AS role_phase,
       COUNT(*) AS n
FROM (SELECT (l_orderkey + l_linenumber) % 6 AS m FROM lineitem)
GROUP BY 1
""",
    tags=("enrichment",),
)
def e6_role_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 role_phase from intensityType
    (``splits_helpers/phase_mapping.py:8-32``); unmapped types fall into
    the NULL group, matching the reference's None."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (F.col("l_orderkey") + F.col("l_linenumber")) % 6
    intensity = (
        F.when(m == 0, "WARMUP")
        .when(m == 1, "INTERVAL")
        .when(m == 2, "ACTIVE")
        .when(m == 3, "RECOVERY")
        .when(m == 4, "COOLDOWN")
        .otherwise("OTHER")
    )
    return (
        li.select(bands.role_phase(intensity).alias("role_phase"))
        .groupBy("role_phase")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "e7_pace_cumulative",
    oracle="""
SELECT l_orderkey, l_linenumber, dur AS pace_seconds_per_km,
       CAST(dur // 60 AS VARCHAR) || ':' || lpad(CAST(dur % 60 AS VARCHAR), 2, '0') AS pace_str,
       CAST(SUM(dur) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - dur AS BIGINT) AS start_time_s,
       CAST(SUM(dur) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS BIGINT) AS end_time_s
FROM (SELECT l_orderkey, l_linenumber,
             240 + (l_orderkey + 31 * l_linenumber) % 240 AS dur
      FROM lineitem WHERE l_orderkey % 97 = 0)
""",
    tags=("enrichment", "window"),
)
def e7_pace_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 pace_str (M:SS) + cumulative start/end seconds per split
    (``splits_helpers/extractor.py:17-80``).  Both engines use their
    default RANGE window frame, so rows tied on ``l_linenumber`` (the
    synthetic data has duplicate keys) carry identical cumulative values
    in either engine — deterministic despite the tie.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    dur = F.lit(240) + (F.col("l_orderkey") + 31 * F.col("l_linenumber")) % 240
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    cum = F.sum("dur").over(w)
    return (
        li.select("l_orderkey", "l_linenumber", dur.alias("dur"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("dur").alias("pace_seconds_per_km"),
            pace_str(F.col("dur").cast("double")).alias("pace_str"),
            (cum - F.col("dur")).alias("start_time_s"),
            cum.alias("end_time_s"),
        )
    )
