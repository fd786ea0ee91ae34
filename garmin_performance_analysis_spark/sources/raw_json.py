"""Bronze layer: raw Garmin JSON readers with explicit schemas
(SURVEY.md §2.1 S1-S2).

The reference's immutable raw store keeps one directory per activity
with ``activity.json``, ``splits.json`` (``lapDTOs`` array),
``hr_zones.json``, ``activity_details.json`` (positional metric arrays)
— layout ``docs/spec/duckdb_schema_mapping.md:905-918``.  Everything
reads with declared schemas (no inference — a schema drift should fail
loudly, not silently re-type a column) and arrays normalize via
``explode``/``posexplode``.

S2 is the interesting one: ``activity_details.json`` stores one
positional double array per second plus a descriptor list mapping
metric key → array index (+ unit factor).  The reference pivots in
Python (``mcp/database/inserters/time_series_metrics.py:56-118``); here
the pivot is a ``posexplode`` + descriptor join + ``map_from_entries``
lookup — all JVM-side, scaling to any number of activities at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LAP_SCHEMA = T.StructType(
    [
        T.StructField("lapIndex", T.IntegerType()),
        T.StructField("distance", T.DoubleType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("startTimeGMT", T.StringType()),
        T.StructField("intensityType", T.StringType()),
        T.StructField("averageHR", T.DoubleType()),
        T.StructField("maxHR", T.DoubleType()),
        T.StructField("averageRunCadence", T.DoubleType()),
        T.StructField("maxRunCadence", T.DoubleType()),
        T.StructField("averagePower", T.DoubleType()),
        T.StructField("maxPower", T.DoubleType()),
        T.StructField("normalizedPower", T.DoubleType()),
        T.StructField("groundContactTime", T.DoubleType()),
        T.StructField("verticalOscillation", T.DoubleType()),
        T.StructField("verticalRatio", T.DoubleType()),
        T.StructField("elevationGain", T.DoubleType()),
        T.StructField("elevationLoss", T.DoubleType()),
        T.StructField("strideLength", T.DoubleType()),
        T.StructField("averageSpeed", T.DoubleType()),
        T.StructField("avgGradeAdjustedSpeed", T.DoubleType()),
    ]
)

SPLITS_FILE_SCHEMA = T.StructType(
    [T.StructField("lapDTOs", T.ArrayType(LAP_SCHEMA))]
)

HR_ZONES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("zoneNumber", T.IntegerType()),
            T.StructField("zoneLowBoundary", T.IntegerType()),
            T.StructField("secsInZone", T.DoubleType()),
        ]
    )
)

DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("activityId", T.LongType()),
        T.StructField(
            "metricDescriptors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("metricsIndex", T.IntegerType()),
                        T.StructField("key", T.StringType()),
                        T.StructField(
                            "unit",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("key", T.StringType()),
                                    T.StructField("factor", T.DoubleType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "activityDetailMetrics",
            T.ArrayType(
                T.StructType([T.StructField("metrics", T.ArrayType(T.DoubleType()))])
            ),
        ),
    ]
)


def read_splits(spark: SparkSession, path: str, activity_id: int) -> DataFrame:
    """S1: ``splits.json`` → one row per lap, with the reference's
    derived columns (pace, cumulative times) left to the silver layer."""
    raw = spark.read.schema(SPLITS_FILE_SCHEMA).option("multiLine", True).json(path)
    return raw.select(F.explode("lapDTOs").alias("lap")).select(
        F.lit(activity_id).alias("activity_id"), "lap.*"
    )


def read_hr_zones(spark: SparkSession, path: str, activity_id: int) -> DataFrame:
    """S1: ``hr_zones.json`` (top-level array) → one row per zone
    (multiLine JSON arrays parse as one row per element)."""
    raw = spark.read.schema(
        T.StructType(
            [
                T.StructField("zoneNumber", T.IntegerType()),
                T.StructField("zoneLowBoundary", T.IntegerType()),
                T.StructField("secsInZone", T.DoubleType()),
            ]
        )
    ).option("multiLine", True).json(path)
    return raw.select(
        F.lit(activity_id).alias("activity_id"),
        F.col("zoneNumber").alias("zone_number"),
        F.col("zoneLowBoundary").alias("zone_low_boundary"),
        F.col("secsInZone").alias("time_in_zone_seconds"),
    )


def pivot_time_series(spark: SparkSession, path: str) -> DataFrame:
    """S2: descriptor-driven pivot of positional metric arrays into a
    long-format named-metric frame ``(activity_id, seq_no, metric_key,
    value)`` with unit factors applied.

    One ``posexplode`` over seconds, one ``explode`` over descriptors,
    a join on the positional index — Catalyst broadcasts the (tiny)
    descriptor side; no Python in the loop.  The wide silver table is a
    ``groupBy(seq_no).pivot(metric_key)`` away, done at write time.
    """
    raw = spark.read.schema(DETAILS_SCHEMA).option("multiLine", True).json(path)
    seconds = raw.select(
        "activityId",
        F.posexplode("activityDetailMetrics").alias("seq_no", "row"),
    ).select("activityId", "seq_no", F.col("row.metrics").alias("metrics"))
    descriptors = raw.select(
        "activityId", F.explode("metricDescriptors").alias("d")
    ).select(
        "activityId",
        F.col("d.metricsIndex").alias("idx"),
        F.col("d.key").alias("metric_key"),
        F.coalesce(F.col("d.unit.factor"), F.lit(1.0)).alias("factor"),
    )
    exploded = seconds.select(
        "activityId", "seq_no", F.posexplode("metrics").alias("idx", "raw_value")
    )
    return (
        exploded.join(F.broadcast(descriptors), ["activityId", "idx"])
        .select(
            F.col("activityId").alias("activity_id"),
            "seq_no",
            "metric_key",
            (F.col("raw_value") * F.col("factor")).alias("value"),
        )
    )
