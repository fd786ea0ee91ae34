"""Structured Streaming coverage: Trigger.AvailableNow ingest (the
cron-sync execution model) and a watermarked windowed aggregation over
the events stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from garmin_performance_analysis_spark.streaming.ingest import available_now_ingest

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_available_now_drains_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 00:01:00", 2.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)

    available_now_ingest(spark, src, SCHEMA, sink, ckpt)
    assert spark.read.parquet(sink).count() == 2

    # second batch lands; AvailableNow drains ONLY the new file
    spark.createDataFrame(
        [(3, "2024-01-01 00:02:00", 3.0)], "id long, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)
    available_now_ingest(spark, src, SCHEMA, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert out.select(F.countDistinct("id")).first()[0] == 3  # no re-ingest dupes


def test_watermarked_window_agg(spark, tmp_path):
    """Windowed count with a watermark over a bounded stream — the
    shape a live events feed would use (guide: readStream → watermark →
    window agg → memory sink)."""
    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    rows = [(i, f"2024-01-01 00:{i:02d}:30", float(i)) for i in range(10)]
    spark.createDataFrame(rows, "id long, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = {
        r["window"]["start"].minute: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert res[0] == (5, 10.0)  # minutes 0-4
    assert res[5] == (5, 35.0)  # minutes 5-9
