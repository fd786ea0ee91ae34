"""Deterministic batch replay of the streaming windowed aggregation —
the harness that lets a CORRECTNESS row cover the Structured Streaming
surface (the same move ``harness/q_incremental.py`` makes for the
stateful registries).

``windowed_stats_replay`` runs the REAL streaming code path — file
source → ``withWatermark`` → tumbling-window agg → append-mode parquet
sink — over a fixed sequence of event batches, one
``Trigger.AvailableNow`` run per batch against a shared checkpoint.
Checkpoint restore carries the event-time watermark across runs, so the
late-data semantics exercised are the production ones:

- run N's input is filtered against the watermark persisted by run
  N-1 (windows already finalized reject their late rows);
- late rows landing in still-open windows MERGE into the aggregate
  (including redelivered duplicates — streaming aggregation is
  at-least-once, not idempotent, and the replay asserts that honestly);
- append mode emits a window exactly once, when the watermark passes
  its end; a final drain run flushes windows finalized by the last
  batch's watermark advance.

Determinism: each batch is one parquet file processed as one
micro-batch, so watermark advances happen only BETWEEN runs, never
inside one; the watermark itself is ms-floored exactly as Spark tracks
it, which the catalog oracle mirrors (``q_incremental.i3``).  Windows
whose end never falls behind the final watermark remain un-emitted —
the replay returns only finalized windows, as a real stream would.

Scale shape: the aggregation state is O(open windows × keys), bounded
by the watermark; the shuffle is the window+key hash — identical to
the batch twin (A2/A4's rollups).  Nothing here collects to the
driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_stats_replay(
    spark: SparkSession,
    batches: list[DataFrame],
    work_dir: str,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_sec: int = 300,
    watermark_sec: int = 120,
) -> DataFrame:
    """Replay ``batches`` (in order) through the streaming windowed
    aggregation and return the parquet sink's contents — the finalized
    (window_start, key) aggregate rows, exactly as append mode emitted
    them.

    ``value_sum`` aggregates through DECIMAL(30,12) inside the stream
    (shuffle-order-independent, registry convention); ``value_avg`` is
    derived as sum/n at read-back so both engines share one formula.
    """
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    chk = os.path.join(work_dir, "chk")
    os.makedirs(src, exist_ok=True)
    schema = batches[0].schema

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark(ts_col, f"{watermark_sec} seconds")
            .groupBy(
                F.window(F.col(ts_col), f"{window_sec} seconds").alias("win"),
                F.col(key_col).alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(value_col).cast("decimal(30,12)")).alias("vsum"),
                F.min(value_col).alias("vmin"),
                F.max(value_col).alias("vmax"),
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(src)
        run_once()
    # drain run: no new data, but the no-data micro-batch emits windows
    # the LAST batch's watermark advance finalized
    run_once()

    sink = spark.read.parquet(out)
    return sink.select(
        F.col("win.start").alias("window_start"),
        F.col("key"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("vsum").cast("double"), 6).alias("value_sum"),
        F.round(F.col("vsum").cast("double") / F.col("n"), 6).alias("value_avg"),
        F.col("vmin").alias("value_min"),
        F.col("vmax").alias("value_max"),
    )
