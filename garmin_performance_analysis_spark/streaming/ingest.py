"""Incremental ("catch-up") ingest (SURVEY.md §2.1 S4, §2.12).

The reference's sync is batch-incremental: per domain, resume from
``MAX(stored date)`` and append what's new
(``mcp/database/db_reader.py:217-282``; ``docs/scheduled-sync.md``).
Two Spark renditions:

- ``incremental_append``: the exact watermark semantics as a batch job —
  read the sink's max cursor, filter source rows strictly beyond it,
  append.  Idempotent under re-run (nothing new → nothing appended).
- ``available_now_ingest``: the same flow as Structured Streaming with
  ``Trigger.AvailableNow`` + checkpoint — Spark tracks the progress
  (file-level) instead of a max-date cursor; one call drains everything
  currently available and stops, which is the cron-sync execution model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def max_cursor(spark: SparkSession, sink_path: str, cursor_col: str):
    """The sink's watermark: MAX(cursor) or None for an empty sink."""
    if not os.path.exists(sink_path):
        return None
    try:
        sink = spark.read.parquet(sink_path)
    except Exception:  # noqa: BLE001 - empty/corrupt sink == no watermark
        return None
    return sink.agg(F.max(cursor_col)).first()[0]


def incremental_append(
    source: DataFrame, spark: SparkSession, sink_path: str, cursor_col: str
) -> int:
    """Append source rows with ``cursor > MAX(sink.cursor)``; returns the
    number of appended rows.  Re-running with no new data is a no-op —
    the reference's idempotent catch-up contract."""
    cur = max_cursor(spark, sink_path, cursor_col)
    fresh = source if cur is None else source.filter(F.col(cursor_col) > F.lit(cur))
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(sink_path)
    return n


def available_now_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    sink_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available files through a streaming query and
    stop (``Trigger.AvailableNow`` — the batch-cron execution model with
    streaming-grade progress tracking)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
