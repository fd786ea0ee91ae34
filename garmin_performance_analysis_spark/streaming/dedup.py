"""Streaming deduplication — the streaming twin of the batch exact
-dedup entry (``pipelines/dedup.exact_duplicates`` / catalog d1).

A live ingest feed re-delivers documents (retries, at-least-once
sources); the dedup step must drop re-deliveries WITHOUT holding every
hash ever seen.  ``dropDuplicatesWithinWatermark`` is the Spark-native
answer: state holds only hashes younger than the event-time watermark,
so memory is bounded by (arrival rate × watermark), not corpus size.

Plain ``dropDuplicates`` on a stream keeps state forever — at 100 TB
that is an unbounded state store and an eventual OOM; the watermarked
variant is the only shape that survives, and it matches the batch
semantics exactly for any re-delivery that happens within the
deduplication horizon (re-deliveries later than the watermark are the
source's contract to prevent, e.g. Kafka retention ≤ horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of byte-identical documents within the
    event-time ``watermark`` horizon.

    The dedup key is ``md5(text)`` — the same content hash the batch
    d1 entry groups on — so a batch backfill and the streaming path
    agree on what counts as a duplicate.
    """
    return (
        stream.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
