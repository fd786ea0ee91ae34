"""Silver-layer writers: how the 21 domain tables are laid out on disk
at 100 TB (SURVEY.md §1.3-1.4, §3.2; SCALING.md "Storage & partitioning").

The reference's write-side idempotency is DELETE-then-INSERT keyed by
``activity_id`` (``mcp/database/inserters/splits.py:77``,
``time_series_metrics.py:112``) under a single-writer lock.  On parquet
the equivalent unit of replacement is the PARTITION, so the silver
layout makes partitions the idempotency boundary:

- fact tables partition by calendar month of the event date — ingest is
  time-correlated, so a re-ingest touches few partitions, and every
  date-range query (P3, A4/A5, W5-W7) gets partition pruning, the same
  service the reference buys with its ART indexes;
- ``delete_insert_by_key`` rewrites ONLY the partitions containing the
  incoming keys (read partition → drop incoming keys → union new rows →
  dynamic-partition overwrite), which is exactly DELETE+INSERT semantics
  with an idempotent re-run;
- dimension-sized tables (activities, per-run enrichment) stay
  unpartitioned single-directory parquet — they broadcast anyway;
- ``write_bucketed`` materializes both sides of a hot equi-join
  bucketed by the join key, so the join plans with zero shuffle
  (checked by ``tests/test_silver.py::test_bucketed_join_has_no_shuffle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONTH_COL = "_month"


def with_month(df: DataFrame, date_col: str) -> DataFrame:
    """Attach the partition column: calendar month 'yyyy-MM' of the
    event date — coarse enough to keep partition counts sane at 100 TB
    (12/year), fine enough that catch-up ingest touches 1-2."""
    return df.withColumn(MONTH_COL, F.date_format(F.col(date_col), "yyyy-MM"))


def write_partitioned(df: DataFrame, path: str, date_col: str) -> None:
    """Initial/full build: month-partitioned parquet.  ``overwrite``
    with dynamic partition mode only replaces partitions present in
    ``df`` — a no-op for months the frame doesn't carry."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        with_month(df, date_col)
        .write.mode("overwrite")
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def delete_insert_by_key(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    key_col: str,
    date_col: str,
) -> None:
    """DELETE-then-INSERT keyed by ``key_col``, re-expressed as a
    partition-scoped read-modify-write:

    1. months touched by the incoming rows (tiny distinct list),
    2. read ONLY those partitions (partition pruning on ``_month``),
    3. drop rows whose key arrives in the new batch (the DELETE) via a
       broadcast anti-join on the incoming key set,
    4. union the new rows (the INSERT),
    5. dynamic-partition overwrite — untouched months are never read
       or written.

    Idempotent: re-running the same batch yields byte-identical
    partitions.  This is the plain-parquet rendition of Delta
    ``MERGE WHEN MATCHED DELETE``; swap in Delta and steps 2-5 become
    one statement, with the same partition pruning doing the work.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    incoming = with_month(new_rows, date_col)
    months = [r[0] for r in incoming.select(MONTH_COL).distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col(MONTH_COL).isin(months))
    keys = incoming.select(key_col).distinct()
    kept = existing.join(F.broadcast(keys), key_col, "left_anti")
    (
        kept.unionByName(incoming)
        .write.mode("overwrite")
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def read_silver(spark: SparkSession, path: str) -> DataFrame:
    """Read a silver table; the ``_month`` partition column participates
    in pruning for any filter on it."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Materialize a table bucketed (and sorted) by its hot join key.
    Two tables bucketed the same way equi-join with NO Exchange on
    either side — the co-located join the reference never needs at its
    scale, and the one that matters most at ours (fact ⋈ fact on
    activity_id, e.g. splits ⋈ time_series rollups)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
