"""Incremental corpus deduplication — the daily-ingest path.

A 100 TB corpus cannot re-run global dedup on every ingest: the set of
already-seen keys must persist between runs and each new batch must
check itself against that REGISTRY, not against the whole corpus.
This module keeps a hash-prefix-partitioned parquet registry of
``(dedup_key, keep_id)`` and gives each ingest batch three guarantees:

- **within-batch dedup**: duplicate keys inside the batch collapse to
  the minimum id (the same canonical-keep rule as batch d1);
- **cross-run dedup**: keys already in the registry are dropped via a
  left-anti join;
- **idempotency**: re-running the same batch returns zero fresh rows
  and appends nothing — the corpus-scale analogue of the reference's
  DELETE-then-INSERT idempotent ingest
  (``mcp/database/inserters/splits.py:77``).

Scale design:

- The registry is partitioned by a 2-hex-char key prefix (256
  partitions).  A small batch touches few prefixes, so the registry
  read prunes to just those directories; a full-corpus batch reads all
  256, which is the unavoidable case.  New rows append WITHIN their
  prefix partitions — no rewrite of existing data, ever.
- The anti-join shuffles on the dedup key on both sides.  The batch
  side is small by definition (one ingest).  The registry side grows
  with the corpus — when that becomes the bottleneck, materialize the
  registry bucketed by key (``silver.write_bucketed``) and the join
  goes exchange-free on the registry side; the parquet layout here
  keeps the API filesystem-only.
- The registry stores ONLY (key, keep_id): ~50 bytes/doc — a 1e9-doc
  corpus registry is ~50 GB, trivially joinable.

Crash safety: the append runs AFTER the fresh set is computed but is
itself atomic per partition-file; a crash between returning fresh rows
and the append finishing re-surfaces those rows as fresh on retry —
safe, because downstream DELETE-then-INSERT keyed on doc_id absorbs
the re-delivery (same idempotency contract as the reference's
inserters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .migrations import _exists
from .text import fingerprint_expr

_REGISTRY_SCHEMA = "dedup_key string, keep_id long"

_PREFIX_COL = "_kp"


def _prefix_expr():
    """Partition value for a key: 'p' + first two hex chars.  The
    letter marker keeps Spark's partition-value type inference from
    reading a digits-only prefix ("84") back as a NUMERIC column,
    which would break the string prune filter.
    """
    return F.concat(F.lit("p"), F.substring("dedup_key", 1, 2))


def exact_key_expr(text_col: str):
    """Dedup key for byte-identical content (batch d1's rule)."""
    return F.md5(F.col(text_col))


def near_key_expr(text_col: str):
    """Order-insensitive fingerprint key (batch x3's rule) — catches
    reshuffled/reordered duplicates."""
    return fingerprint_expr(text_col)


def read_registry(spark: SparkSession, path: str) -> DataFrame:
    """The persisted (dedup_key, keep_id) registry; empty frame if the
    registry has never been written.  Existence goes through the Hadoop
    FileSystem API (NOT os.path) so hdfs:///s3a:// registries work, and
    the read carries an explicit schema so a directory holding only
    _SUCCESS (a possible empty-append artifact) cannot fail inference."""
    if not _exists(spark, path):
        return spark.createDataFrame([], _REGISTRY_SCHEMA)
    return (
        spark.read.schema(_REGISTRY_SCHEMA + f", {_PREFIX_COL} string")
        .parquet(path)
        .select("dedup_key", "keep_id")
    )


def incremental_dedup(
    spark: SparkSession,
    batch: DataFrame,
    registry_path: str,
    id_col: str,
    key_expr,
) -> DataFrame:
    """Deduplicate one ingest batch against itself and the registry,
    append the fresh keys, and return the fresh rows (original columns
    plus ``dedup_key``).

    ``key_expr`` is the dedup-key Column (``exact_key_expr`` /
    ``near_key_expr`` or any deterministic expression over the batch
    columns).
    """
    keyed = batch.withColumn("dedup_key", key_expr)
    w = Window.partitionBy("dedup_key").orderBy(F.col(id_col).asc())
    batch_unique = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if _exists(spark, registry_path):
        # prune the registry read to the prefixes this batch touches:
        # a small batch reads a few of the 256 partition dirs, not the
        # whole registry.  The prefix list is ≤256 values — a driver
        # collect of a bounded aggregate, not data.
        prefixes = [
            r[0]
            for r in batch_unique.select(_prefix_expr().alias("p"))
            .distinct()
            .collect()
        ]
        reg = _pruned_registry(spark, registry_path, prefixes)
        fresh = batch_unique.join(reg, "dedup_key", "left_anti")
    else:
        fresh = batch_unique
    # materialize ONCE: the fresh set feeds both the registry append
    # and the caller; recomputing it after the append would re-read a
    # registry that now contains this batch's keys (→ empty result)
    fresh = fresh.localCheckpoint(eager=True)
    # guard the append on non-empty fresh: an empty write would create
    # a registry directory holding only _SUCCESS, and a schemaless
    # parquet read of that directory fails inference forever after
    # (read_registry now also reads with an explicit schema, but an
    # empty append buys nothing and costs a commit)
    if fresh.limit(1).count() > 0:
        (
            fresh.select(
                "dedup_key",
                F.col(id_col).cast("long").alias("keep_id"),
                _prefix_expr().alias(_PREFIX_COL),
            )
            .write.mode("append")
            .partitionBy(_PREFIX_COL)
            .parquet(registry_path)
        )
    return fresh


def _pruned_registry(
    spark: SparkSession, registry_path: str, prefixes: list[str]
) -> DataFrame:
    """The registry scan restricted to the given prefix partitions —
    exposed so tests can assert the PartitionFilters actually land."""
    return (
        spark.read.schema(_REGISTRY_SCHEMA + f", {_PREFIX_COL} string")
        .parquet(registry_path)
        .filter(F.col(_PREFIX_COL).isin(prefixes))
        .select("dedup_key")
    )


def registry_stats(spark: SparkSession, path: str) -> DataFrame:
    """Registry health readout: total keys + partition skew (max/avg
    prefix load) — the number to watch before a prefix needs salting."""
    reg = spark.read.parquet(path)
    per = reg.groupBy(_PREFIX_COL).agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.sum("n").alias("total_keys"),
        F.count(F.lit(1)).alias("n_prefixes"),
        F.max("n").alias("max_prefix_keys"),
        (F.max("n") / (F.sum("n") / F.count(F.lit(1)))).alias("skew_ratio"),
    )
