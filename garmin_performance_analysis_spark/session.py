"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
settings below are chosen so the same logical plans scale to a real
multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
- shuffle partitions sized to cores locally; on a cluster AQE coalesces
- UTC session timezone so timestamp semantics match a UTC-naive oracle
- Arrow enabled for the (rare) pandas_udf paths
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "garmin_performance_analysis_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at Spark's default (true): coalescing
        # purely by BYTES (false + 64 m advisory) collapsed every small
        # post-shuffle stage to ONE task, which serializes CPU-dense
        # aggregations whose bytes are tiny but whose per-row work is
        # not (d10's fused decimal-fold aggregation ran as two
        # single-task jobs of 7.5 s + 4.0 s in the stage profile;
        # 5.04 s → 1.59 s best-of-3 after the flip, with m16 0.70×,
        # t4 0.69×, a19 0.77×, g8 0.82× in the same matched A/B).
        # KB-scale frames still coalesce to one task under true —
        # minPartitionSize caps the split — so the per-exchange
        # scheduling saving that motivated false is retained where it
        # matters.  Env-overridable for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let the planner pick shuffled-hash join where its size checks
        # pass (guide §3.1): SMJ pays two sorts a hash join does not,
        # and AQE additionally rewrites SMJ→SHJ at runtime when every
        # post-shuffle partition is under the local-map threshold.
        # Physical-plan-only (bit-identical results); both knobs
        # env-overridable — on memory-tight clusters set the threshold
        # back to 0 and/or preferSortMergeJoin=true.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Streaming state-store backend (round-12 VERDICT item 5):
        # measured at sf0.1, RocksDB LOSES on every join replay —
        # i4 3.99→6.24/6.54 s, i9 3.80→5.99/6.76 s (with and without
        # changelog checkpointing), i3 ±0.4 s — the native store's
        # per-commit open/compact overhead × (4 stores × partitions ×
        # micro-batches) dominates at KB-scale state, so the
        # HDFS-backed default stays.  At cluster scale (state ≫ heap)
        # RocksDB is the production choice: set
        # SPARK_GRAFT_STATE_STORE_PROVIDER=org.apache.spark.sql.
        # execution.streaming.state.RocksDBStateStoreProvider.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "SPARK_GRAFT_STATE_STORE_PROVIDER",
                "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider",
            ),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
