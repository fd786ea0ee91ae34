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
        # Respect the advisory partition size when coalescing instead of
        # stopping at the default parallelism (Spark docs recommend
        # false for exactly this reason).  With the default (true), a
        # KB-sized post-shuffle stage still fans out to ~cores tasks and
        # every exchange pays ~cores scheduling round-trips; with false,
        # AQE sizes reduce stages by bytes — one task for KB-scale
        # frames locally, advisory-sized (64 MB+) partitions at cluster
        # scale.  Scale-adaptive by construction (bytes, not a core
        # count); both knobs overridable via env for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"),
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
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
