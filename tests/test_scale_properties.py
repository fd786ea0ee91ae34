"""Scale-mechanics tests: partition pruning on date-partitioned silver
tables, and salting correctness (SCALING.md 'Storage & partitioning' /
'Skew')."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from garmin_performance_analysis_spark.plans.checks import formatted_plan


def test_date_partitioned_silver_prunes(spark, tmp_path):
    """A silver table partitioned by month must show PartitionFilters
    (directory-level pruning) for a month predicate — the Spark
    equivalent of the reference's ART-index date cursors."""
    path = str(tmp_path / "silver_events")
    df = spark.createDataFrame(
        [(i, f"2024-{1 + i % 3:02d}-15", float(i)) for i in range(300)],
        "id long, d string, v double",
    ).withColumn("month", F.substring("d", 1, 7))
    df.write.partitionBy("month").mode("overwrite").parquet(path)

    q = spark.read.parquet(path).filter(F.col("month") == "2024-02")
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan
    assert "2024-02" in plan  # the predicate reached the directory scan
    # and only the matching partition's rows are read
    assert q.count() == 100


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        # key 'hot' holds 80% of rows — the straggler shape
        [("hot" if i % 5 != 0 else f"k{i % 7}", i, float(i)) for i in range(2000)],
        "k string, n long, v double",
    )
    got = {
        (r["k"], r["total"], r["cnt"], r["lo"], r["hi"])
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "total": ("v", "sum"),
                "cnt": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            buckets=8,
        ).collect()
    }
    want = {
        (r["k"], r["total"], r["cnt"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_aggregate_rejects_non_algebraic(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(df, ["k"], {"m": ("v", "avg")})


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot" if i % 3 else f"k{i % 5}", i) for i in range(500)], "k string, n long"
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k4", 3.0), ("cold", 9.0)], "k string, w double"
    )
    got = sorted(
        (r["k"], r["n"], r["w"])
        for r in salted_join(big, small, ["k"], buckets=4).collect()
    )
    want = sorted(
        (r["k"], r["n"], r["w"]) for r in big.join(small, "k").collect()
    )
    assert got == want
    # left join keeps unmatched big-side rows exactly once
    got_left = sorted(
        (r["k"], r["n"], r["w"])
        for r in salted_join(big, small, ["k"], buckets=4, how="left").collect()
    )
    want_left = sorted(
        (r["k"], r["n"], r["w"]) for r in big.join(small, "k", "left").collect()
    )
    assert got_left == want_left
