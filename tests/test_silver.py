"""Silver-layer layout tests: partition-scoped DELETE+INSERT semantics,
partition pruning, and shuffle-free bucketed joins."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.pipelines.silver import (
    MONTH_COL,
    delete_insert_by_key,
    read_silver,
    write_bucketed,
    write_partitioned,
)


def d(s):
    return datetime.date.fromisoformat(s)


def _base(spark):
    return spark.createDataFrame(
        [
            (1, d("2024-01-05"), 10.0),
            (2, d("2024-01-20"), 11.0),
            (3, d("2024-02-03"), 12.0),
            (4, d("2024-03-09"), 13.0),
        ],
        "activity_id long, activity_date date, total_distance_km double",
    )


def test_delete_insert_replaces_only_incoming_keys(spark, tmp_path):
    path = str(tmp_path / "activities")
    write_partitioned(_base(spark), path, "activity_date")

    # re-ingest activity 2 with corrected values + a brand-new activity
    batch = spark.createDataFrame(
        [(2, d("2024-01-20"), 99.0), (5, d("2024-01-31"), 14.0)],
        "activity_id long, activity_date date, total_distance_km double",
    )
    delete_insert_by_key(spark, path, batch, "activity_id", "activity_date")

    out = {
        r["activity_id"]: r["total_distance_km"]
        for r in read_silver(spark, path).collect()
    }
    assert out == {1: 10.0, 2: 99.0, 3: 12.0, 4: 13.0, 5: 14.0}

    # idempotent: the same batch again changes nothing
    delete_insert_by_key(spark, path, batch, "activity_id", "activity_date")
    out2 = {
        r["activity_id"]: r["total_distance_km"]
        for r in read_silver(spark, path).collect()
    }
    assert out2 == out


def test_delete_insert_leaves_untouched_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "activities")
    write_partitioned(_base(spark), path, "activity_date")
    march = os.path.join(path, f"{MONTH_COL}=2024-03")
    before = {f: os.path.getmtime(os.path.join(march, f)) for f in os.listdir(march)}

    batch = spark.createDataFrame(
        [(2, d("2024-01-20"), 99.0)],
        "activity_id long, activity_date date, total_distance_km double",
    )
    delete_insert_by_key(spark, path, batch, "activity_id", "activity_date")

    after = {f: os.path.getmtime(os.path.join(march, f)) for f in os.listdir(march)}
    assert after == before  # March partition neither rewritten nor dropped


def test_delete_insert_key_moved_to_other_month(spark, tmp_path):
    """A re-ingested key whose event date moved months must not leave a
    stale duplicate in the old month (ADVICE r1: key-scoped DELETE)."""
    path = str(tmp_path / "activities")
    write_partitioned(_base(spark), path, "activity_date")

    # key 2 moves Jan→Apr (Jan keeps key 1), key 3 moves Feb→Apr
    # (Feb empties entirely — its directory must be dropped too)
    batch = spark.createDataFrame(
        [(2, d("2024-04-02"), 55.0), (3, d("2024-04-03"), 56.0)],
        "activity_id long, activity_date date, total_distance_km double",
    )
    delete_insert_by_key(spark, path, batch, "activity_id", "activity_date")

    rows = read_silver(spark, path).collect()
    out = {r["activity_id"]: (str(r["activity_date"]), r["total_distance_km"]) for r in rows}
    assert out == {
        1: ("2024-01-05", 10.0),
        2: ("2024-04-02", 55.0),
        3: ("2024-04-03", 56.0),
        4: ("2024-03-09", 13.0),
    }
    assert len(rows) == 4  # no stale duplicates anywhere
    assert not os.path.exists(os.path.join(path, f"{MONTH_COL}=2024-02"))


def test_write_partitioned_full_rebuild_drops_absent_months(spark, tmp_path):
    """Full rebuild is a static overwrite: months absent from the new
    frame disappear from disk (ADVICE r1)."""
    path = str(tmp_path / "activities")
    write_partitioned(_base(spark), path, "activity_date")
    rebuilt = spark.createDataFrame(
        [(1, d("2024-01-05"), 10.0)],
        "activity_id long, activity_date date, total_distance_km double",
    )
    write_partitioned(rebuilt, path, "activity_date")
    assert not os.path.exists(os.path.join(path, f"{MONTH_COL}=2024-02"))
    assert [r["activity_id"] for r in read_silver(spark, path).collect()] == [1]


def test_month_filter_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "activities")
    write_partitioned(_base(spark), path, "activity_date")
    plan = (
        read_silver(spark, path)
        .filter(F.col(MONTH_COL) == "2024-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter, not a data filter: pruning happens at planning
    assert "PartitionFilters" in plan and "2024-01" in plan


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("activity_id"), (F.col("id") * 2.0).alias("km")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("activity_id"), (F.col("id") % 7).alias("zone")
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(left, "b_left", "activity_id")
        write_bucketed(right, "b_right", "activity_id")
        # force the sort-merge path (tiny test tables would broadcast,
        # which also disables bucketed scans): the claim under test is
        # the fact⋈fact case where broadcasting is impossible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_left").join(spark.table("b_right"), "activity_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # no shuffle either side
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
