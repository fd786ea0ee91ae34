"""Plan-shape assertions: the scale properties the README/SCALING.md
claim must be visible in the physical plan, not just asserted in prose."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.harness.catalog import CATALOG
from garmin_performance_analysis_spark.plans import checks
from garmin_performance_analysis_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_projection_scan_prunes_readschema(spark):
    df = CATALOG["s3_projection_scan"].fn(spark, SF_SMOKE)
    cols = checks.read_schema_columns(df)
    # 3 projected + the filter column; the other 7 lineitem columns gone
    assert set(cols) <= {"l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"}
    assert len(cols) <= 4


def test_point_lookup_pushes_filter(spark):
    df = CATALOG["p2_point_lookup"].fn(spark, SF_SMOKE)
    assert checks.has_pushed_filters(df)


def test_date_range_pushes_filter(spark):
    df = CATALOG["p3_date_range"].fn(spark, SF_SMOKE)
    assert checks.has_pushed_filters(df)


def test_dim_joins_broadcast(spark):
    df = CATALOG["j1_revenue_by_nation"].fn(spark, SF_SMOKE)
    assert checks.uses_broadcast_join(df)


def test_flagship_uses_codegen(spark):
    df = CATALOG["q1_pricing_summary"].fn(spark, SF_SMOKE)
    assert checks.has_whole_stage_codegen(df)


def test_flagship_single_shuffle(spark):
    # scan -> partial agg -> exchange on group key -> final agg: exactly 1
    df = CATALOG["q1_pricing_summary"].fn(spark, SF_SMOKE)
    assert checks.count_shuffles(df) == 1


def test_asof_join_broadcasts_small_side(spark):
    df = CATALOG["j7_nearest_date_asof"].fn(spark, SF_SMOKE)
    assert checks.uses_broadcast_join(df)


def test_preagg_join_aggregates_before_join(spark):
    plan = checks.formatted_plan(CATALOG["j6_preagg_join"].fn(spark, SF_SMOKE))
    # the aggregate must appear below the join in the plan tree
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_j8_unbounded_asof_broadcasts_dim(spark):
    # unbounded nearest-covariate: the dim MUST broadcast (the join is
    # a per-left-row fan-out over the whole dim)
    df = CATALOG["j8_nearest_covariate"].fn(spark, SF_SMOKE)
    assert checks.uses_broadcast_join(df)


def test_d10_shares_one_partition_shuffle(spark):
    # the lag chain, rep numbering, median gate and both grouped passes
    # all key on activity_id: one shuffle for the window pass plus one
    # for each grouped pass at most — no accidental re-partitioning
    df = CATALOG["d10_performance_trends"].fn(spark, SF_SMOKE)
    assert checks.count_shuffles(df) <= 3


def test_profile_median_is_distributed(spark):
    # the profiler must NOT use the single-group percentile aggregate
    # (its final merge buffers a whole column in one task)
    df = CATALOG["a9_profile_table"].fn(spark, SF_SMOKE)
    plan = checks.formatted_plan(df)
    assert "percentile" not in plan.lower()
