"""Remaining small §2 line items: J3 join+latest, A3 bulk per-key
average, P1 allowlist projection, O3 top-k by |z|, and the M3 hinge
(heat-model) variant."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.datetime_funcs import day_number
from ..operators.regression import ols2_by_group
from ..operators.windows import latest_per_key, zscore
from ..sources.tables import load_table
from .registry import dec_avg as _dec_avg
from .registry import r6 as _r6
from .registry import register


@register(
    "j3_join_latest_in_window",
    oracle="""
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey AS latest_orderkey,
       l.o_totalprice AS latest_totalprice
FROM customer c JOIN latest l ON c.c_custkey = l.o_custkey AND l.rn = 1
""",
    tags=("join", "window"),
)
def j3_join_latest_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: dim ⋈ latest-fact-in-window — "latest VO2max in range"
    (``fitness_assessor.py:147-157``): window the fact to rank-1 per
    key, then join the dimension."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    latest = latest_per_key(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )
    cust = load_table(spark, sf_dir, "customer")
    return cust.join(latest, cust.c_custkey == latest.o_custkey).select(
        "c_custkey",
        "c_mktsegment",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


@register(
    "a3_bulk_per_key_avg",
    oracle="""
SELECT l_orderkey, ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,12))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price
FROM lineitem
WHERE l_orderkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
  AND l_extendedprice IS NOT NULL
GROUP BY l_orderkey
""",
    tags=("agg",),
)
def a3_bulk_per_key_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: bulk IN-list per-key average — the N+1-elimination fetch
    (``readers/splits.py:379-423``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_orderkey").isin(1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
            & F.col("l_extendedprice").isNotNull()
        )
        .groupBy("l_orderkey")
        .agg(_r6(_dec_avg(F.col("l_extendedprice"))).alias("avg_price"))
    )


_EVENT_ALLOWED = frozenset({"event_id", "ts", "user_id", "event_type", "value", "props"})


@register(
    "p1_allowlist_projection",
    oracle="""
SELECT event_id, event_type, value FROM events
""",
    tags=("scan",),
)
def p1_allowlist_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: dynamic column fetch validated against a frozenset allowlist
    (the SQL-injection guard, ``readers/metadata.py:21-35``) — unknown
    names are dropped before the plan is built."""
    requested = ["event_id", "event_type", "value", "evil; DROP TABLE", "nope"]
    safe = [c for c in requested if c in _EVENT_ALLOWED]
    return load_table(spark, sf_dir, "events").select(*safe)


@register(
    "o3_top5_by_abs_z",
    oracle="""
WITH z AS (
  SELECT event_id, event_type, value,
         AVG(value) OVER (PARTITION BY event_type) AS m,
         STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS s
  FROM events
)
SELECT event_id, event_type,
       ROUND(CASE WHEN s > 0 THEN (value - m) / s ELSE 0.0 END, 6) AS z
FROM z
ORDER BY ABS(CASE WHEN s > 0 THEN (value - m) / s ELSE 0.0 END) DESC, event_id ASC
LIMIT 5
""",
    tags=("topk", "anomaly"),
)
def o3_top5_by_abs_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-5 anomalies by |z| with a deterministic id tie-break
    (``form_anomaly_detector.py:947-959``)."""
    ev = load_table(spark, sf_dir, "events")
    z = zscore(ev, ["event_type"], "value")
    return (
        z.orderBy(F.abs(F.col("z")).desc(), F.col("event_id").asc())
        .limit(5)
        .select("event_id", "event_type", _r6(F.col("z")).alias("z"))
    )


@register(
    "m3b_hinge_heat_model",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(hour(ts) AS DOUBLE) AS x1,
         GREATEST(value - 15.0, 0.0) AS x2,
         value + CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my,
         COVAR_POP(x1, y) AS c1y, COVAR_POP(x2, y) AS c2y,
         COVAR_POP(x1, x2) AS c12, VAR_POP(x1) AS v1, VAR_POP(x2) AS v2
  FROM d GROUP BY event_type
)
SELECT event_type, n,
       ROUND((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12), 6) AS b1,
       ROUND((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12), 6) AS b2,
       ROUND(my - ((c1y*v2 - c2y*c12) / (v1*v2 - c12*c12))*m1
                - ((c2y*v1 - c1y*c12) / (v1*v2 - c12*c12))*m2, 6) AS b0
FROM m WHERE n >= 10 AND (v1*v2 - c12*c12) > 1e-12
""",
    tags=("ml", "regression"),
)
def m3b_hinge_heat_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 with the reference's hinge covariate: ``max(temp - 15, 0)``
    (``heat_adjustment.py:38-115`` — heat stress only counts above the
    15°C hinge)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    prepared = ev.select(
        "event_type",
        F.hour("ts").cast("double").alias("x1"),
        F.greatest(F.col("value") - 15.0, F.lit(0.0)).alias("x2"),
        (F.col("value") + day_number(F.col("ts")).cast("double")).alias("y"),
    )
    out = ols2_by_group(prepared, ["event_type"], "x1", "x2", "y", min_points=10)
    return out.select(
        "event_type",
        "n",
        _r6(F.col("b1")).alias("b1"),
        _r6(F.col("b2")).alias("b2"),
        _r6(F.col("b0")).alias("b0"),
    )
