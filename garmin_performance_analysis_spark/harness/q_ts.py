"""Time-series / anomaly queries (SURVEY.md §2.11: T1 is in q_window;
here T3 sustained runs, T5 temporal clusters, S4/W3 watermark cursors)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import sustained_islands, zscore
from ..sources.tables import load_table
from .registry import r6 as _r6
from .registry import register


@register(
    "t3_sustained_islands",
    oracle="""
WITH flagged AS (
  SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.05
),
numbered AS (
  SELECT l_orderkey, l_linenumber,
         l_linenumber - LAG(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS gap
  FROM flagged
),
islands AS (
  SELECT l_orderkey, l_linenumber,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 2 THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
  FROM numbered
)
SELECT l_orderkey, island_id,
       MIN(l_linenumber) AS island_start,
       MAX(l_linenumber) AS island_end,
       COUNT(*) AS island_rows
FROM islands
GROUP BY l_orderkey, island_id
HAVING MAX(l_linenumber) - MIN(l_linenumber) + 1 >= 3
""",
    tags=("anomaly", "window"),
)
def t3_sustained_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 sustained-run filter: flagged rows grouped with ≤2-step
    adjacency, keeping runs spanning ≥3 (span = last-first+1) — the
    form-anomaly sustained gate (``form_anomaly_detector.py:289-328``),
    whose off-by-one span semantics the oracle reproduces exactly.

    Flagged rows are DISTINCT (the reference flags unique seconds) —
    also load-bearing for determinism: with duplicate order keys, a
    LAG-then-cumsum pair of windows may order ties differently between
    (or even within) engines, silently moving an island boundary onto a
    different duplicate.  Found by the sf0.1 sweep; sf0.01 lacks the
    colliding keys."""
    li = load_table(spark, sf_dir, "lineitem")
    flagged = (
        li.filter(F.col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber")
        .distinct()
    )
    return sustained_islands(
        flagged, ["l_orderkey"], "l_linenumber", max_gap=2, min_span=3
    )


@register(
    "t5_cluster_buckets",
    oracle="""
WITH z AS (
  SELECT event_id, event_type, value, epoch_us(ts) // 1000000 AS sec,
         AVG(value) OVER (PARTITION BY event_type) AS m,
         STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS s
  FROM events
),
anom AS (
  SELECT event_type, sec // 300 AS bucket_5min,
         CASE WHEN s > 0 THEN (value - m) / s ELSE 0.0 END AS zval
  FROM z
  WHERE ABS(CASE WHEN s > 0 THEN (value - m) / s ELSE 0.0 END) > 2.0
)
SELECT event_type, bucket_5min, COUNT(*) AS n_anomalies,
       ROUND(MAX(ABS(zval)), 6) AS max_abs_z
FROM anom
GROUP BY event_type, bucket_5min
""",
    tags=("anomaly",),
)
def t5_cluster_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 temporal anomaly clusters: z>2 outliers pooled into 5-minute
    buckets with the peak |z| per cluster
    (``form_anomaly_detector.py:690-786``, ``floor(ts/300)`` buckets)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.expr("unix_micros(ts) div 1000000")
    )
    z = zscore(ev, ["event_type"], "value")
    return (
        z.filter(F.abs(F.col("z")) > 2.0)
        .groupBy(
            "event_type",
            F.expr("sec div 300").alias("bucket_5min"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_anomalies"),
            _r6(F.max(F.abs(F.col("z")))).alias("max_abs_z"),
        )
    )


@register(
    "s4_watermark_cursor",
    oracle="""
SELECT o_orderstatus,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date,
       COUNT(*) AS n_rows
FROM orders
GROUP BY o_orderstatus
""",
    tags=("source", "incremental"),
)
def s4_watermark_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/W3 catch-up watermark cursor: per-domain MAX(date) that the
    incremental ingest resumes from (``db_reader.py:217-282``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "t9_event_sessions",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) // 1000000
           - LAG(epoch_us(ts) // 1000000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts, value,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM ordered
)
SELECT user_id, session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       epoch_us(MAX(ts)) // 1000000 - epoch_us(MIN(ts)) // 1000000 AS duration_sec,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 6)
         AS total_value
FROM marked
GROUP BY user_id, session_seq
""",
    tags=("window", "composite"),
)
def t9_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-gap sessionization — the canonical event-stream
    operator a training/analytics pipeline runs before any per-session
    feature: a new session starts after >30 min of inactivity.  One
    LAG + running-sum window pair per user (ordering includes event_id
    so duplicate timestamps cannot move a boundary between engines —
    the t3 duplicate-key lesson) and one grouped aggregate; value sums
    go through DECIMAL for shuffle-order determinism.  Scale shape:
    single hash shuffle on user_id, no cross-partition state (the
    streaming sibling is ``streaming/stateful.py``'s session logic)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "session_seq",
        F.sum(
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return marked.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(epoch) - F.min(epoch)).alias("duration_sec"),
        _r6(
            F.sum(F.col("value").cast("decimal(30,12)")).cast("double")
        ).alias("total_value"),
    )
