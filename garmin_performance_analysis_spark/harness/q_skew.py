"""Skew-mitigation catalog entries: the salting operators
(``operators/skew.py``) finally carry oracles — an untested operator
is an unproven one (round-7 VERDICT item 6b).

Both entries build a DELIBERATELY power-law-keyed frame from events
(one hot key holding most rows — the distribution that makes a plain
hash exchange put one straggler task on the hot key at 100 TB) and
pin the salted plan to the plain-SQL answer: salting is a pure
physical rewrite, so the oracle is the unsalted GROUP BY / JOIN and
any result difference means the rewrite broke associativity.

Cross-engine numeric discipline: the salted SUM re-combines per-bucket
partials, so the sum MUST be order-independent — DECIMAL end to end
(the registry convention); min/max/count are order-free already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_aggregate, salted_join
from ..sources.tables import load_table
from .registry import register

# ~90% of events share user_id % 10 != 0 -> key -1 (the hot key); the
# rest keep their user_id.  Mirrored verbatim in both engines.
_K1_KEY_SQL = "CASE WHEN user_id % 10 <> 0 THEN -1 ELSE user_id END"

# ~75% of events hit nation 7; the rest spread over all 25 nations.
_K2_KEY_SQL = "CASE WHEN event_id % 4 <> 0 THEN 7 ELSE user_id % 25 END"


@register(
    "k1_salted_hot_key_agg",
    oracle=f"""
SELECT {_K1_KEY_SQL} AS skew_key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1
""",
    tags=("skew", "aggregate"),
)
def k1_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SALTED aggregation over a power-law key (~90% of rows
    on one hot key): stage 1 groups by (key, salt=pmod(hash(row),16))
    so the hot key's rows spread over 16 reduce tasks, stage 2
    re-combines the <=16 per-bucket partials per key
    (``operators/skew.salted_aggregate``).  The oracle is the PLAIN
    one-stage GROUP BY: salting must be invisible in the result, which
    only holds because the SUM re-combines exactly (DECIMAL partials —
    a double sum would wobble in the last ulps with bucket order).
    At 100 TB this is the straggler-killer for the final-agg task AQE
    can't split (same key, one group)."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.expr(_K1_KEY_SQL).alias("skew_key"),
        "event_id",
        "value",
        F.col("value").cast("decimal(30,12)").alias("_vdec"),
    )
    out = salted_aggregate(
        keyed,
        ["skew_key"],
        {
            "n_rows": ("value", "count"),
            "sum_value": ("_vdec", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        buckets=16,
        salt_on=["event_id"],
    )
    return out.select(
        "skew_key",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    )


@register(
    "k2_salted_skew_join",
    oracle=f"""
WITH keyed AS (
  SELECT {_K2_KEY_SQL} AS n_key, value FROM events
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(k.value AS DECIMAL(30,12))) AS DOUBLE) AS sum_value
FROM keyed k JOIN nation n ON k.n_key = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("skew", "join"),
)
def k2_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED equi-join on a power-law foreign key (~75% of fact rows
    on one dimension key): the fact side is salted, the dim side
    replicated once per salt bucket, and the join runs on (key, salt)
    so the hot key spreads over 16 tasks
    (``operators/skew.salted_join``).  The fact side carries a
    SHUFFLE_HASH hint because at this fixture scale Spark would
    broadcast the 25-row dim and the salt would never reach a shuffle
    — the hint forces the exchange-on-(key,salt) plan the operator
    exists for (the regime where the dim is too big to broadcast; when
    it fits, broadcast and skip salting entirely, as the module doc
    says).  The oracle is the PLAIN join + GROUP BY: replication must
    be invisible in the result."""
    ev = load_table(spark, sf_dir, "events")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n_key"), "n_name"
    )
    facts = ev.select(
        F.expr(_K2_KEY_SQL).alias("n_key"),
        F.col("value").cast("decimal(30,12)").alias("_vdec"),
    )
    joined = salted_join(
        facts.hint("SHUFFLE_HASH"), nat, ["n_key"], buckets=16
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_vdec").cast("double").alias("sum_value"),
    )


@register(
    "k3_hot_key_report",
    oracle=f"""
WITH keyed AS (
  SELECT {_K1_KEY_SQL} AS skew_key FROM events
),
tot AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT skew_key) AS n_keys
        FROM keyed),
per AS (
  SELECT skew_key, COUNT(*) AS n_rows FROM keyed GROUP BY 1
),
top AS (
  SELECT skew_key, n_rows,
         ROW_NUMBER() OVER (ORDER BY n_rows DESC, skew_key ASC) AS rk
  FROM per
)
SELECT rk, skew_key, CAST(n_rows AS BIGINT) AS n_rows,
       ROUND(n_rows * 1.0 / t.n_total, 6) AS share,
       ROUND(n_rows * t.n_keys * 1.0 / t.n_total, 6) AS x_over_uniform,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(t.n_keys AS BIGINT) AS n_keys
FROM top, tot t
WHERE rk <= 10
""",
    tags=("skew", "profiling"),
)
def k3_hot_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic — the report run BEFORE choosing k1/k2's
    salting strategies: top-10 keys by row count with each key's share
    of the table and its multiple over the uniform share
    (n_rows·n_keys/n_total — the straggler factor a plain hash
    exchange hands that key's one task).  On the deliberately
    power-law frame the hot key reads ~9x uniform, which is the
    evidence that says "salt this aggregation" at 100 TB; on a
    healthy key the report says so and the plain exchange stays.

    Shape: one keyed count agg (map-side combined), top-10 via a
    rank over the key-cardinality frame ordered inside ONE exchange
    (TakeOrdered semantics — never a row-cardinality global sort),
    totals broadcast on.  All-integer outputs to the 6dp ratios."""
    from pyspark.sql import Window

    from ..operators.windows import bounded_partition_key

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.expr(_K1_KEY_SQL).alias("skew_key"))
    per = keyed.groupBy("skew_key").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per.agg(
        F.sum("n_rows").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top10 = per.orderBy(F.col("n_rows").desc(), F.col("skew_key").asc()).limit(
        10
    )
    w = Window.partitionBy(bounded_partition_key("skew_key")).orderBy(
        F.col("n_rows").desc(), F.col("skew_key").asc()
    )
    ranked = top10.withColumn("rk", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rk",
        "skew_key",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(F.col("n_rows") * 1.0 / F.col("n_total"), 6).alias("share"),
        F.round(
            F.col("n_rows") * F.col("n_keys") * 1.0 / F.col("n_total"), 6
        ).alias("x_over_uniform"),
        "n_total",
        "n_keys",
    )
