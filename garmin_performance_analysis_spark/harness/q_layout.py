"""Data-layout catalog entries (beyond-reference, SURVEY §2.14):
Z-order (Morton) multi-dimensional clustering — the public technique
behind Delta Lake's OPTIMIZE ZORDER and Hudi/Iceberg sort-order
optimization (Morton 1966; databricks engineering blog describes the
same bit-interleave).  At 100 TB the payoff is FILE SKIPPING: sort or
``repartitionByRange`` on the interleaved key before writing parquet
and every file's min/max column stats cover a small tile in EVERY
interleaved dimension, so a predicate on any of them prunes files —
a linear sort key gives that for only its leading column.

Here the index math is the hash-oracled part (pure integer bit ops —
bit-identical cross-engine), and the tile-stats output IS the skipping
demonstration: each 256-z-value bucket covers a ≤16×16 tile of the
(x, y) plane, i.e. BOTH dimensions are bounded per bucket, which is
the property file skipping consumes.  ``tests/test_operators.py``
asserts the tile bound and the contrast with a single-column layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_BITS = 8


def _interleave_sql(xcol: str, ycol: str) -> str:
    """Morton interleave of two _BITS-bit ints as pure +/>>/&
    arithmetic — the identical expression string runs on both engines
    (Spark via ``F.expr``, DuckDB verbatim), so there is nothing to
    drift."""
    even = " + ".join(f"(({xcol} >> {i}) & 1) * {4 ** i}" for i in range(_BITS))
    odd = " + ".join(f"(({ycol} >> {i}) & 1) * {4 ** i}" for i in range(_BITS))
    return f"({even}) + 2 * ({odd})"


_Z_EXPR = _interleave_sql("x", "y")


@register(
    "z1_zorder_layout",
    oracle=f"""
WITH dims AS (
  SELECT event_id % 256 AS x,
         CAST(FLOOR(ABS(value)) AS BIGINT) % 256 AS y
  FROM events
),
z AS (
  SELECT x, y, {_Z_EXPR} AS zval FROM dims
)
SELECT CAST(zval >> 8 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z
GROUP BY 1
""",
    tags=("layout", "zorder"),
)
def z1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering index: interleave the bits of two dimensions
    (x = event_id mod 256, y = floor(|value|) mod 256) into one Morton
    key, bucket by its top 8 bits, and emit per-bucket min/max of BOTH
    dimensions.  Every bucket is a ≤16×16 tile — both dimensions
    bounded — which is what parquet min/max file stats need for
    two-column file skipping after a ``repartitionByRange(zval)``
    write (the Delta OPTIMIZE ZORDER shape; the write itself is
    exercised by the silver layer, the INDEX MATH is what must be
    exact and is hash-oracled here).  The interleave is one in-row
    integer expression — no shuffle beyond the final bucket rollup,
    whole-stage-codegen-friendly, and bit-identical cross-engine
    because only +, >>, & touch the data."""
    ev = load_table(spark, sf_dir, "events")
    dims = ev.select(
        (F.col("event_id") % 256).alias("x"),
        (F.floor(F.abs(F.col("value"))).cast("bigint") % 256).alias("y"),
    )
    z = dims.withColumn("zval", F.expr(_Z_EXPR))
    return (
        z.groupBy(F.expr("zval >> 8").cast("bigint").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
