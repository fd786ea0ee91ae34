"""Event-sequence analytics: funnel step resolution and cohort
retention — the two classic event-table reductions every product/
behavior pipeline runs beside sessionization (t9) and gap analysis.

Both are pure key-family plans: every join and aggregate shuffles on
the entity key (or a low-cardinality derivative), so at 100 TB they
are ordinary hash exchanges with no global state.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    horizon_sec: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel resolution: per key, the earliest time of
    ``steps[0]``, then the earliest STRICTLY-LATER occurrence of each
    subsequent step, optionally bounded to ``horizon_sec`` after step
    1 — "first view, first click after that, first purchase after
    that, within a week".

    Strictness matters: a click logged at the same microsecond as the
    view must NOT complete the step (equal-timestamp ordering is
    engine-dependent; strict ``>`` is not).  Per-step resolution is a
    min-aggregate, so a key with thousands of step events costs one
    partial-aggregated pass, not a per-key sort.

    Plan shape for 100 TB: one filtered min-agg per step plus one join
    per step, ALL keyed on ``key_cols`` — len(steps) is a small
    constant, and every exchange reuses the same key hash (AQE plans
    one family).  No windows, no per-key event collection.

    Output: key cols + step_1_ts..step_N_ts (null once the funnel is
    abandoned; later steps null by construction when an earlier one
    is) + steps_completed.  Rows = keys that performed step 1.
    """
    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    keys = list(key_cols)
    acc = (
        df.filter(F.col(step_col) == steps[0])
        .groupBy(*keys)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, s in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(step_col) == s).select(
            *keys, F.col(ts_col).alias("_t")
        )
        cond = F.col("_t") > F.col(f"step_{i - 1}_ts")
        if horizon_sec is not None:
            cond = cond & (
                F.col("_t").cast("long")
                <= F.col("step_1_ts").cast("long") + int(horizon_sec)
            )
        nxt = (
            ev.join(
                acc.select(
                    *keys, "step_1_ts", f"step_{i - 1}_ts"
                ).distinct()
                if i > 2
                else acc,
                keys,
            )
            .filter(cond)
            .groupBy(*keys)
            .agg(F.min("_t").alias(f"step_{i}_ts"))
        )
        acc = acc.join(nxt, keys, "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.when(
            F.col(f"step_{i}_ts").isNotNull(), 1
        ).otherwise(0)
    return acc.withColumn(
        "steps_completed", completed.cast("bigint")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_periods: int = 12,
) -> DataFrame:
    """Monthly cohort retention: assign each user to the calendar
    month of their FIRST event, then for each offset k count how many
    of that cohort were active k months later — the triangle every
    growth dashboard draws.

    Months are compared as ``year*12 + month`` indices (no timestamp
    arithmetic to disagree on); retention is n_active/n_cohort rounded
    to 6dp.  k = 0 is the cohort month itself (retention 1.0 by
    construction — kept as the sanity row).

    Plan shape for 100 TB: distinct (user, month) and min-month both
    shuffle on the user key; the final rollup shuffles on the tiny
    (cohort, k) key.  No windows.
    """
    mi = (F.year(ts_col) * 12 + F.month(ts_col)).alias("_mi")
    active = df.select(F.col(user_col).alias("_u"), mi).distinct()
    first = active.groupBy("_u").agg(F.min("_mi").alias("_cohort_mi"))
    sizes = first.groupBy("_cohort_mi").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    joined = (
        active.join(first, "_u")
        .withColumn("k", (F.col("_mi") - F.col("_cohort_mi")).cast("bigint"))
        .filter((F.col("k") >= 0) & (F.col("k") <= int(max_periods)))
    )
    counts = joined.groupBy("_cohort_mi", "k").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    out = counts.join(sizes, "_cohort_mi")
    cohort_str = F.concat_ws(
        "-",
        F.floor((F.col("_cohort_mi") - 1) / 12).cast("bigint"),
        F.lpad(
            ((F.col("_cohort_mi") - 1) % 12 + 1).cast("string"), 2, "0"
        ),
    )
    return out.select(
        cohort_str.alias("cohort_month"),
        "k",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )
