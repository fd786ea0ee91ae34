"""Regression operators (SURVEY.md §2.10, M1-M5).

The reference runs scipy ``linregress`` / sklearn OLS per group on tiny
groups (``mcp/rag/queries/trends.py:103-159``,
``mcp/rag/queries/heat_adjustment.py:38-115``).  At Spark scale the
right shape is a *closed-form aggregation*: slope/intercept/r² are pure
``regr_*``-style moments, computed map-side in one pass with no Python.
A grouped ``applyInPandas`` variant exists for the cases that genuinely
need scipy/sklearn numerics (Huber, RANSAC, p-values from the t CDF).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linregress_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    min_points: int = 3,
) -> DataFrame:
    """Per-group simple OLS: n, slope, intercept, r2, t_stat.

    Matches scipy ``linregress`` closed forms.  The significance gate in
    the reference is ``p > 0.05 → stable`` (``trends.py:122-159``);
    the t statistic ``r*sqrt((n-2)/(1-r²))`` is a monotone equivalent
    that both Spark and an ANSI-SQL oracle can compute exactly, so the
    gate becomes ``|t| > t_crit``.  Groups with < min_points or zero x
    variance are dropped (reference returns "insufficient").
    """
    rows = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    agg = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x_col).alias("_mx"),
        F.avg(y_col).alias("_my"),
        F.covar_pop(x_col, y_col).alias("_cxy"),
        F.var_pop(x_col).alias("_vx"),
        F.var_pop(y_col).alias("_vy"),
    )
    slope = F.col("_cxy") / F.col("_vx")
    intercept = F.col("_my") - slope * F.col("_mx")
    r2 = (F.col("_cxy") * F.col("_cxy")) / (F.col("_vx") * F.col("_vy"))
    r = F.col("_cxy") / F.sqrt(F.col("_vx") * F.col("_vy"))
    # a perfect fit (r²=1, e.g. n=2) has an undefined t — NULL, not a
    # division-by-zero (ANSI mode throws on the naked expression)
    t_stat = F.when(r2 < 1.0, r * F.sqrt((F.col("n") - 2) / (1 - r2)))
    return (
        agg.filter((F.col("n") >= min_points) & (F.col("_vx") > 0) & (F.col("_vy") > 0))
        .withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .withColumn("r2", r2)
        .withColumn("t_stat", t_stat)
        .drop("_mx", "_my", "_cxy", "_vx", "_vy")
    )


def ols2_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x1_col: str,
    x2_col: str,
    y_col: str,
    min_points: int = 10,
) -> DataFrame:
    """Per-group 2-covariate OLS ``y ~ b0 + b1*x1 + b2*x2`` in closed
    form via the 2×2 normal equations over centered moments.

    Reference: the heat model ``HR ~ pace + excess_temp (+days)``
    (``mcp/rag/queries/heat_adjustment.py:38-115``, min 10 rows :34).
    Closed form keeps it a single aggregation — no sklearn, no Python —
    and the same formulas run verbatim in the SQL oracle.
    """
    rows = df.filter(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    agg = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x1_col).alias("_m1"),
        F.avg(x2_col).alias("_m2"),
        F.avg(y_col).alias("_my"),
        F.covar_pop(x1_col, y_col).alias("_c1y"),
        F.covar_pop(x2_col, y_col).alias("_c2y"),
        F.covar_pop(x1_col, x2_col).alias("_c12"),
        F.var_pop(x1_col).alias("_v1"),
        F.var_pop(x2_col).alias("_v2"),
    )
    det = F.col("_v1") * F.col("_v2") - F.col("_c12") * F.col("_c12")
    b1 = (F.col("_c1y") * F.col("_v2") - F.col("_c2y") * F.col("_c12")) / det
    b2 = (F.col("_c2y") * F.col("_v1") - F.col("_c1y") * F.col("_c12")) / det
    b0 = F.col("_my") - b1 * F.col("_m1") - b2 * F.col("_m2")
    return (
        agg.filter((F.col("n") >= min_points) & (det > 1e-12))
        .withColumn("b1", b1)
        .withColumn("b2", b2)
        .withColumn("b0", b0)
        .drop("_m1", "_m2", "_my", "_c1y", "_c2y", "_c12", "_v1", "_v2")
    )


def linregress_scipy_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    min_points: int = 3,
) -> DataFrame:
    """Grouped ``applyInPandas`` OLS with exact p-values.

    For operators whose contract includes the scipy p-value itself
    (``mcp/database/readers/durability.py:368-436``); groups are tiny
    (dozens of dated points), so the Arrow round-trip is negligible and
    the fit parallelizes per group.  Falls back to a numpy-only
    implementation when scipy is unavailable.
    """
    group_fields = [f for f in df.schema.fields if f.name in set(group_cols)]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in group_fields]
        + ["n bigint", "slope double", "intercept double", "r2 double", "p_value double"]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[x_col, y_col]].dropna()
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        if len(sub) < min_points or sub[x_col].nunique() < 2:
            return pd.DataFrame(columns=list(keys) + ["n", "slope", "intercept", "r2", "p_value"])
        try:
            from scipy.stats import linregress

            res = linregress(sub[x_col], sub[y_col])
            row = dict(
                keys,
                n=len(sub),
                slope=float(res.slope),
                intercept=float(res.intercept),
                r2=float(res.rvalue**2),
                p_value=float(res.pvalue),
            )
        except ImportError:  # numpy fallback, p-value omitted
            import numpy as np

            x, y = sub[x_col].to_numpy(), sub[y_col].to_numpy()
            slope, intercept = np.polyfit(x, y, 1)
            r = np.corrcoef(x, y)[0, 1]
            row = dict(
                keys,
                n=len(sub),
                slope=float(slope),
                intercept=float(intercept),
                r2=float(r * r),
                p_value=float("nan"),
            )
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(fit, schema=out_schema)


def theil_sen_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    median_scale: int | None = None,
) -> DataFrame:
    """Theil-Sen robust slope per group (Theil 1950 / Sen 1968 — the
    median of all pairwise slopes, 29% breakdown point vs OLS's 0%),
    with the matching intercept ``median(y - slope·x)``.

    Scale contract: the pairwise self-join is quadratic IN THE GROUP,
    so callers must feed groups whose size is structurally bounded (a
    calendar window, a capped series) — the estimator is then linear
    in #groups with a bounded constant, and the medians run through
    the distributed histogram median (``operators/stats.
    grouped_median``), never a one-task percentile buffer.  Ties in x
    are dropped pairwise (slope undefined), the standard convention.
    Groups with fewer than 2 distinct x values produce no row.

    ``median_scale``: when set, both median operands are quantized to
    the 10^-scale grid (``floor(v·10^s + 0.5)``) BEFORE the median and
    scaled back after.  An even-count median is the midpoint of two
    values, and the midpoint of two arbitrary doubles is
    formula-sensitive in the last ulp (``a·0.5 + b·0.5`` vs
    ``(a+b)/2`` — measured flipping 6dp rounding on 2 of 1500 groups
    at sf0.1); the midpoint of two INTEGER-valued doubles is exact in
    any formula, so the grid makes the result engine-independent.

    Output: group cols + n_points, n_pairs, ts_slope, ts_intercept.
    """
    from .stats import grouped_median

    def _q(c):
        if median_scale is None:
            return c
        f = float(10**median_scale)
        return F.floor(c * f + 0.5)

    def _uq(c):
        if median_scale is None:
            return c
        return c / float(10**median_scale)

    a = df.select(
        *group_cols, F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya")
    )
    b = df.select(
        *group_cols, F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb")
    )
    pairs = a.join(b, list(group_cols)).filter(F.col("_xb") > F.col("_xa"))
    slopes = pairs.select(
        *group_cols,
        _q(
            (F.col("_yb") - F.col("_ya")) / (F.col("_xb") - F.col("_xa"))
        ).alias("slope"),
    )
    n_pairs = slopes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    sm = grouped_median(slopes, group_cols, ["slope"]).select(
        *group_cols, _uq(F.col("slope_median")).alias("ts_slope")
    )
    resid = df.join(sm, list(group_cols)).select(
        *group_cols,
        _q(F.col(y_col) - F.col("ts_slope") * F.col(x_col)).alias("r"),
    )
    ic = grouped_median(resid, group_cols, ["r"]).select(
        *group_cols, _uq(F.col("r_median")).alias("ts_intercept")
    )
    n_points = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    return (
        n_points.join(n_pairs, list(group_cols))
        .join(sm, list(group_cols))
        .join(ic, list(group_cols))
        .select(*group_cols, "n_points", "n_pairs", "ts_slope", "ts_intercept")
    )
