"""Sort / limit / top-k operators (SURVEY.md §2.6) and the weighted
similarity scorer (M13).

Spark executes ``orderBy(...).limit(k)`` as TakeOrderedAndProject — a
per-partition top-k + driver merge, no global sort — which is the right
physical shape at any scale.  Every ordering here ends with a unique
key so results are deterministic under ties.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_by_closeness(
    df: DataFrame,
    value_col: str,
    target: float,
    k: int,
    tiebreak_cols: Sequence[Column] = (),
) -> DataFrame:
    """Top-k rows by ``ABS(value - target) ASC`` with deterministic
    tie-breaks.

    Reference: similar-run search ``ORDER BY ABS(pace-target) ASC,
    activity_date DESC LIMIT k`` (``mcp/rag/queries/comparisons.py:259-267``).
    """
    closeness = F.abs(F.col(value_col) - F.lit(target)).alias("closeness")
    return (
        df.withColumn("closeness", closeness)
        .orderBy(F.col("closeness").asc(), *tiebreak_cols)
        .limit(k)
    )


def paginate(
    df: DataFrame, order_cols: Sequence, limit: int, offset: int
) -> DataFrame:
    """LIMIT/OFFSET pagination over a deterministic ordering
    (``mcp/rag/queries/insights.py:98-100``).  Ordering must include a
    unique key; Spark 3.4+ has a native ``offset``."""
    return df.orderBy(*order_cols).offset(offset).limit(limit)


def weighted_similarity(
    df: DataFrame,
    target: dict[str, float],
    weights: dict[str, float],
    scales: dict[str, float],
    score_col: str = "similarity_score",
) -> DataFrame:
    """Weighted multi-attribute similarity score clamped to [0, 100].

    Reference: run similarity = pace .45 + distance .35 + type .20 with
    per-attribute normalized distance, clamped
    (``mcp/rag/queries/comparisons.py:39-104,411-454``).  Pure column
    arithmetic; any categorical affinity matrix joins in as a broadcast
    lookup before this is applied.
    """
    score = F.lit(0.0)
    for col, w in weights.items():
        dist = F.abs(F.col(col) - F.lit(target[col])) / F.lit(scales[col])
        attr_score = F.greatest(F.lit(0.0), F.lit(1.0) - dist)
        score = score + F.lit(w) * attr_score
    clamped = F.least(F.lit(100.0), F.greatest(F.lit(0.0), score * 100.0))
    return df.withColumn(score_col, clamped)
