"""Physical-layout helpers.

``spread_for_compute``: expression-heavy per-row work (gram building,
regex passes, quality features) parallelizes only as far as the INPUT
partitioning — AQE tunes post-shuffle layouts but never sees map-side
work before the first exchange.  A small-file local corpus scans as
1-2 partitions, serializing the in-row compute on a 32-core session
(measured: x8's gram transforms 8.5 s → 1.7 s at the 10× corpus once
spread).

At production scale the scan already has thousands of splits, so the
spread must be CONDITIONAL: repartition only when the scan's
parallelism is below the session's shuffle width.  Shuffling the full
text column to buy parallelism is the right trade exactly when the
input is narrow — and a no-op (plan-identical) when it isn't, which
keeps the 100 TB path free of a gratuitous full-corpus text shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the session's shuffle width on
    ``key_cols`` IF its current partitioning underfills it — else
    return ``df`` unchanged.  Keyed (not round-robin) so downstream
    groupBys on the same key can reuse the layout."""
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= max(2, width // 2):
        return df
    keys = [F.col(c) for c in key_cols]
    return df.repartition(width, *keys) if keys else df.repartition(width)
