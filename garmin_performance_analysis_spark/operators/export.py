"""Export sink with row guard + ad-hoc SQL passthrough (SURVEY.md S5, S7).

Reference: ``mcp/database/readers/export.py:19-90`` — ``COPY (query) TO
path (FORMAT PARQUET/CSV)`` guarded by a ``COUNT(*) > max_rows``
pre-check (default 100k, ``:49-60``); the ``export`` tool accepts an
arbitrary SQL string (``docs/mcp-tools-reference.md:35-45``).

The row guard uses ``limit(max_rows+1).count()`` so the pre-check scans
at most ``max_rows+1`` rows instead of counting the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ExportRowLimitExceeded(RuntimeError):
    pass


def guarded_export(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    max_rows: int = 100_000,
) -> int:
    """Write df to ``path`` as parquet/csv unless it exceeds ``max_rows``
    (raises ``ExportRowLimitExceeded`` with the reference's contract)."""
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ExportRowLimitExceeded(
            f"Export exceeds max_rows={max_rows}; narrow the query or raise the limit"
        )
    writer = df.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
    return probe


def sql_passthrough(spark: SparkSession, query: str) -> DataFrame:
    """S7: ad-hoc SQL over the registered views (Catalyst replaces the
    reference's embedded-DuckDB passthrough)."""
    return spark.sql(query)
