"""DuckDB-oracle comparison harness.

Replicates the driver's correctness gate locally: run the Spark query
and the oracle SQL over the same parquet tables, then compare row count,
column names, and an order-insensitive value multiset (floats rounded).
Used by tests so parity breaks are caught before the driver runs.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from ..sources.tables import TABLE_NAMES

FLOAT_DECIMALS = 6


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB defaults its memory limit to ~80% of PHYSICAL RAM, but in
    # this process it shares the address space with a 16g Spark driver
    # heap — near the end of a long full-catalog sweep the allocator
    # hits the real ceiling and aborts with "failed to allocate 2048
    # bytes" on otherwise-fine oracles (observed three times in r8,
    # different entries each run, all green in a fresh process).  A
    # modest explicit cap makes DuckDB spill instead of hard-failing.
    con.execute("SET memory_limit = '8GB'")
    con.execute("SET temp_directory = '/tmp/duckdb_oracle_spill'")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _is_null_scalar(v) -> bool:
    """None, pandas NA/NaT, and float NaN of any width — every scalar
    shape a null can take after toPandas()/df() conversion (pandas
    extension dtypes yield pd.NA, float32 columns yield np.float32
    NaN; both must normalize like a plain None or strict parity
    false-fails on correct results)."""
    return (
        v is None
        or v is pd.NA
        or v is pd.NaT
        or (isinstance(v, (float, np.floating)) and math.isnan(v))
    )


def _normalize_cell(v) -> str:
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_normalize_cell(x) for x in v) + "]"
    if _is_null_scalar(v):
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{round(v, FLOAT_DECIMALS):.{FLOAT_DECIMALS}f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _normalize_cell_strict(v) -> str:
    """Driver-faithful cell rendering: dtype-sensitive and full-precision.

    The driver's value hash distinguishes int64 271 from float64 271.0
    (the round-4 e7/d10/t8 failure class), so strict mode tags the
    numeric kind and never rounds: an oracle that returns a float where
    Spark returns an int fails here, exactly as it fails under the
    driver."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_normalize_cell_strict(x) for x in v) + "]"
    if _is_null_scalar(v):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v)!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def normalize_frame(df: pd.DataFrame, strict: bool = False) -> list[tuple]:
    """Sort columns by name, normalize every cell, sort rows."""
    cols = sorted(df.columns)
    cell = _normalize_cell_strict if strict else _normalize_cell
    rows = [
        tuple(cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_frames(
    name: str,
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    strict: bool = False,
) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name,
            False,
            len(spark_pdf),
            len(oracle_pdf),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False, len(spark_pdf), len(oracle_pdf), "row count mismatch"
        )
    s_rows = normalize_frame(spark_pdf, strict=strict)
    o_rows = normalize_frame(oracle_pdf, strict=strict)
    if s_rows != o_rows:
        diff = []
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                diff.append(f"row {i}: spark={a} oracle={b}")
            if len(diff) >= 3:
                break
        return CompareResult(
            name, False, len(spark_pdf), len(oracle_pdf), "; ".join(diff) or "value mismatch"
        )
    return CompareResult(name, True, len(spark_pdf), len(oracle_pdf))
