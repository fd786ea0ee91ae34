#!/usr/bin/env python
"""Export-throughput benchmark mirroring the reference's published
harness (``mcp/benchmarks/benchmark_export_performance.py:42-199``):

- synthetic 8-column time-series (seeded normal/uniform data);
- export matrix: {10k, 100k, 1M} rows x {parquet, csv}, reporting
  export_time_s, load_time_s, file_size_mb, rows_per_s, mb_per_s;
- query benchmark set on the 100k table: full_scan / filtered
  (BETWEEN) / aggregated (AVG x2) / grouped (GROUP BY activity_id)
  (``:132-159``).

Prints one JSON document.  Row sizes configurable:
``SPARK_GRAFT_EXPORT_SIZES=10000,100000`` (default mirrors the
reference's 10k/100k/1M).

Usage: python scripts/bench_export.py [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from garmin_performance_analysis_spark.session import get_spark  # noqa: E402


def synthetic_ts(spark, n_rows: int):
    """8-column per-second time-series, deterministic (seeded rand)."""
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") % 500).alias("activity_id"),
            (F.col("id") / 500).cast("int").alias("timestamp_s"),
            (140 + F.randn(seed=1) * 15).alias("heart_rate"),
            (3.2 + F.randn(seed=2) * 0.4).alias("speed"),
            (178 + F.randn(seed=3) * 6).alias("cadence"),
            (245 + F.randn(seed=4) * 25).alias("ground_contact_time"),
            (7.5 + F.randn(seed=5) * 0.8).alias("vertical_oscillation"),
            (F.rand(seed=6) * 120).alias("elevation"),
        )
    )


def dir_size_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def main() -> None:
    out_base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="spark_export_bench_"
    )
    sizes = [
        int(s)
        for s in os.environ.get(
            "SPARK_GRAFT_EXPORT_SIZES", "10000,100000,1000000"
        ).split(",")
    ]
    spark = get_spark("bench-export")
    results = {"export_matrix": [], "query_benchmarks": {}}

    for n in sizes:
        df = synthetic_ts(spark, n).localCheckpoint(eager=True)  # isolate gen cost
        for fmt in ("parquet", "csv"):
            path = os.path.join(out_base, f"ts_{n}_{fmt}")
            t0 = time.perf_counter()
            writer = df.write.mode("overwrite")
            if fmt == "parquet":
                writer.parquet(path)
            else:
                writer.option("header", True).csv(path)
            export_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reader = (
                spark.read.parquet(path)
                if fmt == "parquet"
                else spark.read.option("header", True)
                .option("inferSchema", False)
                .csv(path)
            )
            loaded = reader.count()
            load_s = time.perf_counter() - t0
            mb = dir_size_mb(path)
            results["export_matrix"].append(
                {
                    "rows": n,
                    "format": fmt,
                    "export_time_s": round(export_s, 3),
                    "load_time_s": round(load_s, 3),
                    "file_size_mb": round(mb, 2),
                    "rows_per_s": round(n / export_s),
                    "mb_per_s": round(mb / export_s, 1),
                    "loaded_rows": loaded,
                }
            )
            shutil.rmtree(path, ignore_errors=True)

    # query benchmark set on the 100k (or largest <= 100k) table
    qn = max((s for s in sizes if s <= 100_000), default=sizes[0])
    qdf = synthetic_ts(spark, qn).localCheckpoint(eager=True)
    queries = {
        "full_scan": lambda: qdf,
        "filtered": lambda: qdf.filter(F.col("timestamp_s").between(10, 60)),
        "aggregated": lambda: qdf.agg(
            F.avg("heart_rate"), F.avg("speed")
        ),
        "grouped": lambda: qdf.groupBy("activity_id").agg(
            F.avg("heart_rate"), F.count(F.lit(1))
        ),
    }
    for name, build in queries.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        results["query_benchmarks"][name] = round(best, 3)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
