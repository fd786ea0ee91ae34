#!/usr/bin/env python
"""Isolated re-measurement of named bench queries (guide §1.1).

Usage: python scripts/bench_subset.py name [name ...]

Replicates bench.py's methodology exactly — same session, same warmup,
best-of-N (``$SPARK_GRAFT_BENCH_RUNS``, default 3) with the noop sink,
``clear_persisted`` between queries — but over an explicit subset, so a
single query can be timed on an idle machine without paying a full
182-query sweep.  Prints one JSON line per query and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from garmin_performance_analysis_spark.harness.catalog import CATALOG  # noqa: E402
from garmin_performance_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        raise SystemExit(f"not in catalog: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    start_load = round(os.getloadavg()[0], 2)
    spark = get_spark("bench-subset")
    bench.force(CATALOG["p2_point_lookup"].fn(spark, sf_dir))
    bench.force(CATALOG["mm2_decoded_features"].fn(spark, sf_dir))
    bench.clear_persisted(spark)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench-subset: {name}")
        best = float("inf")
        all_runs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench.force(CATALOG[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
        timings[name] = round(best, 3)
        bench.clear_persisted(spark)
        print(json.dumps({"query": name, "best": timings[name], "runs": all_runs}),
              flush=True)
    print(json.dumps({"subset_total": round(sum(timings.values()), 3),
                      "load1_at_start": start_load, "queries": timings}))


if __name__ == "__main__":
    main()
