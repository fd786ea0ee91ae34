#!/usr/bin/env python
"""Capture .explain("formatted") for catalog queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [name ...]

With no names, captures every bench HEADLINE query.  Writes
plans/<tag>/<name>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before").  Queries that materialize interior frames (checkpoints,
memoized indexes) run those jobs during construction; the file records
the plan of the RETURNED frame plus a summary line with Exchange /
BatchEvalPython / ArrowEvalPython / join-node counts so plan diffs can
be cited without rerunning Spark.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmin_performance_analysis_spark.harness.catalog import CATALOG  # noqa: E402
from garmin_performance_analysis_spark.session import get_spark  # noqa: E402


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BroadcastExchange": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "ShuffledHashJoin": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BatchEvalPython": len(re.findall(r"\bBatchEvalPython\b", plan)),
        "ArrowEvalPython": len(re.findall(r"\bArrowEvalPython\b", plan)),
        "MapInArrow": len(re.findall(r"\bMapInArrow\b", plan)),
        "FlatMapGroupsInPandas": len(
            re.findall(r"\bFlatMapGroupsIn(?:Pandas|Arrow)\b", plan)
        ),
        "Scan": len(re.findall(r"\bScan parquet\b", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
    }
    return "SUMMARY " + " ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    for name in names:
        t0 = time.perf_counter()
        try:
            df = CATALOG[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR during build/explain: {exc!r}"
        build_s = time.perf_counter() - t0
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) build_wall={build_s:.2f}s\n")
            f.write(summarize(plan) + "\n\n")
            f.write(plan)
        print(f"{name}: build {build_s:.2f}s -> {path}", flush=True)


if __name__ == "__main__":
    main()
