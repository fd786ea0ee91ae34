#!/usr/bin/env python
"""VERDICT r8 item 3: prove the j15 bucket-count knob.

The round-8 10x measurement showed j15's co-bucketed join at 7.3x wall
for 10x rows — NOT because the plan degrades (the join never
exchanges at either scale) but because the ingest-time bucket count
was pinned at 8, fixing the join parallelism.  The production rule is
"bucket count ∝ data volume, chosen at ingest"; this script measures
it: the SAME 10x corpus joined from 8-bucket vs 32-bucket silver
tables (and the 1x corpus at 8 buckets as the baseline row), best-of-N
warm reads, bucketed write excluded (paid once at ingest by design).

Usage:
    python scripts/j15_bucket_knob.py [--out /tmp/scale_smoke_10x] [--runs 3]

Requires the scale_smoke 10x corpus (synthesized on demand via
scripts/scale_smoke.py's synthesize()).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(spark, sf_dir: str, buckets: int, tag: str, runs: int) -> dict:
    from pyspark.sql import functions as F

    from garmin_performance_analysis_spark.pipelines.silver import (
        write_bucketed,
    )
    from garmin_performance_analysis_spark.sources.tables import load_table

    app = spark.sparkContext.applicationId.replace("-", "_")
    t_o = f"knob_orders_{tag}_{buckets}_{app}"
    t_l = f"knob_lineitem_{tag}_{buckets}_{app}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.floor(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000
            + 0.5
        )
        .cast("bigint")
        .alias("_rev4"),
    )
    t0 = time.perf_counter()
    write_bucketed(orders, t_o, "o_orderkey", buckets)
    write_bucketed(li, t_l, "o_orderkey", buckets)
    ingest = time.perf_counter() - t0

    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        joined = (
            spark.table(t_o).hint("MERGE").join(spark.table(t_l), "o_orderkey")
        )
        out = joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            (F.sum("_rev4").cast("double") / 10000.0).alias("revenue"),
        )
        out.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    rows = out.count()
    for t in (t_o, t_l):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return {
        "scale": tag,
        "buckets": buckets,
        "join_wall_sec": round(best, 3),
        "ingest_write_sec": round(ingest, 3),
        "out_rows": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_smoke_10x")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from scripts.scale_smoke import synthesize

    manifest_path = os.path.join(args.out, "manifest.json")
    manifest = {
        "sf_dir": os.path.abspath(args.sf_dir),
        "replicas": args.replicas,
        "corpus_version": 3,
    }
    cached = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            cached = json.load(fh)
    if cached != manifest or not all(
        os.path.exists(os.path.join(args.out, f"{t}.parquet"))
        for t in ("orders", "lineitem")
    ):
        print(f"synthesizing {args.replicas}x corpus into {args.out}...", flush=True)
        synthesize(args.sf_dir, args.out, args.replicas)
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)

    from garmin_performance_analysis_spark.session import get_spark

    spark = get_spark("j15-bucket-knob")
    print(json.dumps({"load1": round(os.getloadavg()[0], 2)}), flush=True)
    for sf_dir, tag, buckets in (
        (args.sf_dir, "1x", 8),
        (args.out, "10x", 8),
        (args.out, "10x", 32),
    ):
        rec = _measure(spark, sf_dir, buckets, tag, args.runs)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
