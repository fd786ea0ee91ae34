#!/usr/bin/env python
"""VERDICT r9 item 5: prove the t16/t17 grouped-map pack-bucket knob.

The Holt family keys its ``applyInPandas`` by ``pmod(hash(user_id),
B)`` — users never split across buckets, so B is pure PARALLELISM:
more buckets = more concurrent grouped-map tasks, fewer users looped
per Arrow batch.  The round-9 measurement picked B=32 at sf0.1
(~125 users/batch, 3-4x faster than per-user batches).  This script
measures the knob at 10x the data: the SAME 10x events corpus through
the t16 shape at B in {8, 32, 64} (plus the 1x/B=32 baseline row),
best-of-N.  Results are bucket-count-invariant (identical recursion
per user, one exchange either way) — parity-checked in the catalog —
so the knob can be tuned freely per deployment.

Usage:
    python scripts/t16_pack_knob.py [--out /tmp/scale_smoke_10x]
        [--runs 3]

Requires the scale_smoke 10x corpus (synthesized on demand).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(spark, sf_dir: str, buckets: int, tag: str, runs: int) -> dict:
    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    os.environ["SPARK_GRAFT_PACK_BUCKETS"] = str(buckets)
    best = float("inf")
    rows = 0
    for _ in range(runs):
        t0 = time.perf_counter()
        out = CATALOG["t16_holt_linear"].fn(spark, sf_dir)
        out.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    rows = out.count()
    return {
        "scale": tag,
        "pack_buckets": buckets,
        "t16_wall_sec": round(best, 3),
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
    if cached != manifest or not os.path.exists(
        os.path.join(args.out, "events.parquet")
    ):
        print(f"synthesizing {args.replicas}x corpus into {args.out}...", flush=True)
        synthesize(args.sf_dir, args.out, args.replicas)
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)

    from garmin_performance_analysis_spark.session import get_spark

    spark = get_spark("t16-pack-knob")
    print(json.dumps({"load1": round(os.getloadavg()[0], 2)}), flush=True)
    for sf_dir, tag, buckets in (
        (args.sf_dir, "1x", 32),
        (args.out, "10x", 8),
        (args.out, "10x", 32),
        (args.out, "10x", 64),
    ):
        rec = _measure(spark, sf_dir, buckets, tag, args.runs)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
