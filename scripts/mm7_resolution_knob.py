#!/usr/bin/env python
"""VERDICT r10 item 3: prove mm7's envelope-resolution knob.

mm7's 64-bit energy envelope is intentionally coarse, and on the
synthetic sweep corpus its similarity space SATURATES: at 10x the
data the TRUE-pair output grew 44x (SCALING.md r10 note) because
12,500 distinct families collide into too few effective envelope
states.  The knobs: ``SPARK_GRAFT_MM7_SLICES`` (default 64) doubles
the slice count — squaring the envelope space at LINEAR kernel
cost — and ``SPARK_GRAFT_MM7_MAX_HAMMING`` sets the match budget
(default 3 per 64 bits).

This script measures mm7 at (slices, max_hamming) configurations at
1x and 10x: wall clock, output pairs, and RECALL on the planted
near-dup families (doc_id//4 groups of 4 perturbed variants — the
corpus's ground truth; replica strides are multiples of 4, so the
family key holds on the 10x corpus too).

Measured (2 runs each, 10x corpus):

    slices  h   1x pairs  10x pairs  growth  recall(10x)  collisions
    64      3       8809     390072   44.3x       0.9745      316984
    128     6       8085     336567   41.6x       0.9946      261971
    128     4       7661     221484   28.9x       0.9746      148387
    128     3       7248     168803   23.3x       0.9380       98452

The lesson: scaling the Hamming budget PROPORTIONALLY with the bit
width (h=6 at 128) keeps the same relative threshold, so the
collision mass barely moves; widening bits while holding the
ABSOLUTE budget near the default (h=4 at 128) buys 2.1x less
false-match mass at the default's recall.  Saturation is intrinsic
to a coarse energy envelope on this sweep corpus — the knob trades
it against recall explicitly instead of hardcoding 64.

Usage:
    python scripts/mm7_resolution_knob.py [--out /tmp/scale_smoke_10x]
        [--runs 2]

Requires the scale_smoke 10x corpus (synthesized on demand).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(
    spark, sf_dir: str, n_slices: int, max_ham: int, tag: str, runs: int
) -> dict:
    from pyspark.sql import functions as F

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    os.environ["SPARK_GRAFT_MM7_SLICES"] = str(n_slices)
    os.environ["SPARK_GRAFT_MM7_MAX_HAMMING"] = str(max_ham)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = CATALOG["mm7_audio_energyhash_neardup"].fn(spark, sf_dir)
        out.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    n_pairs = out.count()
    # ground truth: the 4 variants of one family (doc_id//4) are the
    # planted near-dups; every other pair is a fingerprint collision
    fam_pairs = out.filter(
        F.floor(F.col("doc_a") / 4) == F.floor(F.col("doc_b") / 4)
    ).count()
    n_docs = load_table(spark, sf_dir, "documents").count()
    total_fam_pairs = (n_docs // 4) * 6  # C(4,2) per complete family
    return {
        "scale": tag,
        "n_slices": n_slices,
        "max_hamming": max_ham,
        "wall_sec": round(best, 3),
        "out_pairs": n_pairs,
        "family_pairs_found": fam_pairs,
        "family_pairs_total": total_fam_pairs,
        "family_recall": round(fam_pairs / total_fam_pairs, 4),
        "collision_pairs": n_pairs - fam_pairs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_smoke_10x")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from scale_smoke import synthesize  # noqa: E402 (sibling script)

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
    if cached != manifest:
        print(f"synthesizing {args.replicas}x corpus into {args.out}...", flush=True)
        synthesize(args.sf_dir, args.out, args.replicas)
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)

    from garmin_performance_analysis_spark.session import get_spark

    spark = get_spark("mm7-resolution-knob")
    rows = []
    # (slices, budget): default; proportional budget; absolute budget
    for n_slices, max_ham in ((64, 3), (128, 6), (128, 4), (128, 3)):
        rows.append(
            _measure(spark, args.sf_dir, n_slices, max_ham, "1x", args.runs)
        )
        print(json.dumps(rows[-1]), flush=True)
        rows.append(
            _measure(
                spark, args.out, n_slices, max_ham, f"{args.replicas}x", args.runs
            )
        )
        print(json.dumps(rows[-1]), flush=True)
    os.environ.pop("SPARK_GRAFT_MM7_SLICES", None)
    os.environ.pop("SPARK_GRAFT_MM7_MAX_HAMMING", None)

    print(f"\n{'scale':>5s} {'slices':>6s} {'h':>3s} {'wall':>7s} {'pairs':>9s} "
          f"{'fam_found':>9s} {'recall':>7s} {'collisions':>10s}")
    for r in rows:
        print(
            f"{r['scale']:>5s} {r['n_slices']:6d} {r['max_hamming']:3d} "
            f"{r['wall_sec']:7.2f} {r['out_pairs']:9d} "
            f"{r['family_pairs_found']:9d} "
            f"{r['family_recall']:7.4f} {r['collision_pairs']:10d}"
        )


if __name__ == "__main__":
    main()
