#!/usr/bin/env python
"""Scale-smoke for the dedup/ANN candidate generators: synthesize an
N× documents+embeddings corpus, run the banded-join pipelines at both
scales, and report wall clock + candidate/output rows + shuffle bytes.

Replication must not fabricate cross-replica near-duplicates, or the
OUTPUT (pair lists) grows quadratically by data construction and the
measurement says nothing about the algorithm:

- documents: each replica gets a per-(replica, doc_id) deterministic
  word shuffle — a permuted word sequence shares almost no word
  n-grams with the original, so shingle/SimHash/MinHash candidates
  stay within a replica and the true-pair count scales linearly.
- embeddings: each replica cyclically rolls the vector by
  ``3 * replica`` positions — norm-preserving, and the cosine between
  a vector and its rolled copy is ~0 for these corpora, so SRP-LSH
  buckets decorrelate across replicas.

IDs shift by ``replica * (max_id + 1)`` so joins never collide.

Usage:
    python scripts/scale_smoke.py [--sf-dir /root/testdata/sf0.1]
        [--replicas 10] [--out /tmp/scale_smoke_10x] [--runs 2]

Prints one JSON line per query per scale, then a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "d3_minhash_lsh_pairs",
    "d2b_jaccard_capped_shingles",
    "d4b_simhash_pairs",
    "v4_srp_lsh_pairs",
    "x1_text_quality",
]


def synthesize(sf_dir: str, out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    doc_stride = int(docs["doc_id"].max()) + 1
    vec_stride = int(emb["vec_id"].max()) + 1

    doc_parts = []
    for r in range(replicas):
        part = docs.copy()
        part["doc_id"] = part["doc_id"] + r * doc_stride
        if r > 0:
            def shuffle_words(row):
                words = row["text"].split()
                rng = np.random.RandomState((r * 1_000_003 + int(row["doc_id"])) % (2**31))
                rng.shuffle(words)
                return " ".join(words)

            part["text"] = part.apply(shuffle_words, axis=1)
        doc_parts.append(part)
    big_docs = pd.concat(doc_parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big_docs, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb_parts = []
    for r in range(replicas):
        part = emb.copy()
        part["vec_id"] = part["vec_id"] + r * vec_stride
        if r > 0:
            part["embedding"] = part["embedding"].map(
                lambda v: np.roll(np.asarray(v), 3 * r).tolist()
            )
        emb_parts.append(part)
    big_emb = pd.concat(emb_parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big_emb, preserve_index=False),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))
    # AQE wraps the real plan; descend into the materialized subtree
    for attr in ("executedPlan", "finalPhysicalPlan"):
        if hasattr(node, attr):
            try:
                yield from _walk(getattr(node, attr)())
                break
            except Exception:
                pass


def shuffle_bytes(df) -> int:
    """Sum 'shuffle bytes written' SQL metrics over the executed plan
    (best-effort: returns -1 if the py4j walk fails)."""
    try:
        total = 0
        seen = set()
        for node in _walk(df._jdf.queryExecution().executedPlan()):
            if id(node) in seen:
                continue
            seen.add(id(node))
            metrics = node.metrics()
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "shuffleBytesWritten":
                    total += kv._2().value()
        return int(total)
    except Exception:
        return -1


def run(sf_dir: str, label: str, runs: int, spark) -> list[dict]:
    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    results = []
    for name in QUERIES:
        best, rows, shuf = float("inf"), -1, -1
        for _ in range(runs):
            df = CATALOG[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                shuf = shuffle_bytes(df)
        rows = CATALOG[name].fn(spark, sf_dir).count()
        rec = {
            "query": name,
            "scale": label,
            "wall_sec": round(best, 3),
            "out_rows": rows,
            "shuffle_bytes": shuf,
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_smoke_10x")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.out, "documents.parquet")):
        print(f"synthesizing {args.replicas}x corpus into {args.out}...", flush=True)
        synthesize(args.sf_dir, args.out, args.replicas)

    from garmin_performance_analysis_spark.session import get_spark

    spark = get_spark("scale-smoke")
    base = run(args.sf_dir, "1x", args.runs, spark)
    big = run(args.out, f"{args.replicas}x", args.runs, spark)

    print(f"\n{'query':32s} {'1x wall':>8s} {'Nx wall':>8s} {'ratio':>6s} "
          f"{'1x rows':>9s} {'Nx rows':>9s} {'1x shufMB':>9s} {'Nx shufMB':>9s}")
    for b, g in zip(base, big):
        ratio = g["wall_sec"] / b["wall_sec"] if b["wall_sec"] else float("nan")
        print(
            f"{b['query']:32s} {b['wall_sec']:8.2f} {g['wall_sec']:8.2f} "
            f"{ratio:6.1f} {b['out_rows']:9d} {g['out_rows']:9d} "
            f"{b['shuffle_bytes'] / 1e6:9.1f} {g['shuffle_bytes'] / 1e6:9.1f}"
        )


if __name__ == "__main__":
    main()
