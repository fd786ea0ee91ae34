"""Streaming-summary sketches with exact-output guarantees.

The reference's profiler surface is exact (``database/readers/
statistics.py``-style full aggregates); at 100 TB a single ``GROUP BY
term ORDER BY count DESC LIMIT k`` shuffles the full token stream on
the term key.  The two-pass heavy-hitters operator here keeps the
OUTPUT exact while the shuffle carries only bounded summaries:

  pass 1: per-partition Misra-Gries-style summaries (≤ ``width`` rows
          each) → merged candidate set (tiny);
  pass 2: exact recount of ONLY the candidates (semi-join against the
          broadcast candidate set; map-side combine makes the shuffle
          k-bounded) → top-k with a deterministic tiebreak.

Guarantee: a summary of width W on a partition of n_p items can
under-count a key by at most n_p/(W+1), so a key absent from EVERY
partition summary has true count ≤ N/(W+1).  Whenever the true k-th
count exceeds that bound (any Zipf-ish text corpus with a sane W),
the candidate set contains the true top-k and the recount makes the
final answer EXACT — which is why the catalog entry can carry a plain
ANSI oracle rather than a tolerance check.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_summaries(width: int):
    """mapInPandas stage: one bounded frequency summary per partition."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
            if len(counts) > 4 * width:
                # Misra-Gries batch decrement: subtract the (width+1)-th
                # largest count from everyone, keep the positives.  Each
                # compaction charges every dropped occurrence against
                # `width` surviving keys, so the total under-count per
                # key stays ≤ n_p/(width+1).
                cut = sorted(counts.values(), reverse=True)[width]
                counts = {t: c - cut for t, c in counts.items() if c > cut}
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:width]
        yield pd.DataFrame(
            {"term": [t for t, _ in top], "w": [c for _, c in top]}
        )

    return gen


def heavy_hitters_topk(
    df: DataFrame,
    term_col: str,
    k: int = 20,
    width: int = 4096,
) -> DataFrame:
    """Exact top-k most frequent values of ``term_col`` without a
    full-stream shuffle (see module docstring for the two-pass shape
    and the exactness condition).

    Output: (term, cnt) — the exact counts of the true top-k, ordered
    (cnt DESC, term) with the tiebreak making the LIMIT boundary
    deterministic.
    """
    terms = df.select(F.col(term_col).cast("string").alias("term"))
    summaries = terms.mapInPandas(_mg_summaries(width), "term string, w long")
    # merged summary is ≤ partitions × width rows — tiny; its exact
    # weights are NOT trusted (under-counts), only its membership
    candidates = summaries.select("term").distinct()
    exact = (
        terms.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        exact.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(k)
        .select("term", "cnt")
    )


# ---------------------------------------------------------------------------
# Mergeable QUANTILE sketch (round 9): HdrHistogram-style bucketed
# histogram (Gil Tene's public HdrHistogram layout — integer log2
# octaves with linear sub-buckets; same mergeable-quantile family as
# DDSketch, Masson et al. VLDB 2019).  Everything below is integer
# arithmetic on a pre-quantized value, so the sketch is deterministic
# and cross-engine exact — the property that lets the a21 catalog
# entry carry a full hash oracle instead of an error-band verdict.
#
# The 100 TB contract: hdr_sketch reduces any volume to a bounded
# (group, bucket) count table (~16*64 rows per group max), buckets
# merge by count addition across partitions / files / days
# (property-tested), and quantile reads are one cumulative window over
# the tiny sketch.

# top SUB_BITS+1 significant bits are kept: relative bucket width is
# 2^-SUB_BITS (6.25% at 4) — the sketch's whole error budget
SUB_BITS = 4


def hdr_bucket(scaled: Column) -> Column:
    """Bucket key for a positive integer column: the value with all
    but its top ``SUB_BITS + 1`` significant bits masked off — i.e.
    the lower bound of its HdrHistogram bucket.  Monotone in the
    value, pure integer ops (``length(bin(x))`` is the integer log2
    both Spark and DuckDB share), so identical cross-engine."""
    p2 = F.pow(
        F.lit(2.0),
        F.greatest(F.length(F.bin(scaled)) - (SUB_BITS + 1), F.lit(0)),
    ).cast("bigint")
    return scaled - scaled.bitwiseAND(p2 - 1)


def hdr_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    scaled_col: str,
) -> DataFrame:
    """Build the sketch: (group, bkey, cnt) counts over the bucketed
    value.  One map-side-combinable groupBy — the only shuffle.
    Sketches over disjoint slices merge with ``hdr_merge``."""
    return (
        df.select(*group_cols, hdr_bucket(F.col(scaled_col)).alias("bkey"))
        .groupBy(*group_cols, "bkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built by ``hdr_sketch`` over disjoint inputs:
    counts add per (group, bucket).  The algebraic property that makes
    the sketch a rollup-table citizen at 100 TB (daily sketches merge
    into monthly, per-file into per-partition, …)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications"), the
# FREQUENCY member of the mergeable-sketch suite (HLL = a20 distinct,
# HDR = a21 quantiles, Bloom = d9 membership, Misra-Gries = x15 topk).
# md5-derandomized row hashes (the repo's convention, same shape as
# pipelines/dedup.bloom_contamination_stats) make the sketch — and
# therefore its overestimates — fully deterministic and reproducible
# in any engine, so a catalog entry can hash-check the ESTIMATES, not
# just an error-band verdict.
#
# The 100 TB contract: any token volume reduces to a depth×width cell
# table (CMS_DEPTH*CMS_WIDTH rows max) via ONE map-side-combinable
# groupBy; cells merge across partitions/files/days by count addition;
# point queries are a k-row probe join.  Guarantee: est ≥ true always
# (never undercounts), est ≤ true + εN with ε = e/width at the usual
# failure bound δ = e^-depth.

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_positions(term: Column, depth: int, width: int) -> Column:
    """All ``depth`` cell indices for ``term`` from ONE md5: row j's
    position is the j-th 8-hex-digit slice of md5('cms|' || term)
    taken as a 32-bit integer mod ``width``.  One hash per term (the
    first measurement paid depth md5s per token — 4× the kernel cost
    of the build scan for nothing: digest slices are as independent
    as separately-seeded hashes for cell assignment), deterministic,
    engine-portable (DuckDB mirrors the slices with md5 + Horner hex
    expansions).  depth ≤ 4 (md5 has 32 hex digits)."""
    if depth > 4:
        raise ValueError("cms digest slicing supports depth <= 4")
    d = F.md5(F.concat(F.lit("cms|"), term))
    return F.array(
        *[
            F.conv(F.substring(d, 1 + 8 * j, 8), 16, 10).cast("bigint")
            % width
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    term_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch over one pass of ``term_col``: (j, pos, cnt)
    cell counts, ≤ depth×width rows regardless of input volume.  The
    posexplode multiplies the stream ``depth``× BEFORE the groupBy,
    but partial aggregation combines map-side into ≤ depth×width cells
    per task, so the single shuffle moves only bounded summaries —
    the same sketch-not-stream shuffle shape as hdr_sketch."""
    return (
        df.select(
            F.posexplode(
                cms_positions(F.col(term_col), depth, width)
            ).alias("j", "pos")
        )
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query ``probes``' terms against a sketch built with the
    same (depth, width): est(term) = min over rows j of the cell at
    pos_j(term); a missing cell reads as 0 (the term never occurred).
    Probe terms explode ``depth``× and broadcast-join the (tiny) cell
    table — O(k·depth) work however large the sketched stream was."""
    ppos = probes.select(
        F.col(term_col).alias("term"),
        F.posexplode(cms_positions(F.col(term_col), depth, width)).alias(
            "j", "pos"
        ),
    )
    return (
        ppos.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


def hdr_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    pcts: Sequence[int] = (50, 95, 99),
) -> DataFrame:
    """Read p-th percentile estimates (bucket lower bounds at rank
    ceil(p·n/100), integer rank math so no float boundary to flicker)
    from a sketch: one cumulative window per group over ≤ ~1k rows.
    Returns group cols + n_values + n_buckets + one ``p{pct}_scaled``
    column per requested percentile (still in the caller's scaled
    integer domain)."""
    from pyspark.sql import Window

    wc = Window.partitionBy(*group_cols).orderBy("bkey")
    wn = Window.partitionBy(*group_cols)
    cum = sketch.select(
        *group_cols,
        "bkey",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )

    def _est(pct: int) -> Column:
        rank = F.floor((F.lit(pct) * F.col("n") + 99) / 100.0)
        return F.min(F.when(F.col("cum") >= rank, F.col("bkey")))

    return cum.groupBy(*group_cols).agg(
        F.max("n").cast("bigint").alias("n_values"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        *[_est(p).alias(f"p{p}_scaled") for p in pcts],
    )
