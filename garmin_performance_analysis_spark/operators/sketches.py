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

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
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
