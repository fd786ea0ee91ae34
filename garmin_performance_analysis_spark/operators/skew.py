"""Skew mitigation: salting for hot keys (SURVEY.md §4; SCALING.md).

AQE's skew-join splitting handles most runtime skew, but two shapes
still need explicit salting at 100 TB:

- a grouped aggregation whose key distribution is power-law (one hot
  user/activity holds a large share of rows): the final-agg task for
  the hot key becomes the straggler even though partial aggregation
  already combined map-side.  ``salted_aggregate`` splits every group
  into ``buckets`` sub-groups for the first pass, then re-aggregates
  the (tiny) per-bucket partials — two shuffles, both balanced.
- a join against a skewed key where the build side is too big to
  broadcast: ``salted_join`` salts the big side and REPLICATES the
  small side per salt bucket, so one hot key spreads over ``buckets``
  tasks.  (When the small side fits in memory, prefer ``broadcast`` —
  salting is for the in-between regime.)

Salt = ``pmod(hash(row-unique cols), buckets)`` — deterministic, no
RNG, so re-runs produce identical plans and results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs per supported algebraic aggregate:
# the final stage re-combines the per-bucket partials.
# "count" is true COUNT(*) (rows per group, the input column is only a
# placeholder) so it matches a plain-SQL COUNT(*) oracle even when the
# column is nullable; "count_nonnull" is COUNT(col) semantics.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda _c: F.count(F.lit(1)), F.sum),
    "count_nonnull": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

# Join types for which replicate-small-side salting is semantics-
# preserving: every BIG row carries exactly one salt and the small side
# is replicated across all salts, so big-driven joins are unchanged.
# right/full_outer would emit every UNMATCHED small row once per salt
# bucket — rejected rather than silently wrong.
_SALTED_JOIN_TYPES = {
    "inner",
    "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage grouped aggregation for skewed keys.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {sum, count, count_nonnull, min, max} (the algebraic aggregates
    that re-combine; avg = sum/count composed by the caller — same
    decomposition Spark's own partial aggregation uses).  ``count`` is
    COUNT(*) — the input column is ignored; use ``count_nonnull`` for
    COUNT(col) semantics on a nullable column.

    Stage 1 groups by (keys + salt) — the hot key's rows spread over
    ``buckets`` reduce tasks; stage 2 groups the per-bucket partials by
    the keys alone (at most ``buckets`` rows per key).
    """
    unknown = {fn for _, fn in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {sorted(unknown)}")
    salt_cols = [F.col(c) for c in (salt_on or df.columns)]
    salted = df.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(buckets)))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(out)).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is modest but
    not broadcastable: salt the big side, replicate the small side once
    per salt bucket, join on (keys + salt).  Output = plain join output
    (salt dropped).

    ``how`` must be big-side-driven (inner / left / left_semi /
    left_anti): the replicated small side makes right and full_outer
    emit every unmatched small row ``buckets`` times, so those raise
    ``ValueError`` instead of returning silently wrong results (use a
    plain join, or swap the sides, for small-driven semantics).
    """
    if how.lower().replace("_", "") not in {
        t.replace("_", "") for t in _SALTED_JOIN_TYPES
    }:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics; "
            "supported: inner, left, left_semi, left_anti"
        )
    b = big.withColumn("_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(buckets)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")
