"""Aggregation operators (SURVEY.md §2.4).

All exact — the reference computes exact MEDIAN/STDDEV via DuckDB
(e.g. the 5-stat block ``mcp/database/readers/splits_query_builder.py:33-34``),
so we use ``percentile`` (exact interpolated), never ``percentile_approx``,
wherever oracle parity matters.  Everything here is built-in-expression
only: map-side partial aggregation and whole-stage codegen apply, and the
single shuffle per groupBy is on the grouping key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F




def _dec_avg(c: Column) -> Column:
    """Deterministic AVG via DECIMAL-exact sum (plain float avg varies
    run-to-run with shuffle fetch order — SCALING.md lesson 5)."""
    return F.sum(c.cast("decimal(30,12)")).cast("double") / F.count(c)


def _dec_std(c: Column, sample: bool = True) -> Column:
    """Deterministic STDDEV from DECIMAL-exact moment sums, guarded
    against negative cancellation."""
    n = F.count(c)
    sx = F.sum(c.cast("decimal(30,12)")).cast("double")
    sxx = F.sum((c * c).cast("decimal(38,12)")).cast("double")
    den = (n - 1) if sample else n
    return F.when(den > 0, F.sqrt(F.greatest((sxx - sx * sx / n) / den, F.lit(0.0))))


def _median_over_counts(
    counts: DataFrame,
    keys: Sequence[str],
    bucketed: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """Turn a per-distinct-value histogram ``(*keys, _v, _cnt)`` into
    one row per key group: ``_median`` (percentile-0.5 semantics,
    two-sided interpolation weights) + ``_n_distinct``.

    Two shapes for the cumulative-count rank scan:

    - ``bucketed=False``: one window partition per key group — right
      when groups are many and individually small (per-activity stats):
      parallelism comes from the group count, and no partition exceeds
      a group's distinct-value count.
    - ``bucketed=True``: right when there are FEW groups with HUGE
      value domains (whole-table profiling) — a per-group window would
      sort an entire column's distinct values in ONE task (the same
      un-scalable shape as ``percentile``'s merge).  Instead: compute
      ~``n_buckets`` ordered split points per group with
      ``percentile_approx`` (the sketch only steers bucketing; the
      result stays exact regardless of the split quality), take local
      cumsums within each (group, bucket), then shift them by exclusive
      per-bucket offsets from a buckets-count-sized side frame
      (broadcast back).  Every task now touches ~1/n_buckets of a
      column — the per-task memory bound survives unbounded value-domain
      growth.  Honest cost note: at sf0.1 this shape is ~15% SLOWER than
      the unbucketed scan (the counts subtree appears in three plan
      branches and Catalyst only partially reuses the exchange), so it
      is reserved for inputs whose per-group distinct set can outgrow a
      task: pick by domain, not reflex.  Fixed-point metrics (2-dp
      prices) have a bounded domain at any row count → unbucketed;
      continuous domains (raw sensor doubles) grow with the data →
      bucketed.
    """
    keys = list(keys)
    if not bucketed:
        w = Window.partitionBy(*keys).orderBy("_v")
        tot = Window.partitionBy(*keys)
        r = (F.sum("_cnt").over(tot) - 1) / 2.0
        upto = F.sum("_cnt").over(w)
        below = upto - F.col("_cnt")
        ranked = counts.select(
            *keys, "_v", "_cnt", r.alias("_r"), upto.alias("_upto"), below.alias("_below")
        )
    else:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        splits = counts.groupBy(*keys).agg(
            F.percentile_approx("_v", qs, 200).alias("_splits")
        )
        bucket = F.aggregate(
            F.col("_splits"),
            F.lit(0),
            lambda acc, x: acc + F.when(F.col("_v") >= x, 1).otherwise(0),
        )
        withb = (
            counts.join(F.broadcast(splits), keys)
            .withColumn("_bucket", bucket)
            .drop("_splits")
        )
        btot = withb.groupBy(*keys, "_bucket").agg(F.sum("_cnt").alias("_btot"))
        w_off = Window.partitionBy(*keys).orderBy("_bucket")
        w_all = Window.partitionBy(*keys)
        offsets = btot.select(
            *keys,
            "_bucket",
            (F.sum("_btot").over(w_off) - F.col("_btot")).alias("_offset"),
            F.sum("_btot").over(w_all).alias("_total"),
        )
        w_local = Window.partitionBy(*keys, "_bucket").orderBy("_v")
        local_upto = F.sum("_cnt").over(w_local)
        ranked = (
            withb.withColumn("_lupto", local_upto)
            .join(F.broadcast(offsets), keys + ["_bucket"])
            .select(
                *keys,
                "_v",
                "_cnt",
                ((F.col("_total") - 1) / 2.0).alias("_r"),
                (F.col("_lupto") + F.col("_offset")).alias("_upto"),
                (F.col("_lupto") + F.col("_offset") - F.col("_cnt")).alias("_below"),
            )
        )
    r, upto, below = F.col("_r"), F.col("_upto"), F.col("_below")
    lo = F.when((below <= F.floor(r)) & (F.floor(r) < upto), F.col("_v"))
    hi = F.when((below <= F.ceil(r)) & (F.ceil(r) < upto), F.col("_v"))
    return (
        ranked.select(
            *keys,
            lo.alias("_lo"),
            hi.alias("_hi"),
            (F.ceil(r) - r).alias("_wlo"),
            (r - F.floor(r)).alias("_whi"),
        )
        .groupBy(*keys)
        .agg(
            # lo == hi must short-circuit: lo*0.5 + hi*0.5 underflows to 0.0
            # when the (single) bracketing value is subnormal (e.g. 5e-324).
            F.when(
                (F.max("_whi") == 0.0) | (F.max("_lo") == F.max("_hi")),
                F.max("_lo"),
            )
            .otherwise(F.max("_lo") * F.max("_wlo") + F.max("_hi") * F.max("_whi"))
            .alias("_median"),
            F.count(F.lit(1)).alias("_n_distinct"),
        )
    )


def _interpolate_ranked(ranked: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Final step shared by every exact-median shape: given rows
    ``(*keys, _v, _r, _upto, _below)`` covering at least the two
    rank-bracketing values, emit ``(*keys, _median)`` with
    ``percentile``'s two-sided interpolation weights."""
    r, upto, below = F.col("_r"), F.col("_upto"), F.col("_below")
    lo = F.when((below <= F.floor(r)) & (F.floor(r) < upto), F.col("_v"))
    hi = F.when((below <= F.ceil(r)) & (F.ceil(r) < upto), F.col("_v"))
    return (
        ranked.select(
            *keys,
            lo.alias("_lo"),
            hi.alias("_hi"),
            (F.ceil(r) - r).alias("_wlo"),
            (r - F.floor(r)).alias("_whi"),
        )
        .groupBy(*keys)
        .agg(
            F.when(
                (F.max("_whi") == 0.0) | (F.max("_lo") == F.max("_hi")),
                F.max("_lo"),
            )
            .otherwise(F.max("_lo") * F.max("_wlo") + F.max("_hi") * F.max("_whi"))
            .alias("_median")
        )
    )


def selected_median(
    df: DataFrame,
    group_cols: Sequence[str],
    metrics: Sequence[str],
    accuracy: int = 200,
    q_band: tuple = (0.4, 0.6),
    small_n: int = 100,
) -> DataFrame:
    """Exact median with NO large sort anywhere — the
    approximate-bracket / exact-select shape:

    1. One aggregation pass per group per metric: count, min/max, and a
       cheap ``percentile_approx`` bracket at ``q_band`` (rank error
       ≤ n/accuracy = 0.005·n, vs a 0.1·n margin — 20× slack; the
       bracket only has to CONTAIN the median ranks, the result never
       depends on its quality).  Groups smaller than ``small_n`` use
       min/max as the bracket (the discrete-rank guarantee of a sketch
       is only meaningful once n ≫ the band width).
    2. One exact counting pass: rows strictly below the bracket.
    3. One candidate pass: rows inside the bracket (~20%), reduced to a
       per-distinct-value histogram — the only frame that gets a
       cumulative rank scan, and it is band-sized, not column-sized.

    Median = interpolation at rank (n-1)/2 with global rank =
    below + local cumsum.  Every shuffle is aggregation-sized; the
    sort touches only the in-band distinct values.  This is the shape
    that wins when few groups hold huge value sets (the windowed scan
    of ``grouped_median`` sorts a whole group in one task; the bucketed
    scan fixes memory but triples the counts subtree).  Measured on the
    a1 block at sf0.1: 2.15 s (windowed) → ~1.0 s, and no task ever
    holds more than the bracket slice.
    Output: one row per group with ``{m}_median`` columns (all-null
    metrics yield no row — left-join at the call site).
    """
    qlo, qhi = q_band
    keys = [*group_cols, "_metric"]
    b_aggs = []
    for m in metrics:
        c = F.col(m)
        b_aggs += [
            F.count(c).alias(f"_n_{m}"),
            F.min(c).cast("double").alias(f"_mn_{m}"),
            F.max(c).cast("double").alias(f"_mx_{m}"),
            F.percentile_approx(c.cast("double"), [qlo, qhi], accuracy).alias(
                f"_q_{m}"
            ),
        ]
    bounds = df.groupBy(*group_cols).agg(*b_aggs)
    stack_b = ", ".join(
        f"'{m}', _n_{m}, CASE WHEN _n_{m} < {small_n} THEN _mn_{m} ELSE _q_{m}[0] END,"
        f" CASE WHEN _n_{m} < {small_n} THEN _mx_{m} ELSE _q_{m}[1] END"
        for m in metrics
    )
    bounds_long = bounds.selectExpr(
        *group_cols,
        f"stack({len(metrics)}, {stack_b}) as (_metric, _n, _blo, _bhi)",
    )
    stack_v = ", ".join(f"'{m}', cast({m} as double)" for m in metrics)
    long = df.selectExpr(
        *group_cols, f"stack({len(metrics)}, {stack_v}) as (_metric, _v)"
    ).filter(F.col("_v").isNotNull())
    joined = long.join(F.broadcast(bounds_long), keys)
    below = (
        joined.filter(F.col("_v") < F.col("_blo"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_nbelow"))
    )
    cand = (
        joined.filter((F.col("_v") >= F.col("_blo")) & (F.col("_v") <= F.col("_bhi")))
        .groupBy(*keys, "_n", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(below, keys, "left")
        .withColumn("_nbelow", F.coalesce(F.col("_nbelow"), F.lit(0)))
    )
    w = Window.partitionBy(*keys).orderBy("_v")
    ranked = cand.select(
        *keys,
        "_v",
        ((F.col("_n") - 1) / 2.0).alias("_r"),
        (F.col("_nbelow") + F.sum("_cnt").over(w)).alias("_upto"),
        (F.col("_nbelow") + F.sum("_cnt").over(w) - F.col("_cnt")).alias("_below"),
    )
    per_metric = _interpolate_ranked(ranked, keys)
    return per_metric.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("_metric") == m, F.col("_median"))).alias(
                f"{m}_median"
            )
            for m in metrics
        ]
    )


def grid_median(
    df: DataFrame,
    group_cols: Sequence[str],
    grids: "dict[str, float]",
) -> DataFrame:
    """Exact median for metrics with a KNOWN bounded value domain, via a
    fixed coarse grid — deterministic, sketch-free, and no task ever
    holds more than one grid cell:

    1. Coarse pass: histogram of ``floor(v / grid)`` per group — the
       cell count is ``domain_width / grid`` regardless of row count, so
       the rank scan over cells is a tiny window (e.g. ~1000 cells for
       2-dp prices with grid=100).
    2. The 1–2 cells straddling ranks ``floor(r)``/``ceil(r)`` are
       joined back (broadcast — one row per group) as a filter on a
       second scan; only that cell's distinct values (≤ grid·10^scale)
       get the fine rank scan, offset by the exact below-cell count.

    This is the same two-level idea as the reference's own equal-width
    histogram tool (A10, ``readers/utility.py:254-264``) applied to rank
    selection.  Right when the domain is bounded (fixed-point money,
    bounded sensor ranges); for unbounded domains use
    ``grouped_median(bucketed=True)`` (memory-safe) — this one's cell
    width would not bound the fine pass.  Measured on a1's price column
    at sf0.1: 1.35 s (windowed count scan) → ~0.75 s, two cheap scans
    instead of one 600k-row count shuffle + single-task sorts.
    Output: one row per group, ``{m}_median`` columns.
    """
    metrics = list(grids)
    keys = [*group_cols, "_metric"]
    stack_v = ", ".join(
        f"'{m}', cast({m} as double), floor(cast({m} as double) / {grids[m]!r}d)"
        for m in metrics
    )

    def _long(cols):
        return df.selectExpr(
            *group_cols, f"stack({len(metrics)}, {stack_v}) as (_metric, _v, _cell)"
        ).filter(F.col("_v").isNotNull()).select(*cols)

    coarse = _long([*keys, "_cell"]).groupBy(*keys, "_cell").agg(
        F.count(F.lit(1)).alias("_ccnt")
    )
    w_cell = Window.partitionBy(*keys).orderBy("_cell")
    w_all = Window.partitionBy(*keys)
    n = F.sum("_ccnt").over(w_all)
    upto_c = F.sum("_ccnt").over(w_cell)
    below_c = upto_c - F.col("_ccnt")
    r = (n - 1) / 2.0
    targets = (
        coarse.select(
            *keys,
            "_cell",
            r.alias("_r"),
            upto_c.alias("_upto_c"),
            below_c.alias("_below_c"),
        )
        .filter(
            (F.col("_below_c") <= F.ceil(F.col("_r")))
            & (F.floor(F.col("_r")) < F.col("_upto_c"))
        )
    )
    # 1-2 adjacent cells per group; collapse to one offset (the earliest
    # cell's exact below-count) so the fine cumsum spans both.
    offsets = targets.groupBy(*keys).agg(
        F.min("_cell").alias("_cell_lo"),
        F.max("_cell").alias("_cell_hi"),
        F.min("_below_c").alias("_nbelow"),
        F.first("_r").alias("_r"),
    )
    fine = (
        _long([*keys, "_v", "_cell"])
        .join(F.broadcast(offsets), keys)
        .filter((F.col("_cell") >= F.col("_cell_lo")) & (F.col("_cell") <= F.col("_cell_hi")))
        .groupBy(*keys, "_r", "_nbelow", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_v = Window.partitionBy(*keys).orderBy("_v")
    ranked = fine.select(
        *keys,
        "_v",
        "_r",
        (F.col("_nbelow") + F.sum("_cnt").over(w_v)).alias("_upto"),
        (F.col("_nbelow") + F.sum("_cnt").over(w_v) - F.col("_cnt")).alias("_below"),
    )
    per_metric = _interpolate_ranked(ranked, keys)
    return per_metric.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("_metric") == m, F.col("_median"))).alias(
                f"{m}_median"
            )
            for m in metrics
        ]
    )


def grouped_median(
    df: DataFrame,
    group_cols: Sequence[str],
    metrics: Sequence[str],
    bucketed: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact per-group median for each metric, distributed: unpivot the
    metrics, count per distinct value, cumulative count per
    ``(group, metric)``, interpolate at rank ``(n-1)/2`` with
    ``percentile``'s two-sided weights (see ``histogram_median``).

    Unlike ``percentile(m, 0.5)``, whose reduce side buffers the whole
    value multiset of a group in ONE task (an OOM for a hot group at
    100 TB), the only shuffled state here is the distinct-value
    histogram, and the heavy lifting is a map-side-combined count.
    Groups where a metric is entirely null get a NULL median (matching
    percentile-over-empty) via the caller's left join.
    Output: one row per group with ``{metric}_median`` columns.
    ``bucketed=True`` switches the rank scan to the split-point shape —
    see ``_median_over_counts`` for when each shape is right.

    ``weight_col``: treat each row as ``weight`` identical observations
    (integer multiplicity).  The median of the expanded multiset equals
    the weighted-histogram median, so pre-compacted (value, count)
    frames — sufficient statistics for discrete domains — get exact
    row-level medians without re-expanding.
    """
    stack = ", ".join(f"'{m}', cast({m} as double)" for m in metrics)
    long = df.selectExpr(
        *group_cols,
        *([weight_col] if weight_col else []),
        f"stack({len(metrics)}, {stack}) as (_metric, _v)",
    ).filter(F.col("_v").isNotNull())
    counts = long.groupBy(*group_cols, "_metric", "_v").agg(
        (F.sum(weight_col) if weight_col else F.count(F.lit(1))).alias("_cnt")
    )
    per_metric = _median_over_counts(
        counts, [*group_cols, "_metric"], bucketed=bucketed
    )
    return per_metric.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("_metric") == m, F.col("_median"))).alias(
                f"{m}_median"
            )
            for m in metrics
        ]
    )


_WIDE_B = 1 << 20


def _ls_avg(c: Column, scale: int) -> Column:
    """Deterministic AVG for a KNOWN-fixed-scale column via scaled-long
    sums — primitive codegen, ~4× faster than the DECIMAL path (see
    ``harness.registry.ls_sum`` for the overflow bounds)."""
    f = 10**scale
    return (F.sum(F.floor(c * f + 0.5)).cast("double") / float(f)) / F.count(c)


def _ls_std(c: Column, scale: int, sample: bool = True) -> Column:
    """Deterministic STDDEV for fixed-scale columns: scaled-long first
    moment; second moment as hi/lo long pairs (q² per row ≤ 1e14 would
    overflow one long sum), recombined in double deterministically."""
    f = float(10**scale)
    q = F.floor(c * f + 0.5)
    n = F.count(c)
    sx = F.sum(q).cast("double") / f
    q2 = q * q
    hi = F.sum(((q2 - q2 % _WIDE_B) / _WIDE_B).cast("long")).cast("double")
    lo = F.sum(q2 % _WIDE_B).cast("double")
    sxx = (hi * float(_WIDE_B) + lo) / (f * f)
    den = (n - 1) if sample else n
    return F.when(den > 0, F.sqrt(F.greatest((sxx - sx * sx / n) / den, F.lit(0.0))))


def _five_stat_fused_grid(
    df: DataFrame,
    group_cols: Sequence[str],
    metrics: Sequence[str],
    count_col: str,
    scale: int,
    grids: "dict[str, float]",
) -> DataFrame:
    """Fused grid-mode five-stat block: ONE stacked scan produces
    per-(group, metric, cell) partials — row count, scaled-long moment
    sums (the ``_ls_avg``/``_ls_std`` integers, summed per cell then
    re-summed per group: BIGINT addition is associative, so the totals
    are bit-identical to the per-row pass), min/max, and the coarse
    rank histogram — replacing five_stat_block's separate moments scan
    + grid_median coarse scan (3 raw passes → 2; the fine pass still
    re-scans, filtered to the 1-2 rank-straddling cells).  Null values
    land in a NULL cell so the group row count stays COUNT(*)-exact
    while rank selection sees only non-null cells (grid_median's
    filter).  Measured on a1 at sf0.1: 1.44 → ~1.2 s (the remaining
    cost is the fine re-scan + fixed stage overhead), identical
    values."""
    f = 10**scale
    gcols = list(group_cols)
    stack_v = ", ".join(f"'{m}', cast({m} as double)" for m in metrics)
    long = df.selectExpr(
        *gcols, f"stack({len(metrics)}, {stack_v}) as (_metric, _v)"
    )
    grid_expr = F.lit(None).cast("double")
    for m in metrics:
        grid_expr = F.when(F.col("_metric") == m, F.lit(float(grids[m]))).otherwise(
            grid_expr
        )
    v = F.col("_v")
    q = F.floor(v * f + 0.5)
    q2 = q * q
    part = (
        long.withColumn("_cell", F.floor(v / grid_expr))
        .groupBy(*gcols, "_metric", "_cell")
        .agg(
            F.count(F.lit(1)).alias("_ccnt"),
            F.count(v).alias("_nn"),
            F.sum(q).alias("_sq"),
            F.sum(((q2 - q2 % _WIDE_B) / _WIDE_B).cast("long")).alias("_shi"),
            F.sum(q2 % _WIDE_B).alias("_slo"),
            F.min(v).alias("_vmin"),
            F.max(v).alias("_vmax"),
        )
        # feeds the moments pivot AND the rank selection — checkpoint
        # eagerly so concurrent consumer stages don't both recompute
        # the raw scan (no cross-subtree CSE; cells are bounded)
        .localCheckpoint(eager=True)
    )
    m0 = metrics[0]

    def piv(m: str, col: Column) -> Column:
        return F.when(F.col("_metric") == m, col)

    aggs: list[Column] = [
        F.sum(piv(m0, F.col("_ccnt"))).alias(count_col)
    ]
    for m in metrics:
        nn = F.sum(piv(m, F.col("_nn")))
        sx = F.sum(piv(m, F.col("_sq"))).cast("double") / float(f)
        shi = F.sum(piv(m, F.col("_shi"))).cast("double")
        slo = F.sum(piv(m, F.col("_slo"))).cast("double")
        sxx = (shi * float(_WIDE_B) + slo) / (float(f) * float(f))
        aggs += [
            (sx / nn).alias(f"{m}_avg"),
            F.when(
                nn - 1 > 0,
                F.sqrt(
                    F.greatest((sxx - sx * sx / nn) / (nn - 1), F.lit(0.0))
                ),
            ).alias(f"{m}_stddev"),
            F.min(piv(m, F.col("_vmin"))).alias(f"{m}_min"),
            F.max(piv(m, F.col("_vmax"))).alias(f"{m}_max"),
        ]
    moments = part.groupBy(*gcols).agg(*aggs)

    # rank selection over the SAME partials (grid_median's exact
    # two-level logic; only non-null cells carry rank mass)
    keys = [*gcols, "_metric"]
    coarse = part.filter(F.col("_cell").isNotNull()).select(
        *keys, "_cell", F.col("_ccnt")
    )
    w_cell = Window.partitionBy(*keys).orderBy("_cell")
    w_all = Window.partitionBy(*keys)
    n = F.sum("_ccnt").over(w_all)
    upto_c = F.sum("_ccnt").over(w_cell)
    below_c = upto_c - F.col("_ccnt")
    r = (n - 1) / 2.0
    targets = coarse.select(
        *keys,
        "_cell",
        r.alias("_r"),
        upto_c.alias("_upto_c"),
        below_c.alias("_below_c"),
    ).filter(
        (F.col("_below_c") <= F.ceil(F.col("_r")))
        & (F.floor(F.col("_r")) < F.col("_upto_c"))
    )
    offsets = targets.groupBy(*keys).agg(
        F.min("_cell").alias("_cell_lo"),
        F.max("_cell").alias("_cell_hi"),
        F.min("_below_c").alias("_nbelow"),
        F.first("_r").alias("_r"),
    )
    fine = (
        long.filter(v.isNotNull())
        .withColumn("_cell", F.floor(v / grid_expr))
        .join(F.broadcast(offsets), keys)
        .filter(
            (F.col("_cell") >= F.col("_cell_lo"))
            & (F.col("_cell") <= F.col("_cell_hi"))
        )
        .groupBy(*keys, "_r", "_nbelow", "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_v = Window.partitionBy(*keys).orderBy("_v")
    ranked = fine.select(
        *keys,
        "_v",
        "_r",
        (F.col("_nbelow") + F.sum("_cnt").over(w_v)).alias("_upto"),
        (F.col("_nbelow") + F.sum("_cnt").over(w_v) - F.col("_cnt")).alias(
            "_below"
        ),
    )
    per_metric = _interpolate_ranked(ranked, keys)
    medians = per_metric.groupBy(*gcols).agg(
        *[
            F.max(F.when(F.col("_metric") == m, F.col("_median"))).alias(
                f"{m}_median"
            )
            for m in metrics
        ]
    )
    if gcols:
        joined = moments.join(medians, gcols, "left")
    else:
        joined = moments.crossJoin(medians)
    order = [*gcols, count_col]
    for m in metrics:
        order += [f"{m}_avg", f"{m}_median", f"{m}_stddev", f"{m}_min", f"{m}_max"]
    return joined.select(*order)


def five_stat_block(
    df: DataFrame,
    group_cols: Sequence[str],
    metrics: Sequence[str],
    count_col: str = "n",
    fixed_scale: int | None = None,
    median_mode: str = "window",
    median_grids: "dict[str, float] | None" = None,
) -> DataFrame:
    """AVG/MEDIAN/STDDEV/MIN/MAX per metric per group + row count.

    Reference: the ``statistics_only`` splits tools build exactly this
    block per field group (``splits_query_builder.py:152-173``).
    Output columns: ``{metric}_{avg,median,stddev,min,max}`` + ``n``.

    Two passes: a map-side-combined moments aggregation, plus the
    distributed exact-median histogram (``grouped_median``) joined back
    on the group key — both post-agg frames are group-cardinality-sized,
    so the join is cheap at any input scale.  This replaced a per-group
    ``percentile``: 10.2 s → moments-bound at sf0.1, and no single-task
    value buffers.

    ``fixed_scale``: when the metrics are fixed-point (e.g. 2-dp
    prices), pass their decimal scale to accumulate moments as scaled
    longs (primitive codegen) instead of DECIMALs — same exactness,
    ~2× on the moments pass.

    ``median_mode``: "window" (per-group rank scan — groups are many
    and small), "bucketed" (split-point scan — few groups, huge
    domains, memory-bounded), or "select" (approx-bracket exact
    selection — few groups, huge domains, no large sort; fastest when
    the bracket pass can piggyback on cheap scans), or "grid"
    (two-level fixed-grid selection via ``median_grids`` — bounded
    domains, cheapest of the scale-safe shapes).  All shapes produce
    bit-identical medians (property-tested).
    """
    if median_mode == "grid" and fixed_scale is not None:
        # fixed-point bounded-domain metrics: the fused two-scan plan
        return _five_stat_fused_grid(
            df,
            group_cols,
            metrics,
            count_col,
            fixed_scale,
            median_grids or {m: 1.0 for m in metrics},
        )
    aggs: list[Column] = [F.count(F.lit(1)).alias(count_col)]
    for m in metrics:
        c = F.col(m)
        if fixed_scale is None:
            avg_c, std_c = _dec_avg(c), _dec_std(c)
        else:
            avg_c, std_c = _ls_avg(c, fixed_scale), _ls_std(c, fixed_scale)
        aggs += [
            avg_c.alias(f"{m}_avg"),
            std_c.alias(f"{m}_stddev"),
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
        ]
    moments = df.groupBy(*group_cols).agg(*aggs)
    if median_mode == "grid":
        medians = grid_median(
            df, group_cols, median_grids or {m: 1.0 for m in metrics}
        )
    elif median_mode == "select":
        medians = selected_median(df, group_cols, metrics)
    else:
        medians = grouped_median(
            df, group_cols, metrics, bucketed=(median_mode == "bucketed")
        )
    if group_cols:
        joined = moments.join(medians, list(group_cols), "left")
    else:
        joined = moments.crossJoin(medians)
    order = [*group_cols, count_col]
    for m in metrics:
        order += [f"{m}_avg", f"{m}_median", f"{m}_stddev", f"{m}_min", f"{m}_max"]
    return joined.select(*order)


def time_range_stats(
    df: DataFrame,
    ts_col: str,
    lo,
    hi,
    metrics: Sequence[str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """AVG/STDDEV/MIN/MAX + COUNT(*) over rows in ``[lo, hi)``.

    Reference: ``mcp/database/readers/time_series.py:19-136`` (SQL :68-80).
    The range predicate is pushed to the scan by Catalyst.
    """
    filtered = df.filter((F.col(ts_col) >= lo) & (F.col(ts_col) < hi))
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for m in metrics:
        c = F.col(m)
        aggs += [
            _dec_avg(c).alias(f"{m}_avg"),
            _dec_std(c).alias(f"{m}_stddev"),
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
        ]
    grouped = filtered.groupBy(*group_cols) if group_cols else filtered.groupBy()
    return grouped.agg(*aggs)


def conditional_halves(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    metrics: Sequence[str],
) -> DataFrame:
    """First-half vs second-half averages in one pass (pivot-style
    conditional aggregation) + the decoupling ratio between halves.

    Reference: aerobic-durability decoupling computes
    ``avg(CASE WHEN ts < mid THEN hr END)`` for ~10 metric/half pairs in
    a single scan (``mcp/database/readers/durability.py:120-146``), with
    the midpoint from a prior min/max pass (``:66-118``).  Here both
    passes are window-free aggregations; the midpoint join is broadcast.
    """
    bounds = df.groupBy(*group_cols).agg(
        ((F.min(order_col) + F.max(order_col)) / F.lit(2.0)).alias("_mid")
    )
    joined = df.join(F.broadcast(bounds), list(group_cols))
    aggs: list[Column] = []
    for m in metrics:
        first = _dec_avg(F.when(F.col(order_col) < F.col("_mid"), F.col(m)))
        second = _dec_avg(F.when(F.col(order_col) >= F.col("_mid"), F.col(m)))
        aggs += [
            first.alias(f"{m}_first_half"),
            second.alias(f"{m}_second_half"),
            (second / first - F.lit(1.0)).alias(f"{m}_drift"),
        ]
    return joined.groupBy(*group_cols).agg(*aggs)


def weighted_avg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_avg",
) -> DataFrame:
    """``sum(v*w)/sum(w)`` — the reference's distance/time-weighted phase
    averages (``mcp/database/inserters/performance_trends.py:263-318``)."""
    num = F.sum(F.col(value_col) * F.col(weight_col))
    den = F.sum(F.col(weight_col))
    return df.groupBy(*group_cols).agg((num / den).alias(out_col))


def category_distribution(
    df: DataFrame, category_col: str, frac_col: str = "fraction"
) -> DataFrame:
    """COUNT per category normalized to a fraction of the total.

    Reference: training-type distribution
    (``mcp/fitness/fitness_assessor.py:226-244``).  The total comes from
    an unpartitioned window over the (tiny) aggregated frame, not over
    the input — safe at any input scale.
    """
    from pyspark.sql import Window

    from .windows import bounded_partition_key

    counts = df.groupBy(category_col).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy(bounded_partition_key(category_col)))
    return counts.withColumn(frac_col, F.col("n") / total)


def histogram_median(
    df: DataFrame, columns: Sequence[str], bucketed: bool = False
) -> DataFrame:
    """Exact whole-table median per column, fully distributed: unpivot
    to ``(column_name, value)``, count per distinct value, cumulative
    count ordered by value, then linear interpolation at rank
    ``(n-1)/2`` — bit-identical to ``percentile(c, 0.5)``, which
    interpolates with the two-sided weights
    ``(ceil(r)-r)*lo + (r-floor(r))*hi`` (NOT ``lo + (hi-lo)*frac``;
    the two differ in the last ulp and the driver compares hashes).

    Why not ``percentile``: its final merge pulls every value of a
    column into ONE task's memory (single-group aggregate), a hard OOM
    at large inputs.  Here the only per-task state is the distinct-value
    histogram slice.  Pass ``bucketed=True`` for columns whose distinct
    set can outgrow one task (continuous domains): a whole-table profile
    has few key groups (one per column), so the unbucketed scan sorts a
    column's entire distinct set in a single task — fine for bounded
    fixed-point domains, a hazard for unbounded ones (see
    ``_median_over_counts`` for the trade).
    Returns ``(column_name, stat_median, stat_n_distinct)``; all-null
    columns produce no row (left-join them back as NULL, = percentile of
    empty set).  The distinct count rides the same frame: distinct
    non-null values = rows of the per-value histogram, replacing a whole
    COUNT(DISTINCT) pass (whose Expand would duplicate the input per
    column).
    """
    stack = ", ".join(f"'{m}', cast({m} as double)" for m in columns)
    long = df.selectExpr(
        f"stack({len(columns)}, {stack}) as (column_name, _v)"
    ).filter(F.col("_v").isNotNull())
    counts = long.groupBy("column_name", "_v").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        _median_over_counts(counts, ["column_name"], bucketed=bucketed)
        .withColumnRenamed("_median", "stat_median")
        .withColumnRenamed("_n_distinct", "stat_n_distinct")
    )


def _profile_fused_grid(
    df: DataFrame,
    columns: Sequence[str],
    grids: "dict[str, float]",
    fixed_scale: int,
) -> DataFrame:
    """Single-scan profiler for fixed-scale bounded-domain columns:
    ONE raw pass builds a per-(column, value) histogram (nulls kept as
    their own row), and every statistic is then algebra over that
    histogram — moments as scaled-long sums weighted by the value
    count (bit-identical to the per-row ``_ls_avg``/``_ls_std`` sums,
    since integer addition is associative), null rate and row count
    from the counts, exact n_distinct = non-null histogram rows, and
    the median via the same two-level grid selection as
    ``grid_median`` with the fine pass FILTERING the histogram instead
    of re-scanning the table.  This replaced profile_columns' grids
    shape (moments scan + coarse scan + fine scan + distinct scan =
    4 raw passes, 3 of them stack-tripled).  Locally the wall barely
    moves (~1.7 → ~1.6 s at sf0.1: the per-value shuffle — the
    exact-distinct cost the profiler already paid — dominates either
    way), but at scan-bound scale the 4×→1× raw-pass cut is the whole
    point.  The rank windows stay bounded at any scale (cells ≤
    domain/grid, fine rows ≤ 2 cells × grid·10^scale)."""
    f = 10**fixed_scale
    stack_v = ", ".join(f"'{m}', cast({m} as double)" for m in columns)
    vhist = (
        df.selectExpr(
            f"stack({len(columns)}, {stack_v}) as (column_name, _v)"
        )
        .groupBy("column_name", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        # feeds two consumers (the stats aggregation and the median
        # selection) — no cross-subtree CSE, so checkpoint once.
        # EAGER: with a lazy checkpoint the two consumers' stages run
        # concurrently and BOTH recompute the un-materialized lineage
        # (measured: 1.7 s lazy vs 1.0 s eager at sf0.1)
        .localCheckpoint(eager=True)
    )
    v, c = F.col("_v"), F.col("_c")
    q = F.floor(v * f + 0.5)
    q2 = q * q
    nn = F.sum(F.when(v.isNotNull(), c)).alias  # non-null rows
    n_nonnull = F.sum(F.when(v.isNotNull(), c))
    sx = F.sum(F.when(v.isNotNull(), q * c)).cast("double") / float(f)
    hi = F.sum(F.when(v.isNotNull(), ((q2 - q2 % _WIDE_B) / _WIDE_B).cast("long") * c)).cast("double")
    lo = F.sum(F.when(v.isNotNull(), (q2 % _WIDE_B) * c)).cast("double")
    sxx = (hi * float(_WIDE_B) + lo) / (float(f) * float(f))
    n_rows = F.sum(c)
    base = vhist.groupBy("column_name").agg(
        n_rows.alias("n_rows"),
        F.min(v).cast("double").alias("stat_min"),
        F.max(v).cast("double").alias("stat_max"),
        (sx / n_nonnull).alias("stat_avg"),
        F.when(
            n_nonnull > 1,
            F.sqrt(
                F.greatest(
                    (sxx - (sx * sx) / n_nonnull) / (n_nonnull - 1),
                    F.lit(0.0),
                )
            ),
        ).alias("stat_stddev"),
        (
            F.coalesce(F.sum(F.when(v.isNull(), c)), F.lit(0)).cast("double")
            / F.sum(c)
        ).alias("stat_null_rate"),
        F.count(F.when(v.isNotNull(), 1)).cast("double").alias("stat_n_distinct"),
    )
    # two-level grid median over the histogram (grid_median's exact
    # logic; counts are the same integers, so values are identical)
    grid_expr = F.lit(None).cast("double")
    for m, g in grids.items():
        grid_expr = F.when(F.col("column_name") == m, F.lit(float(g))).otherwise(grid_expr)
    cells = vhist.filter(v.isNotNull()).withColumn(
        "_cell", F.floor(v / grid_expr)
    )
    keys = ["column_name"]
    coarse = cells.groupBy(*keys, "_cell").agg(F.sum(c).alias("_ccnt"))
    w_cell = Window.partitionBy(*keys).orderBy("_cell")
    w_all = Window.partitionBy(*keys)
    n = F.sum("_ccnt").over(w_all)
    upto_c = F.sum("_ccnt").over(w_cell)
    below_c = upto_c - F.col("_ccnt")
    r = (n - 1) / 2.0
    targets = coarse.select(
        *keys,
        "_cell",
        r.alias("_r"),
        upto_c.alias("_upto_c"),
        below_c.alias("_below_c"),
    ).filter(
        (F.col("_below_c") <= F.ceil(F.col("_r")))
        & (F.floor(F.col("_r")) < F.col("_upto_c"))
    )
    offsets = targets.groupBy(*keys).agg(
        F.min("_cell").alias("_cell_lo"),
        F.max("_cell").alias("_cell_hi"),
        F.min("_below_c").alias("_nbelow"),
        F.first("_r").alias("_r"),
    )
    fine = (
        cells.join(F.broadcast(offsets), keys)
        .filter(
            (F.col("_cell") >= F.col("_cell_lo"))
            & (F.col("_cell") <= F.col("_cell_hi"))
        )
        .groupBy(*keys, "_r", "_nbelow", "_v")
        .agg(F.sum("_c").alias("_cnt"))
    )
    w_v = Window.partitionBy(*keys).orderBy("_v")
    ranked = fine.select(
        *keys,
        "_v",
        "_r",
        (F.col("_nbelow") + F.sum("_cnt").over(w_v)).alias("_upto"),
        (F.col("_nbelow") + F.sum("_cnt").over(w_v) - F.col("_cnt")).alias("_below"),
    )
    med = _interpolate_ranked(ranked, keys).withColumnRenamed(
        "_median", "stat_median"
    )
    return base.join(F.broadcast(med), keys, "left").select(
        "column_name",
        "n_rows",
        "stat_min",
        "stat_max",
        "stat_avg",
        "stat_median",
        "stat_stddev",
        "stat_null_rate",
        "stat_n_distinct",
    )


def profile_columns(
    df: DataFrame,
    columns: Sequence[str],
    bucketed: bool = False,
    grids: "dict[str, float] | None" = None,
    fixed_scale: int | None = None,
) -> DataFrame:
    """Table profiler: one output row per profiled column with
    count / min / max / avg / median / stddev / null-rate / n-distinct.

    Reference: ``mcp/database/readers/utility.py:18-156`` (stats SQL
    :103-113) profiles the first 10 columns of any table; null rate is
    ``SUM(CASE WHEN c IS NULL ...)/COUNT(*)``.

    Plan shape: ONE moments pass plus ONE unpivoted per-value histogram
    pass that yields both the exact median and the exact distinct count
    (distinct non-null values = histogram rows).  The earlier shapes
    this replaces, both measured at sf0.1: a combined
    COUNT(DISTINCT)+percentile aggregate (Catalyst Expand duplicates
    the input per distinct column — 3× slower) and a separate
    count-distinct pass (1.26 s of the profiler's 2.4 s).  The
    single-group ``percentile`` merge also cannot scale — it buffers a
    whole column in one task; the histogram never holds more than a
    slice per task.
    """
    if grids and fixed_scale is not None:
        # bounded-domain fixed-point columns: the single-scan fused
        # histogram plan (see _profile_fused_grid)
        return _profile_fused_grid(df, columns, grids, fixed_scale)
    basic: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for m in columns:
        c = F.col(m)
        if fixed_scale is None:
            avg_c, std_c = _dec_avg(c), _dec_std(c)
        else:
            avg_c, std_c = _ls_avg(c, fixed_scale), _ls_std(c, fixed_scale)
        basic += [
            F.min(c).cast("double").alias(f"{m}__min"),
            F.max(c).cast("double").alias(f"{m}__max"),
            avg_c.alias(f"{m}__avg"),
            std_c.alias(f"{m}__stddev"),
            F.avg(c.isNull().cast("double")).alias(f"{m}__null_rate"),
        ]
    stats = ["min", "max", "avg", "stddev", "null_rate"]
    stack_args = ", ".join(
        "'{m}', {cols}".format(
            m=m, cols=", ".join(f"{m}__{s}" for s in stats)
        )
        for m in columns
    )
    unpivoted = df.agg(*basic).selectExpr(
        "_rows as n_rows",
        f"stack({len(columns)}, {stack_args}) as "
        f"(column_name, {', '.join('stat_' + s for s in stats)})",
    )
    if grids:
        # bounded-domain columns: grid selection for the median (no
        # column-sized sort anywhere) + a two-level aggregation for the
        # exact distinct count (groupBy value, then count rows — an
        # agg-only plan; no rank scan is needed for counting)
        med = grid_median(df, [], grids).selectExpr(
            f"stack({len(columns)}, "
            + ", ".join(f"'{m}', {m}_median" for m in columns)
            + ") as (column_name, stat_median)"
        )
        stack_v = ", ".join(f"'{m}', cast({m} as double)" for m in columns)
        long = df.selectExpr(
            f"stack({len(columns)}, {stack_v}) as (column_name, _v)"
        ).filter(F.col("_v").isNotNull())
        dist = (
            long.groupBy("column_name", "_v")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("column_name")
            .agg(F.count(F.lit(1)).cast("double").alias("stat_n_distinct"))
        )
        hist = med.join(dist, "column_name", "left")
    else:
        hist = histogram_median(df, columns, bucketed=bucketed).withColumn(
            "stat_n_distinct", F.col("stat_n_distinct").cast("double")
        )
    return unpivoted.join(hist, "column_name", "left").withColumn(
        # an all-null column has no histogram row: COUNT(DISTINCT) = 0,
        # median stays NULL (percentile of the empty set)
        "stat_n_distinct",
        F.coalesce(F.col("stat_n_distinct"), F.lit(0.0)),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
) -> DataFrame:
    """Equal-width histogram: ``FLOOR((v-min)/width) AS bucket, COUNT(*),
    MIN, MAX`` per bucket, top value clamped into the last bin.

    Reference: ``mcp/database/readers/utility.py:158-322`` (SQL :254-264),
    default 20 bins.  Two aggregation passes; the scalar min/max frame is
    broadcast-cross-joined so the whole plan stays lazy and distributed
    (no driver-side ``collect`` of the bounds).
    """
    bounds = df.agg(
        F.min(value_col).cast("double").alias("_lo"),
        F.max(value_col).cast("double").alias("_hi"),
    )
    width = F.when(
        F.col("_hi") > F.col("_lo"), (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    ).otherwise(F.lit(1.0))
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("_lo")) / width),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("bucket_min"),
            F.max(value_col).alias("bucket_max"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    grid: float | None = None,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total — the robust
    center the plain median family (selected/grid/histogram medians
    above) can't express when observations carry unequal mass
    (duration-weighted paces, token-weighted quality scores).

    ``weight_col`` must be INTEGER-valued (scale fixed-point weights
    upstream): the `2·cum >= tot` crossing test is then exact integer
    arithmetic, immune to the float-accumulation ulp hazards that make
    double cumulative sums order-dependent (the SCALING.md median
    lessons).

    Shape for 100 TB: collapse duplicate values first (one keyed agg —
    the window input shrinks to distinct (group, value) pairs), then a
    per-GROUP ordered window for the cumulative weight — partitioned
    by the group key, never global — and a min-combine on the crossing
    rows.  Three exchanges, all hashed on the group key.

    ``grid``: for bounded fixed-point value domains, the grid_median
    two-level shape — a coarse cell histogram finds the half-weight
    crossing CELL (cell-cardinality windows, bounded at any scale),
    and only that cell's values get the fine cumulative scan.  This
    replaces the per-group ordered window over every distinct value
    (a single-task column sort per group when groups are few — the
    exact shape grid_median exists to avoid).  Identical results for
    non-null values by the same integer arithmetic; the grid path
    requires ``value_col`` non-null (a NULL carries no weight there,
    while the default path's NULLS-FIRST window would count it).

    Output: group cols + (wmedian, n_rows, total_weight).
    """
    keys = list(group_cols)
    if grid is not None:
        vals = df.filter(F.col(value_col).isNotNull()).withColumn(
            "_cell", F.floor(F.col(value_col) / grid)
        )
        cells = (
            vals.groupBy(*keys, "_cell")
            .agg(
                F.sum(weight_col).alias("_cw"),
                F.count(F.lit(1)).alias("_n"),
            )
            # feeds the crossing-cell windows, the fine-pass join and
            # the totals — tiny (≤ domain/grid rows per group), so an
            # eager checkpoint beats three raw-scan re-executions
            .localCheckpoint(eager=True)
        )
        wc = (
            Window.partitionBy(*keys)
            .orderBy("_cell")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy(*keys)
        cc = cells.select(
            *keys,
            "_cell",
            "_cw",
            F.sum("_cw").over(wc).alias("_cum_c"),
            F.sum("_cw").over(wt).alias("_tot"),
        )
        cross = (
            cc.filter(F.col("_cum_c") * 2 >= F.col("_tot"))
            .groupBy(*keys)
            .agg(F.min("_cell").alias("_xcell"))
        )
        info = (
            cc.join(cross, keys)
            .filter(F.col("_cell") == F.col("_xcell"))
            .select(
                *keys,
                "_xcell",
                (F.col("_cum_c") - F.col("_cw")).alias("_below"),
                "_tot",
            )
        )
        fine = (
            vals.join(info, keys)
            .filter(F.col("_cell") == F.col("_xcell"))
            .groupBy(*keys, "_below", "_tot", value_col)
            .agg(F.sum(weight_col).alias("_w"))
        )
        wv = (
            Window.partitionBy(*keys)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        med = (
            fine.select(
                *keys,
                F.col(value_col),
                "_tot",
                (F.col("_below") + F.sum("_w").over(wv)).alias("_cum"),
            )
            .filter(F.col("_cum") * 2 >= F.col("_tot"))
            .groupBy(*keys)
            .agg(F.min(value_col).alias("wmedian"))
        )
        totals = cells.groupBy(*keys).agg(
            F.sum("_n").alias("n_rows"),
            F.sum("_cw").alias("total_weight"),
        )
        return med.join(totals, keys)
    per = df.groupBy(*keys, value_col).agg(
        F.sum(weight_col).alias("_w"),
        F.count(F.lit(1)).alias("_n"),
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*keys)
    c = per.select(
        *keys,
        F.col(value_col),
        F.col("_n"),
        F.sum("_w").over(wcum).alias("_cum"),
        F.sum("_w").over(wtot).alias("_tot"),
    )
    med = (
        c.filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(*keys)
        .agg(F.min(value_col).alias("wmedian"))
    )
    # totals from the already-collapsed frame — no second input scan
    totals = per.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_w").alias("total_weight"),
    )
    return med.join(totals, keys)
