"""Window-function operators (SURVEY.md §2.5).

Each helper mirrors one reference analytic.  All are pure
``pyspark.sql.Window`` expressions — no Python in the hot path — so
they stay inside whole-stage codegen and shuffle exactly once on the
partition key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_partition_key(col) -> Column:
    """Constant, NON-FOLDABLE partition key for windows whose input is
    bounded by construction (post-LIMIT top-k frames, one-row-per-day
    rollups of a single athlete, one-row-per-shuffle-partition offset
    tables).

    An empty partition spec means "move every row to one task" — fine
    for a bounded frame, but indistinguishable in the plan from the
    unbounded anti-pattern, so the plan-shape gate
    (``plans.checks.global_window_specs``) forbids it outright and
    WindowExec logs a warning per run.  A plain ``F.lit(0)`` does NOT
    work: Catalyst's EliminateWindowPartitions folds literal partition
    keys away, restoring the empty spec — and ``hash(col) * 0`` is
    arithmetic-simplified away too.  ``pmod(hash(col), 1)`` is constant
    0 for every row (hash never returns NULL, x mod 1 = 0) yet survives
    optimization, so the single-partition intent stays visible in the
    plan and the gate can demand that every window carry a key.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.pmod(F.hash(c), F.lit(1))


def _parts(partition_cols: Sequence, fallback_col) -> list:
    """Partition keys for a window helper: the caller's columns, or the
    explicit bounded-constant key when the caller passed none (the
    single-athlete / pre-aggregated scope)."""
    return list(partition_cols) or [bounded_partition_key(fallback_col)]


def zscore(
    df: DataFrame,
    partition_cols: Sequence[str],
    value_col: str,
    z_col: str = "z",
) -> DataFrame:
    """Whole-partition mean/std z-score.

    Reference: ``AVG(col) OVER (), STDDEV(col) OVER ()`` then
    ``ABS((v-mean)/std)`` (``mcp/database/readers/time_series.py:257-279``)
    with a CASE guard for zero/NULL stddev.
    """
    w = Window.partitionBy(*_parts(partition_cols, value_col))
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    return df.withColumn(z_col, z)


def zscore_outliers(
    df: DataFrame,
    partition_cols: Sequence[str],
    value_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """z-score + |z| > threshold filter (T1 anomaly scan,
    ``time_series.py:216-308``)."""
    return zscore(df, partition_cols, value_col).filter(
        F.abs(F.col("z")) > threshold
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence,
) -> DataFrame:
    """Latest-version-per-key: ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY …) = 1`` — the reference's append-only versioned reads
    (``mcp/database/readers/trends_narration.py:79-83``,
    ``athlete.py:146-151``).  ``order_cols`` should end with a unique
    tiebreaker for determinism.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def centered_rolling(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    before: int,
    after: int,
) -> DataFrame:
    """Centered rolling mean/std over a numeric range window.

    Reference: the form-anomaly detector's 60 s centered window
    ``[i-30, i+30)`` (``mcp/rag/queries/form_anomaly_detector.py:147-179``)
    — a Python loop there; a single ``rangeBetween`` window here.
    The reference's right bound is exclusive, so we use ``after-1``
    (integer order key) to match its ``[i-30, i+30)`` exactly.
    """
    w = (
        Window.partitionBy(*_parts(partition_cols, order_col))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-before, after - 1)
    )
    return df.withColumn("roll_mean", F.avg(value_col).over(w)).withColumn(
        "roll_std", F.stddev_samp(value_col).over(w)
    )


def rolling_range_sum(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    days_back: int,
    out_col: str,
) -> DataFrame:
    """Trailing inclusive range sum: ``SUM(v) OVER (ORDER BY day
    RANGE BETWEEN days_back PRECEDING AND CURRENT ROW)``.

    Reference: ACWR acute(7d)/chronic(28d) load sums
    (``mcp/database/readers/training_load.py:54-120``).
    ``order_col`` must be castable to long (e.g. a day number).
    """
    w = (
        Window.partitionBy(*_parts(partition_cols, order_col))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-days_back, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def rolling_range_max(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    days_back: int,
    out_col: str = "rolling_max",
) -> DataFrame:
    """Trailing rolling max — the objective fitness curve's per-day max
    VDOT over ``[d-90, d]`` (``mcp/objective_fitness/curve.py:35-97``)."""
    w = (
        Window.partitionBy(*_parts(partition_cols, order_col))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-days_back, 0)
    )
    return df.withColumn(out_col, F.max(value_col).over(w))


def trailing_baseline_band(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    days_back: int,
    min_points: int = 3,
) -> DataFrame:
    """Rolling personal baseline: mean ± SD over the trailing window
    *excluding the current row*, plus the z-score of today vs baseline.

    Reference: wellness baselines over trailing 30 days, today excluded
    (``mcp/analysis/wellness_baseline.py:52-198``).
    """
    w = (
        Window.partitionBy(*_parts(partition_cols, order_col))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-days_back, -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_points) & (std > 0), (F.col(value_col) - mean) / std
    )
    return (
        df.withColumn("baseline_mean", mean)
        .withColumn("baseline_std", std)
        .withColumn("baseline_n", n)
        .withColumn("baseline_z", z)
    )


def gaps_and_islands(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    max_gap: int = 1,
) -> DataFrame:
    """Group ordered rows into islands where consecutive order values are
    within ``max_gap``; adds an ``island_id`` per partition.

    Reference: sustained-anomaly grouping (≤2 s adjacency,
    ``form_anomaly_detector.py:289-328``) and streak detection
    (``mcp/analysis/recovery.py:90-139``).  Classic lag + cumsum — one
    window, no Python loop.
    """
    order = F.col(order_col).cast("long")
    w = Window.partitionBy(*_parts(partition_cols, order_col)).orderBy(order)
    gap = order - F.lag(order, 1).over(w)
    new_island = F.when(gap.isNull() | (gap > max_gap), 1).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("island_id", island)


def sustained_islands(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    max_gap: int = 2,
    min_span: int = 5,
) -> DataFrame:
    """Islands (per ``gaps_and_islands``) reduced to one row each and
    filtered to spans ≥ ``min_span`` (span = last - first + 1).

    Reference: keep anomaly runs spanning ≥5 s with ≤2 s adjacency
    (``form_anomaly_detector.py:289-328``).
    """
    keys = [*partition_cols, "island_id"]
    return (
        gaps_and_islands(df, partition_cols, order_col, max_gap)
        .groupBy(*keys)
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count(F.lit(1)).alias("island_rows"),
        )
        .filter(
            F.col("island_end").cast("long")
            - F.col("island_start").cast("long")
            + 1
            >= min_span
        )
    )


def downsample(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    max_points: int,
) -> DataFrame:
    """Every-k-th-row downsample keeping first and last rows per
    partition.

    Reference: web time-series downsampling to ≤ ``max_points``
    (``web/queries/time_series.py:39-93``, step selection :84-86):
    step = ceil(n / max_points); keep rows where ``(rn-1) % step == 0``
    plus the last row.
    """
    w = Window.partitionBy(*_parts(partition_cols, order_col)).orderBy(order_col)
    wn = Window.partitionBy(*_parts(partition_cols, order_col))
    df2 = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    step = F.greatest(F.ceil(F.col("_n") / F.lit(max_points)), F.lit(1))
    keep = ((F.col("_rn") - 1) % step == 0) | (F.col("_rn") == F.col("_n"))
    return df2.filter(keep).drop("_rn", "_n")


def global_prefix_sum(
    df: DataFrame,
    order_col,
    value_col: str | Sequence[str],
    out_col: str | Sequence[str] = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum ordered by ``order_col`` WITHOUT a
    single-task window.

    ``SUM() OVER (ORDER BY x)`` with no PARTITION BY plans as one
    unpartitioned window — a single task holding the whole dataset,
    the canonical 100 TB scale-killer.  This is the classic two-phase
    distributed prefix sum instead:

    1. range-repartition on ``order_col`` (order-preserving across
       partitions) and compute the within-partition running sum;
    2. aggregate one row per partition (tiny: #partitions rows),
       compute each partition's OFFSET (sum of all earlier partitions'
       totals — a window over the tiny frame), and broadcast-join it
       back.

    Within ONE consistent partitioning the result is independent of
    where the range boundaries fall (prefix sums are associative and
    range partitioning preserves global order).  But the pid-stamped
    frame feeds TWO plan branches (local sums + per-partition totals),
    and ``spark_partition_id()`` is nondeterministic across separately
    sampled range exchanges — with exchange reuse disabled the
    branches can disagree on boundaries and silently corrupt the sums
    (review finding, reproduced: 280k/300k rows wrong under
    ``spark.sql.exchange.reuse=false``).  The pid stamp is therefore
    materialized ONCE (lazy localCheckpoint) so both branches read
    the same assignment by construction, not by optimizer courtesy.
    Cost: one linear cache of the slim input — the honest price of a
    global prefix sum; at cluster scale swap for ``persist(DISK)``.
    ``order_col`` must be unique (ties across a partition boundary
    would otherwise split nondeterministically).  It may be a single
    column name, or a sequence of names/Column sort expressions (e.g.
    ``[F.desc("quality"), "doc_id"]``) whose COMBINATION is unique —
    range partitioning and the within-partition window both honor the
    full composite order.
    """
    order_exprs = (
        [F.col(order_col)]
        if isinstance(order_col, str)
        else [F.col(c) if isinstance(c, str) else c for c in order_col]
    )
    part = (
        df.repartitionByRange(num_partitions, *order_exprs)
        if num_partitions
        else df.repartitionByRange(*order_exprs)
    )
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    # Multi-column form: several running sums share ONE range exchange,
    # one local window, and one broadcast offsets frame (a second
    # global_prefix_sum call would pay the range repartition + cache
    # again for no reason — e.g. the KS statistic needs both samples'
    # ECDFs over the same value ordering).
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError(
            f"one out_col per value_col: got {len(value_cols)} value_cols "
            f"and {len(out_cols)} out_cols"
        )
    wlocal = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part
    for i, vc in enumerate(value_cols):
        local = local.withColumn(f"_local_cum{i}", F.sum(F.col(vc)).over(wlocal))
    totals = part.groupBy("_pid").agg(
        *[F.sum(F.col(vc)).alias(f"_ptotal{i}") for i, vc in enumerate(value_cols)]
    )
    # bounded: one row per input partition, never per input row
    woff = (
        Window.partitionBy(bounded_partition_key("_pid"))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_ptotal{i}").over(woff), F.lit(0)).alias(
                f"_offset{i}"
            )
            for i in range(len(value_cols))
        ],
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(oc, F.col(f"_local_cum{i}") + F.col(f"_offset{i}"))
    drop = ["_pid"] + [f"_local_cum{i}" for i in range(len(value_cols))] + [
        f"_offset{i}" for i in range(len(value_cols))
    ]
    return out.drop(*drop)


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a snapshot/
    change stream: per key, collapse consecutive observations with an
    UNCHANGED payload and emit one validity interval per distinct run —
    (valid_from, valid_to, version), ``valid_to`` null for the current
    row.

    The change-suppression step matters: raw SCD2 over a feed that
    re-delivers unchanged snapshots mints a new version per delivery
    and the dimension table grows with the FEED, not with actual
    change.  Run detection is the null-safe ``<=>`` comparison against
    ``lag``, so null payloads compare stably.

    ``ts_col`` must be unique per key (tiebreak upstream if not).

    Plan shape for 100 TB: two stacked keyed windows (lag + running
    version sum) and one (key, version) groupBy — all shuffling on the
    same key hash, so AQE plans ONE exchange; no global window.

    Output: key cols + value cols + (version, valid_from, valid_to).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for v in value_cols:
        changed = changed | ~F.col(v).eqNullSafe(F.lag(F.col(v)).over(w))
    marked = df.withColumn(
        "_new_run",
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))
        .when(changed, F.lit(1))
        .otherwise(F.lit(0)),
    )
    versioned = marked.withColumn(
        "_version",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = versioned.groupBy(*key_cols, "_version").agg(
        *[F.first(v).alias(v) for v in value_cols],
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("_run_end"),
    )
    wk = Window.partitionBy(*key_cols).orderBy("_version")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(wk))
        .select(
            *key_cols,
            *value_cols,
            F.col("_version").cast("bigint").alias("version"),
            "valid_from",
            "valid_to",
        )
    )


def gap_fill_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Per-key daily gap fill with forward fill: materialize every
    calendar day between each key's first and last observation and
    carry the most recent observed values into the gaps — the
    regularization step before any rolling-window feature (W4-W6
    style) whose frame arithmetic assumes one row per day.

    Plan shape for 100 TB: the calendar is built per key with in-row
    ``sequence()`` + explode (no cross join against a calendar table,
    no shuffle to produce it); observed rows then attach by (key, day)
    left join and the fill is ``last(..., ignorenulls)`` over a keyed
    window — two exchanges on the same key family.  Span explosion is
    the operator's honest cost: a key spanning years emits years of
    days; cap spans upstream if that is not wanted.

    Output: key cols + (day, <value cols>, is_observed).
    """
    spans = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    days = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    obs = df.select(
        *key_cols,
        F.col(date_col).alias("day"),
        *[F.col(v) for v in value_cols],
        F.lit(True).alias("is_observed"),
    )
    joined = days.join(obs, [*key_cols, "day"], "left")
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "day",
        *[
            F.last(F.col(v), ignorenulls=True).over(wf).alias(v)
            for v in value_cols
        ],
        F.coalesce(F.col("is_observed"), F.lit(False)).alias("is_observed"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Step-function time-weighted average per key for an IRREGULARLY
    sampled series: each observation holds until the next one, so its
    weight is the seconds until that next observation — the estimator
    a plain AVG silently gets wrong whenever sampling density
    correlates with the value (bursts of low readings drag the naive
    mean down).

    The last observation per key carries no weight (nothing follows
    it); keys whose span is zero (single observation, or all at one
    timestamp) are dropped rather than emitted as 0/0.

    Ordering inside a key is (ts, *tiebreak_cols) — pass a unique
    tiebreak when timestamps can collide, or the per-engine order of
    equal timestamps would move weight between their values.

    Plan shape for 100 TB: one keyed LEAD window and one groupBy on
    the SAME key — AQE plans a single hash exchange; no global state.

    Output: key cols + (twa, span_sec, n_obs).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        ts_col, *[F.col(c) for c in tiebreak_cols]
    )
    epoch = F.col(ts_col).cast("long")
    delta = F.lead(epoch).over(w) - epoch
    weighted = df.select(
        *key_cols,
        epoch.alias("_epoch"),
        (F.col(value_col) * delta).alias("_wv"),
    )
    agg = weighted.groupBy(*key_cols).agg(
        F.sum(F.col("_wv").cast("decimal(30,6)")).alias("_num"),
        (F.max("_epoch") - F.min("_epoch")).alias("span_sec"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.filter(F.col("span_sec") > 0).select(
        *key_cols,
        F.round(
            F.col("_num").cast("double") / F.col("span_sec"), 6
        ).alias("twa"),
        "span_sec",
        "n_obs",
    )


def ewma_halflife_blocked(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    block: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Half-life EWMA (alpha = 1/2) for UNBOUNDED per-key series via
    block-carry segmentation — the scale path past the calendar-bounded
    closed form (w12), whose ``2^(i-1)`` term overflows double at
    ~1023 elements.

    The recurrence ``y_i = (x_i + y_{i-1}) / 2`` (``y_0 = x_0``) closes
    WITHIN a block of ``block`` rows as ``y = 0.5^(l+1) * (C + S_l)``
    where ``l`` is the in-block position, ``S_l`` the running sum of
    ``2^l * x`` (the global first element contributes ``2 * x_0`` so
    ``y_0 = x_0``), and ``C`` the carry — the EWMA after the previous
    block's last row.  Carries unroll across blocks as
    ``C_b = sum_k 0.5^(E_{b-1} - E_{k-1}) * T_k`` (``T_k`` = block k's
    full term sum, ``E`` = cumulative row counts): every factor is now
    ``0.5^g`` with g > 0, which DECAYS — past g >= 1075 the double
    product is EXACTLY +0.0 (below the minimum subnormal), so sources
    farther than ``1075 // block + 1`` blocks are dropped without
    changing any bit of the sum.  That banding makes the carry join
    linear in series length: each block feeds at most BAND = O(1075 /
    block) targets, built by an in-row ``sequence`` explode + hash
    equi-join on (keys, block) — no range join, no quadratic pair-up.

    Every scaling (``2^l``, ``0.5^g``) is exact in binary floating
    point; rounding happens only in the running additions, whose order
    is fixed by the (keys, block, l) / (keys, block, k) window sorts —
    so the whole chain is deterministic and mirrorable bit-for-bit by
    an engine that applies the identical expression shapes.

    Scale shape: one window over (keys) for the global index, one over
    (keys, block) for in-block prefixes, one tiny blocks frame
    (n/block rows) with a keyed prefix sum, a banded explode-join, and
    one keyed window over the carry pairs.  No global windows; state
    per task is one block.
    """
    if block < 1 or block > 512:
        raise ValueError("block must be in [1, 512] (2^l must stay finite)")
    band = 1075 // block + 1
    w_key = Window.partitionBy(*keys).orderBy(order_col)
    frame = (
        df.withColumn("_i", F.row_number().over(w_key) - 1)
        .withColumn("_b", F.floor(F.col("_i") / block))
        .withColumn("_l", (F.col("_i") % block).cast("int"))
    )
    term = F.when(F.col("_i") == 0, 2.0 * F.col(value_col)).otherwise(
        F.pow(F.lit(2.0), F.col("_l")) * F.col(value_col)
    )
    w_blk = Window.partitionBy(*keys, "_b").orderBy("_l")
    frame = frame.withColumn("_t", term).withColumn(
        "_s",
        F.sum("_t").over(w_blk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    blocks = frame.groupBy(*keys, "_b").agg(
        F.max_by("_s", "_l").alias("_T"), F.count(F.lit(1)).alias("_L")
    )
    w_blocks = Window.partitionBy(*keys).orderBy("_b")
    blocks = blocks.withColumn(
        "_ep",
        F.coalesce(
            F.sum("_L").over(w_blocks.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    src = blocks.select(
        *keys,
        F.col("_b").alias("_k"),
        F.col("_T").alias("_Tk"),
        F.col("_ep").alias("_epk"),
        F.explode(
            F.sequence(F.col("_b") + 1, F.col("_b") + band)
        ).alias("_b"),
    )
    pairs = src.join(blocks.select(*keys, "_b", "_ep"), [*keys, "_b"]).withColumn(
        "_contrib",
        F.pow(F.lit(0.5), (F.col("_ep") - F.col("_epk")).cast("double"))
        * F.col("_Tk"),
    )
    w_carry = Window.partitionBy(*keys, "_b").orderBy("_k")
    carries = (
        pairs.withColumn(
            "_cum",
            F.sum("_contrib").over(
                w_carry.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(*keys, "_b")
        .agg(F.max_by("_cum", "_k").alias("_C"))
    )
    out = frame.join(carries, [*keys, "_b"], "left").withColumn(
        out_col,
        F.pow(F.lit(0.5), (F.col("_l") + 1).cast("double"))
        * (F.coalesce(F.col("_C"), F.lit(0.0)) + F.col("_s")),
    )
    return out.drop("_i", "_b", "_l", "_t", "_s", "_C")
