"""Form-anomaly detection pipeline (SURVEY.md T2-T5) — the reference's
largest single operator (``mcp/rag/queries/form_anomaly_detector.py``,
1071 LoC of per-activity Python) re-expressed as one window/agg plan.

Stages (each a pure expression layer, shuffling once on the partition
key):

1. rolling centered baseline (W4)   — ``:147-179``
2. z-score + magnitude + worse-direction gates (T2) — ``:24-73,217-287``
3. sustained grouping with bounded adjacency (T3)  — ``:289-328``
4. per-event severity bands (T5)    — ``:690-786``
5. island cause classification (T4) — ``:181-215,330-425``: spike
   (extreme peak) vs drift (sustained elevation vs the early-session
   baseline) vs isolated.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import gaps_and_islands


def detect_anomalies(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str,
    z_threshold: float = 2.5,
    magnitude_gate: float = 0.0,
    worse_is_high: bool = True,
    max_gap: int = 2,
    min_span: int = 3,
    baseline_n: int = 5,
    spike_z: float = 3.5,
    drift_pct: float = 0.10,
) -> DataFrame:
    """Sustained anomaly islands with severity and cause.

    ``order_col`` must be an integer ordinal (sequence position) per
    partition; adjacency and span gates follow the reference's
    inclusive span = last-first+1 semantics.

    Returns one row per island: bounds, size, peak z, severity of the
    peak (high >4.5-scaled band, then medium/low), and cause —
    ``spike`` when the peak z exceeds ``spike_z``, ``drift`` when the
    island mean sits ``drift_pct`` above the partition's first
    ``baseline_n`` values (the reference's first-5-minutes HR baseline,
    ``:330-425``), else ``isolated``.
    """
    wp = Window.partitionBy(*partition_cols)
    worder = wp.orderBy(order_col)

    mean = F.avg(value_col).over(wp)
    std = F.stddev_samp(value_col).over(wp)
    z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
    abs_dev = F.abs(F.col(value_col) - mean)
    direction_ok = (
        (F.col(value_col) > mean) if worse_is_high else (F.col(value_col) < mean)
    )
    flagged = (
        df.withColumn("_z", z)
        .withColumn("_flag", (F.abs(z) > z_threshold) & (abs_dev >= magnitude_gate) & direction_ok)
    )

    # early-session baseline: mean of the first `baseline_n` ordinals
    rn = F.row_number().over(worder)
    with_rn = flagged.withColumn("_rn", rn)
    baseline = with_rn.filter(F.col("_rn") <= baseline_n).groupBy(*partition_cols).agg(
        F.avg(value_col).alias("_baseline")
    )

    anomalous = with_rn.filter(F.col("_flag"))
    islands = gaps_and_islands(anomalous, partition_cols, order_col, max_gap=max_gap)
    keys = [*partition_cols, "island_id"]
    per_island = (
        islands.groupBy(*keys)
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.abs(F.col("_z"))).alias("max_abs_z"),
            F.avg(value_col).alias("island_mean"),
        )
        .filter(
            F.col("island_end").cast("long") - F.col("island_start").cast("long") + 1
            >= min_span
        )
    )
    severity = (
        F.when(F.col("max_abs_z") > 4.5, F.lit("high"))
        .when(F.col("max_abs_z") > 3.5, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    joined = per_island.join(baseline, list(partition_cols), "left")
    drift_cond = F.col("_baseline").isNotNull() & (
        F.col("island_mean") > F.col("_baseline") * (1.0 + drift_pct)
    )
    cause = (
        F.when(F.col("max_abs_z") > spike_z, F.lit("spike"))
        .when(drift_cond, F.lit("drift"))
        .otherwise(F.lit("isolated"))
    )
    return joined.select(
        *partition_cols,
        "island_id",
        "island_start",
        "island_end",
        "n_events",
        "max_abs_z",
        "island_mean",
        severity.alias("severity"),
        cause.alias("cause"),
    )


def _metric_map(d: Optional[Mapping[str, float]]):
    """String→double map literal, or a typed NULL when no map is given
    (reference semantics: a metric without a configured gate/trigger
    skips that check entirely)."""
    if not d:
        return F.lit(None).cast("double")
    items = []
    for k, v in d.items():
        items += [F.lit(k), F.lit(float(v))]
    return F.create_map(*items)[F.col("metric")]


def classify_anomaly_causes(
    form: DataFrame,
    context: DataFrame,
    *,
    key_col: str = "user_id",
    frame: str = "rows",
    z_threshold: float = 3.0,
    magnitude_gates: Optional[Mapping[str, float]] = None,
    degradation_triggers: Optional[Mapping[str, float]] = None,
    rolling_window: int = 30,
    max_gap: int = 2,
    min_span: int = 5,
    elev_window: int = 5,
    pace_window: int = 10,
    hr_baseline_secs: int = 300,
    hr_current_window: int = 60,
    elev_change_gate: float = 5.0,
    pace_change_gate: float = 0.25,
    hr_drift_gate: float = 10.0,
    context_window: int = 30,
    severity_high: float = 4.5,
    severity_medium: float = 3.5,
) -> DataFrame:
    """T4 full cause classification + T5 context extraction, the
    reference's complete per-anomaly surface
    (``mcp/rag/queries/form_anomaly_detector.py:181-215,330-520``):

    1. centered rolling mean/std per form metric
       (``:147-179``: window ``[i-w, i+w)``, >=2 values else skipped);
    2. z + per-metric magnitude gate + worse-direction-only flags
       (``:217-287``);
    3. sustained runs only (adjacency <= ``max_gap``, span =
       last-first+1 >= ``min_span``, ``:289-328``) — individual
       anomalies are KEPT, not collapsed to islands;
    4. cause classification with the reference's exact priority chain
       (``:330-425``): elevation range in ``[t-5,t+5)`` > 5 m →
       ``elevation_change``; pace range in ``[t-10,t+10)`` > 0.25
       min/km → ``pace_change``; |HR drift| of the last 60 s vs the
       first-300 s baseline > 10 % AND a sustained first-half→second-
       half degradation >= the metric's trigger (``:181-215``) →
       ``fatigue``; else ``isolated`` (no fabricated correlation);
    5. ±30 s before/after context for the metric and elevation
       (``:427-477``, empty window → 0.0) and severity bands
       (``:690-710``).

    ``form``: (key_col, metric, sec, value) — with the default
    ``frame="rows"``, ``sec`` must be the DENSE per-metric ordinal
    (the reference's array index; duplicates not allowed).  For
    per-second series with gaps (null-filtered sensor dropouts), pass
    ``frame="range"``: the rolling baseline becomes a RANGE window on
    the seconds axis, which matches the reference's behaviour of
    indexing dense arrays by second while skipping None entries —
    otherwise a ROWS frame would silently widen to "the 60 nearest
    samples" across gaps while the cause/context windows stay
    second-based.  ``context``:
    (key_col, series, sec, val) with series ∈ {'elevation','pace','hr'}
    PLUS the form series again under ``series = metric`` so before/
    after metric context comes from the same single pass.

    Scale shape: the flagged-anomaly side is tiny after gating, so the
    context lookup is ONE broadcast-hash join over the context frame
    (equi on user_id, range + series predicates applied in-join) with
    conditional aggregation per window — one pass over the big table,
    no shuffle of it.  The per-user HR baseline rides in the same join
    through an OR-arm (every baseline row of the anomaly's user) and
    aggregates per anomaly, and the degradation halves are window
    aggregates fused into the rolling-baseline pass — the whole surface
    is two passes over the raw table (form rolling + context lookup),
    each scanning once.
    """
    # -- 1+2: rolling stats and gated flags --------------------------
    wbase = Window.partitionBy(key_col, "metric").orderBy("sec")
    if frame == "rows":
        wroll = wbase.rowsBetween(-rolling_window, rolling_window - 1)
    elif frame == "range":
        wroll = wbase.rangeBetween(-rolling_window, rolling_window - 1)
    else:
        raise ValueError(f"frame must be 'rows' or 'range', got {frame!r}")
    # Degradation halves are FUSED into this same pass as whole-
    # partition window aggregates: they share the (key, metric) ⊕ sec
    # exchange and sort with the rolling window, replacing what was a
    # second parquet scan + sort + groupBy + broadcast join (the
    # `halves`/`deg` branch) with two WindowExec layers over already-
    # sorted data.  Split position and length gate count NON-NULL
    # values only: the reference (form_anomaly_detector.py:205-215)
    # builds the halves from `[v for v in series if v is not None]`,
    # so a null-bearing series must get the same midpoint and len>=4
    # gate as its null-stripped projection (ADVICE r2).  The rolling
    # block deliberately keeps null rows (they occupy window slots);
    # only the degradation split skips them — F.count("value") ranks
    # non-null rows, and the conditional averages ignore null values
    # by construction.
    wseq = Window.partitionBy(key_col, "metric").orderBy("sec")
    wall = Window.partitionBy(key_col, "metric")
    nn_rn = F.count("value").over(wseq.rowsBetween(Window.unboundedPreceding, 0))
    trig = _metric_map(degradation_triggers)
    base = form.select(
        key_col,
        "metric",
        "sec",
        "value",
        F.avg("value").over(wroll).alias("baseline"),
        F.stddev_samp("value").over(wroll).alias("_s"),
        F.count("value").over(wroll).alias("_wcnt"),
        nn_rn.alias("_nn_rn"),
        F.count("value").over(wall).alias("_nn_n"),
    )
    half = F.floor(F.col("_nn_n") / 2)
    first_mean = F.avg(
        F.when(F.col("_nn_rn") <= half, F.col("value"))
    ).over(wall)
    second_mean = F.avg(
        F.when(F.col("_nn_rn") > half, F.col("value"))
    ).over(wall)
    sdeg = (
        F.when(
            trig.isNotNull() & (F.col("_nn_n") >= 4),
            (second_mean - first_mean) >= trig,
        )
        .otherwise(F.lit(False))
        .alias("_sdeg")
    )
    base = base.withColumn("_sdeg", sdeg)
    dev = F.col("value") - F.col("baseline")
    gate = _metric_map(magnitude_gates)
    flagged = base.filter(
        (F.col("_wcnt") >= 2)
        & (F.col("_s") > 0)
        & (dev > 0)
        & (dev / F.col("_s") > z_threshold)
        & (gate.isNull() | (dev >= gate))
    ).withColumn("z_score", dev / F.col("_s"))

    # -- 3: sustained runs (members kept) ----------------------------
    isl = gaps_and_islands(flagged, [key_col, "metric"], "sec", max_gap=max_gap)
    wisl = Window.partitionBy(key_col, "metric", "island_id")
    an = (
        isl.withColumn(
            "_span", F.max("sec").over(wisl) - F.min("sec").over(wisl) + F.lit(1)
        )
        .filter(F.col("_span") >= min_span)
        .select(key_col, "metric", "sec", "value", "baseline", "z_score", "_sdeg")
    )
    # `an` feeds the final plan TWICE (broadcast context probe + left
    # side of the result join), and everything above it — parquet scan,
    # row_number sort, rolling windows, island windows — would be
    # recomputed per consumer.  After gating, `an` is tiny (flagged
    # sustained anomalies only), so a LAZY localCheckpoint cuts the
    # lineage for the price of materializing a few thousand rows:
    # measured 2.32 s → 1.32 s warm on the t4 full surface at sf0.1
    # (with the harness-side union→CASE context collapse).  This
    # differs from the r2 finding that checkpointing `seq` was SLOWER —
    # there the materialized frame was the full input; checkpointing
    # the pre-gate `form` was re-measured slower too (1.8 s vs 1.3 s).
    # Checkpoint below the gate, where the data is small.  (On a
    # cluster localCheckpoint pins executor-local blocks; acceptable
    # for a gated anomaly frame that is broadcast-sized by
    # construction.)
    an = an.localCheckpoint(eager=False)

    # -- 4+5: one broadcast context pass with conditional windows ----
    akeys = [key_col, "metric", "sec"]
    lo = max(hr_current_window, context_window, pace_window, elev_window)
    hi = max(context_window, pace_window, elev_window)
    c = context.select(
        F.col(key_col).alias("c_uid"),
        F.col("series").alias("c_series"),
        F.col("sec").alias("c_sec"),
        F.col("val").alias("c_val"),
    )
    # INNER join (anomalies with no context rows at all re-acquire
    # their reference default values via the left join + coalesce
    # below) so the tiny probe side is broadcastable — a left join
    # cannot broadcast its build/left side.
    # distinct: duplicate (key, metric, sec) rows (malformed input)
    # must not double-count context windows or fan out the final join
    probe = F.broadcast(an.select(*akeys).distinct())
    # The HR BASELINE (per-user mean of the first hr_baseline_secs of
    # the hr series) rides in this same join: the OR-arm admits every
    # baseline row for the anomaly's user regardless of proximity, and
    # the aggregate below reduces them per anomaly.  Fan-out is
    # baseline rows × anomalies-per-user — anomaly-bounded, tiny —
    # and it replaces what was a THIRD full scan + row_number sort of
    # the events table feeding a separate per-user aggregate.
    in_band = (
        (F.col("c_sec") >= F.col("sec") - lo)
        & (F.col("c_sec") < F.col("sec") + hi)
        & (
            F.col("c_series").isin("elevation", "pace", "hr")
            | (F.col("c_series") == F.col("metric"))
        )
    )
    is_baseline = (F.col("c_series") == "hr") & (
        F.col("c_sec") < hr_baseline_secs
    )
    cj = probe.join(
        c,
        (F.col(key_col) == F.col("c_uid")) & (in_band | is_baseline),
        "inner",
    )

    def _in(series, a, b):
        cond = (F.col("c_series") == series) if isinstance(series, str) else series
        cond = cond & (F.col("c_sec") >= F.col("sec") + a)
        cond = cond & (F.col("c_sec") < F.col("sec") + b)
        return cond

    ev = F.when(_in("elevation", -elev_window, elev_window), F.col("c_val"))
    pv = F.when(_in("pace", -pace_window, pace_window), F.col("c_val"))
    hv = F.when(_in("hr", -hr_current_window, 0), F.col("c_val"))
    same_metric = F.col("c_series") == F.col("metric")
    b_m = F.when(_in(same_metric, -context_window, 0), F.col("c_val"))
    a_m = F.when(_in(same_metric, 0, context_window), F.col("c_val"))
    b_e = F.when(_in("elevation", -context_window, 0), F.col("c_val"))
    a_e = F.when(_in("elevation", 0, context_window), F.col("c_val"))
    bv = F.when(is_baseline, F.col("c_val"))
    ctx = cj.groupBy(*akeys).agg(
        F.when(F.count(ev) > 1, F.max(ev) - F.min(ev))
        .otherwise(F.lit(0.0))
        .alias("elevation_change_5s"),
        F.when(F.count(pv) > 1, F.max(pv) - F.min(pv))
        .otherwise(F.lit(0.0))
        .alias("pace_change_10s"),
        F.avg(hv).alias("_cur_hr"),
        F.count(hv).alias("_cur_n"),
        F.coalesce(F.avg(b_m), F.lit(0.0)).alias("before_metric_avg"),
        F.coalesce(F.avg(a_m), F.lit(0.0)).alias("after_metric_avg"),
        F.coalesce(F.avg(b_e), F.lit(0.0)).alias("before_elevation"),
        F.coalesce(F.avg(a_e), F.lit(0.0)).alias("after_elevation"),
        F.avg(bv).alias("_base_hr"),
        F.count(bv).alias("_base_n"),
    )

    # ctx is per-anomaly (tiny) but its size is opaque to the static
    # optimizer (agg over a join) — without the hint this planned as a
    # SortMergeJoin of two broadcast-sized frames
    res = an.join(F.broadcast(ctx), akeys, "left")
    # anomalies with no context rows at all (dropped by the inner cj
    # join) take the reference's empty-window defaults
    for c_name in (
        "elevation_change_5s",
        "pace_change_10s",
        "before_metric_avg",
        "after_metric_avg",
        "before_elevation",
        "after_elevation",
    ):
        res = res.withColumn(c_name, F.coalesce(F.col(c_name), F.lit(0.0)))
    drift = F.when(
        (F.coalesce(F.col("_base_n"), F.lit(0)) > 0) & (F.col("_cur_n") > 0),
        (F.col("_cur_hr") - F.col("_base_hr")) / F.col("_base_hr") * 100.0,
    ).otherwise(F.lit(0.0))
    res = res.withColumn("hr_drift_percent", drift)

    elev_ok = F.col("elevation_change_5s") > elev_change_gate
    pace_ok = F.col("pace_change_10s") > pace_change_gate
    fat_ok = (F.abs(F.col("hr_drift_percent")) > hr_drift_gate) & F.coalesce(
        F.col("_sdeg"), F.lit(False)
    )
    cause = (
        F.when(elev_ok, F.lit("elevation_change"))
        .when(pace_ok, F.lit("pace_change"))
        .when(fat_ok, F.lit("fatigue"))
        .otherwise(F.lit("isolated"))
    )
    correlation = (
        F.when(
            elev_ok,
            F.least(F.lit(0.95), F.lit(0.5) + F.col("elevation_change_5s") / 20.0),
        )
        .when(
            pace_ok,
            F.least(F.lit(0.95), F.lit(0.5) + F.col("pace_change_10s") / 0.5),
        )
        .when(
            fat_ok,
            F.least(
                F.lit(0.95), F.lit(0.5) + F.abs(F.col("hr_drift_percent")) / 30.0
            ),
        )
    )
    severity = (
        F.when(F.col("z_score") > severity_high, F.lit("high"))
        .when(F.col("z_score") > severity_medium, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return res.select(
        key_col,
        "metric",
        "sec",
        "value",
        "baseline",
        "z_score",
        cause.alias("probable_cause"),
        "elevation_change_5s",
        "pace_change_10s",
        "hr_drift_percent",
        correlation.alias("correlation"),
        severity.alias("severity"),
        "before_metric_avg",
        "before_elevation",
        "after_metric_avg",
        "after_elevation",
    )
