"""Per-activity composite enrichment tables (SURVEY.md D8-D10).

The reference's three largest ingest transforms, re-expressed as
window + aggregation plans (no Python in the loop):

- D8 ``form_efficiency``  — ``inserters/form_efficiency.py:18-340``
- D9 ``hr_efficiency``    — ``inserters/hr_efficiency.py:40-330``
- D10 ``performance_trends`` — ``inserters/performance_trends.py:62-420``

Label strings, thresholds, and tie-break rules follow the reference's
output contract (star ratings, Japanese stability labels, the
GPS-fragment CV exclusion, the work/rest transition classifier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.bands import role_phase

# --------------------------------------------------------------------------
# D8: form efficiency
# --------------------------------------------------------------------------

_RATING_BANDS = {
    # metric: (b5, b4, b3, b2) — value < b5 → 5 stars, < b4 → 4, ...
    "gct": (220.0, 240.0, 260.0, 280.0),
    "vo": (6.5, 8.0, 10.0, 12.0),
    "vr": (7.0, 9.0, 11.0, 13.0),
}


def star_rating(metric: str, avg_value: Column) -> Column:
    """Five-band star rating per metric average (lower is better)
    (``form_efficiency.py:18-66``)."""
    b5, b4, b3, b2 = _RATING_BANDS[metric]
    return (
        F.when(avg_value < b5, F.lit("★★★★★"))
        .when(avg_value < b4, F.lit("★★★★☆"))
        .when(avg_value < b3, F.lit("★★★☆☆"))
        .when(avg_value < b2, F.lit("★★☆☆☆"))
        .otherwise(F.lit("★☆☆☆☆"))
    )


def gct_evaluation(avg: Column) -> Column:
    """Optimal 200-250 / good 180-200 or 250-280 / too short <180 /
    too long >280 (``form_efficiency.py:69-103``)."""
    gi = avg.cast("int")
    return (
        F.when(avg.isNull(), F.lit(None).cast("string"))
        .when(avg.between(200, 250), F.concat(F.lit("Excellent ("), gi, F.lit("ms, optimal range)")))
        .when(
            (avg >= 180) & (avg < 200) | (avg > 250) & (avg <= 280),
            F.concat(F.lit("Good ("), gi, F.lit("ms)")),
        )
        .when(avg < 180, F.concat(F.lit("Too short ("), gi, F.lit("ms, may indicate overstriding)")))
        .otherwise(F.concat(F.lit("Too long ("), gi, F.lit("ms, target <250ms)")))
    )


def vo_evaluation(avg: Column) -> Column:
    v1 = F.format_string("%.1f", avg)
    return (
        F.when(avg.isNull(), F.lit(None).cast("string"))
        .when(avg < 8, F.concat(F.lit("Excellent ("), v1, F.lit("cm, minimal bounce)")))
        .when(avg < 10, F.concat(F.lit("Good ("), v1, F.lit("cm, target <8cm for optimal efficiency)")))
        .when(avg < 12, F.concat(F.lit("Acceptable ("), v1, F.lit("cm, reduce bounce)")))
        .otherwise(F.concat(F.lit("Poor ("), v1, F.lit("cm, excessive vertical movement)")))
    )


def vr_evaluation(avg: Column) -> Column:
    v1 = F.format_string("%.1f", avg)
    return (
        F.when(avg.isNull(), F.lit(None).cast("string"))
        .when(avg < 6, F.concat(F.lit("Excellent ("), v1, F.lit("%, optimal efficiency)")))
        .when(avg < 8, F.concat(F.lit("Good ("), v1, F.lit("%)")))
        .when(avg < 10, F.concat(F.lit("Acceptable ("), v1, F.lit("%, room for improvement)")))
        .otherwise(F.concat(F.lit("Poor ("), v1, F.lit("%, high energy waste)")))
    )


def build_form_efficiency(
    splits: DataFrame,
    activity_col: str = "activity_id",
    index_col: str = "split_index",
    gct_col: str = "ground_contact_time",
    vo_col: str = "vertical_oscillation",
    vr_col: str = "vertical_ratio",
) -> DataFrame:
    """D8: per-activity form stats (avg/min/max/sample-std, 0.0 when a
    single split), star ratings, evaluations, GCT variability (CV) and
    the VO trend string — CV + first-vs-second-half change with the
    reference's exact wording (``form_efficiency.py:170-244,300-340``).

    The half split is ``mid = n // 2`` over split order: first half =
    rows 1..mid, matching the Python slicing semantics.

    All means/stds come from DECIMAL-exact moment sums, so results are
    deterministic across runs and partitionings — floating sums in
    shuffle-fetch order wobble in the last ulps, which both flickers
    re-runs and breaks oracle hash parity at rounding boundaries.
    """

    def _davg(c: Column) -> Column:
        return F.sum(c.cast("decimal(30,12)")).cast("double") / F.count(c)

    def _dstd(c: Column, sample: bool = True) -> Column:
        n = F.count(c)
        sx = F.sum(c.cast("decimal(30,12)")).cast("double")
        sxx = F.sum((c * c).cast("decimal(38,12)")).cast("double")
        den = (n - 1) if sample else n
        return F.when(den > 0, F.sqrt(F.greatest((sxx - sx * sx / n) / den, F.lit(0.0))))

    w = Window.partitionBy(activity_col).orderBy(index_col)
    wp = Window.partitionBy(activity_col)
    with_rn = (
        splits.filter(F.col(vo_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wp))
    )
    mid = F.floor(F.col("_n") / 2)
    agg = with_rn.groupBy(activity_col).agg(
        *[
            a
            for c, name in ((gct_col, "gct"), (vo_col, "vo"), (vr_col, "vr"))
            for a in (
                _davg(F.col(c)).alias(f"{name}_average"),
                F.min(c).alias(f"{name}_min"),
                F.max(c).alias(f"{name}_max"),
                F.coalesce(_dstd(F.col(c)), F.lit(0.0)).alias(f"{name}_std"),
            )
        ],
        F.count(F.lit(1)).alias("_n"),
        # population std for the VO trend CV (reference uses /n there)
        _dstd(F.col(vo_col), sample=False).alias("_vo_stdp"),
        _davg(F.when(F.col("_rn") <= mid, F.col(vo_col))).alias("_vo_first"),
        _davg(F.when(F.col("_rn") > mid, F.col(vo_col))).alias("_vo_second"),
    )
    cv = F.col("_vo_stdp") / F.col("vo_average") * 100.0
    change_pct = (F.col("_vo_second") - F.col("_vo_first")) / F.col("_vo_first") * 100.0
    consistency = (
        F.when(cv < 5, F.lit("Very stable"))
        .when(cv < 10, F.lit("Stable"))
        .otherwise(F.lit("Variable"))
    )
    trend = (
        F.when(F.abs(change_pct) < 3, F.lit("consistent"))
        .when(change_pct > 0, F.format_string("increasing (+%.1f%%, fatigue indicator)", change_pct))
        .otherwise(F.format_string("decreasing (%.1f%%)", change_pct))
    )
    vo_trend = F.when(F.col("_n") < 3, F.format_string("Insufficient data (%d splits)", F.col("_n"))).otherwise(
        F.concat(
            consistency,
            F.format_string(" (%.1fcm avg, CV=%.0f%%, ", F.col("vo_average"), cv),
            trend,
            F.lit(")"),
        )
    )
    return agg.select(
        activity_col,
        *[f"{n}_{s}" for n in ("gct", "vo", "vr") for s in ("average", "min", "max", "std")],
        star_rating("gct", F.col("gct_average")).alias("gct_rating"),
        star_rating("vo", F.col("vo_average")).alias("vo_rating"),
        star_rating("vr", F.col("vr_average")).alias("vr_rating"),
        gct_evaluation(F.col("gct_average")).alias("gct_evaluation"),
        vo_evaluation(F.col("vo_average")).alias("vo_evaluation"),
        vr_evaluation(F.col("vr_average")).alias("vr_evaluation"),
        (F.col("gct_std") / F.col("gct_average") * 100.0).alias("gct_variability"),
        vo_trend.alias("vo_trend"),
    )


# --------------------------------------------------------------------------
# D9: HR efficiency
# --------------------------------------------------------------------------

_EASY_LABELS = ("aerobic_base", "recovery", "low_moderate", "base", "warmup", "easy")
_TEMPO_LABELS = ("tempo", "tempo_run")
_THRESH_LABELS = ("lactate_threshold", "threshold_work", "threshold")
_VO2_LABELS = ("vo2max", "vo2_max", "anaerobic_capacity", "anaerobic", "interval_sprint", "speed")


def _category(training_type: Column) -> Column:
    t = F.lower(training_type)
    return (
        F.when(training_type.isNull(), F.lit("unknown"))
        .when(t.isin(*_EASY_LABELS), F.lit("easy"))
        .when(t.isin(*_TEMPO_LABELS), F.lit("tempo"))
        .when(t.isin(*_THRESH_LABELS), F.lit("threshold"))
        .when(t.isin(*_VO2_LABELS), F.lit("vo2max"))
        .otherwise(F.lit("unknown"))
    )


def build_hr_efficiency(zone_rows: DataFrame, activity_meta: DataFrame) -> DataFrame:
    """D9: per-activity HR-zone analysis (``hr_efficiency.py:40-330``).

    ``zone_rows``: (activity_id, zone_number, time_in_zone_seconds);
    ``activity_meta``: (activity_id, training_type, avg_hr, max_hr, min_hr).

    Computes zone percentages, primary zone (max time, ties → lower
    zone), the canonical intensity category with the Zone3-dominant
    "moderate" refinement, the per-category zone-distribution rating
    bands, aerobic efficiency, combined training quality, zone2-focus /
    zone4-threshold flags, and the Japanese HR-stability label.
    """
    total = Window.partitionBy("activity_id")
    # floor(x*100+0.5)/100: engine-stable 2-dp rounding (Spark's ROUND
    # rounds the shortest decimal repr; see SCALING.md lesson 5)
    raw_pct = F.col("time_in_zone_seconds") / F.col("_tot") * 100.0
    pct = (
        zone_rows.withColumn("_tot", F.sum("time_in_zone_seconds").over(total))
        .withColumn("pct", F.floor(raw_pct * 100.0 + 0.5) / 100.0)
    )
    wide = (
        pct.groupBy("activity_id")
        .pivot("zone_number", [1, 2, 3, 4, 5])
        .agg(F.first("pct"))
        .na.fill(0.0)
        .select(
            "activity_id",
            *[F.col(str(z)).alias(f"zone{z}_percentage") for z in range(1, 6)],
        )
    )
    rank_w = Window.partitionBy("activity_id").orderBy(
        F.col("time_in_zone_seconds").desc(), F.col("zone_number").asc()
    )
    primary = (
        zone_rows.withColumn("_r", F.row_number().over(rank_w))
        .filter(F.col("_r") == 1)
        .select(
            "activity_id",
            F.concat(F.lit("Zone "), F.col("zone_number")).alias("primary_zone"),
        )
    )
    df = wide.join(primary, "activity_id").join(activity_meta, "activity_id")
    z1, z2, z3, z4, z5 = (F.col(f"zone{i}_percentage") for i in range(1, 6))
    base_cat = _category(F.col("training_type"))
    moderate = (
        base_cat.isin("easy", "unknown")
        & (F.col("primary_zone") == "Zone 3")
        & (z3 >= 50.0)
        & (z4 + z5 < 15.0)
    )
    cat = F.when(moderate, F.lit("moderate")).otherwise(base_cat)

    def banded(band: Column, bands: tuple[float, float, float]) -> Column:
        hi, mid_, lo = bands
        return (
            F.when(band >= hi, F.lit("Excellent"))
            .when(band >= mid_, F.lit("Good"))
            .when(band >= lo, F.lit("Fair"))
            .otherwise(F.lit("Poor"))
        )

    rating = (
        F.when(cat == "easy", banded(z1 + z2, (90, 75, 60)))
        .when(cat == "moderate", banded(z2 + z3, (80, 60, 40)))
        .when(cat.isin("tempo", "threshold"), banded(z3 + z4, (60, 40, 20)))
        .when(cat == "vo2max", banded(z4 + z5, (50, 30, 15)))
        .otherwise(F.when(z1 + z2 + z3 >= 70, F.lit("Good")).otherwise(F.lit("Fair")))
    )
    aerobic = (
        F.when(z2 + z3 >= 80, F.lit("Excellent aerobic base"))
        .when(z2 + z3 >= 60, F.lit("Good aerobic development"))
        .when(z2 + z3 >= 40, F.lit("Moderate aerobic work"))
        .otherwise(F.lit("Limited aerobic stimulus"))
    )
    aligned = (
        F.when(cat == "unknown", F.lit(True))
        .when(cat == "easy", F.col("primary_zone").isin("Zone 1", "Zone 2"))
        .when(cat == "moderate", F.col("primary_zone").isin("Zone 2", "Zone 3"))
        .when(cat.isin("tempo", "threshold"), F.col("primary_zone").isin("Zone 3", "Zone 4"))
        .when(cat == "vo2max", F.col("primary_zone").isin("Zone 4", "Zone 5"))
        .otherwise(F.lit(False))
    )
    quality = (
        F.when((rating == "Excellent") & aligned, F.lit("Excellent"))
        .when((rating == "Excellent") | ((rating == "Good") & aligned), F.lit("Good"))
        .when(rating == "Good", F.lit("Fair"))
        .otherwise(F.lit("Poor"))
    )
    stability = F.when(
        (F.col("avg_hr") > 0)
        & ((F.col("max_hr") - F.col("min_hr")) / F.col("avg_hr") < 0.3),
        F.lit("優秀"),
    ).otherwise(F.lit("変動あり"))
    return df.select(
        "activity_id",
        *[f"zone{i}_percentage" for i in range(1, 6)],
        "primary_zone",
        "training_type",
        cat.alias("intensity_category"),
        rating.alias("zone_distribution_rating"),
        aerobic.alias("aerobic_efficiency"),
        quality.alias("training_quality"),
        (z2 > 60).alias("zone2_focus"),
        (z4 + z5 > 20).alias("zone4_threshold_work"),
        stability.alias("hr_stability"),
    )


# --------------------------------------------------------------------------
# D10: performance trends
# --------------------------------------------------------------------------


def build_performance_trends(
    splits: DataFrame,
    activity_col: str = "activity_id",
    index_col: str = "split_index",
    intensity_col: str = "intensity_type",
    pace_col: str = "pace_seconds_per_km",
    hr_col: str = "heart_rate",
    distance_col: str = "distance",
) -> DataFrame:
    """D10: per-activity pace consistency (GPS-fragment-robust CV),
    workout-structure classification, and rep-matched HR drift
    (``performance_trends.py:62-185``).

    - pace_consistency: CV over *representative* run laps — laps with
      distance < median(run-lap distance)·0.5 excluded; if <2 remain,
      fall back to all run laps (``:76-104``).
    - structure: 'interval' iff ≥2 work laps, ≥2 rest laps and ≥3
      work↔rest transitions in the lap sequence (warmup/cooldown laps
      ignored), else 'steady' (``:112-142``).
    - rep_hr_drift: early-half vs late-half ACTIVE-rep speed:HR
      efficiency loss %, positive = HR rising at equal pace (``:145-185``).
    """
    it = F.upper(F.col(intensity_col))
    run_lap = it.isin("ACTIVE", "INTERVAL")
    rest_lap = it.isin("REST", "RECOVERY")

    # the representative-lap gate (distance >= median(run dist)·0.5)
    # is evaluated INSIDE the final aggregation from a collected
    # run-lap array: the exact `percentile` aggregate sees the same
    # rows the old full-partition percentile WINDOW saw (identical
    # value), and the gate's mean/std fold over the filtered array in
    # DECIMAL — exact, order-free addition, so bit-identical to the
    # per-row grouped sums it replaces.  This deletes one whole
    # window pass over the splits frame (measured part of d10's
    # 6-window plan; arrays are per-activity lap counts, bounded)
    base = splits.withColumn("_run", run_lap).withColumn("_rest", rest_lap)

    # work/rest sequence with transitions (ordered by split index,
    # non-work/rest laps ignored by the lag chain)
    seq_w = Window.partitionBy(activity_col).orderBy(index_col)
    state = F.when(F.col("_run"), F.lit("work")).when(F.col("_rest"), F.lit("rest"))
    with_state = base.withColumn("_state", state)
    prev_state = F.last("_state", ignorenulls=True).over(
        seq_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    transition = (
        F.col("_state").isNotNull()
        & prev_state.isNotNull()
        & (F.col("_state") != prev_state)
    ).cast("int")
    with_state = with_state.withColumn("_trans", transition)

    # valid ACTIVE reps for the drift halves; their order (for the
    # early/late split) comes from sorting the collected array by
    # split_index — no extra running-count window needed
    valid_rep = (
        F.col("_run")
        & (F.col(pace_col) > 0)
        & (F.col(hr_col) > 0)
    )
    with_state = with_state.withColumn("_rep_valid", valid_rep)

    def _davg(c: Column) -> Column:
        # DECIMAL-exact sums: deterministic across shuffle orders and
        # engines (SCALING.md lesson 5)
        return F.sum(c.cast("decimal(30,12)")).cast("double") / F.count(c)

    def _dstd(c: Column) -> Column:
        n = F.count(c)
        sx = F.sum(c.cast("decimal(30,12)")).cast("double")
        sxx = F.sum((c * c).cast("decimal(38,12)")).cast("double")
        return F.when(
            n > 1, F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0)))
        )

    run_pace = F.when(F.col("_run"), F.col(pace_col))
    agg = with_state.groupBy(activity_col).agg(
        F.sum(F.col("_run").cast("int")).alias("_work_n"),
        F.sum(F.col("_rest").cast("int")).alias("_rest_n"),
        F.sum("_trans").alias("_transitions"),
        # run-lap median distance (exact percentile aggregate — the
        # same rows and function as the window it replaced) + the
        # run-lap (pace, distance) array the representative gate
        # filters below
        F.expr(
            f"percentile(CASE WHEN upper({intensity_col}) IN"
            f" ('ACTIVE','INTERVAL') THEN {distance_col} END, 0.5)"
        ).alias("_med_dist"),
        F.collect_list(
            F.when(
                F.col("_run"),
                F.struct(
                    F.col(pace_col).cast("double").alias("p"),
                    F.col(distance_col).cast("double").alias("d"),
                ),
            )
        ).alias("_runarr"),
        _dstd(run_pace).alias("_all_std"),
        _davg(run_pace).alias("_all_mean"),
        F.count(F.when(F.col("_run") & F.col(pace_col).isNotNull(), 1)).alias("_all_n"),
        # drift halves, fused into THIS aggregation: collect the valid
        # reps as (split_index, pace, hr) structs and sort by index —
        # the early/late split then reads from the array instead of a
        # second corpus pass (this branch previously re-scanned the
        # source, re-windowed, re-aggregated and joined back).  Arrays
        # are per-activity lap counts — bounded small by construction.
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_rep_valid"),
                    F.struct(
                        F.col(index_col).alias("i"),
                        F.col(pace_col).cast("double").alias("p"),
                        F.col(hr_col).cast("double").alias("h"),
                    ),
                )
            )
        ).alias("_varr"),
    )

    # decimal-exact fold over an array slice == the oracle's grouped
    # DECIMAL(30,12) SUM over the same rows: each addend is quantized
    # to scale 12 before accumulation, decimal addition is exact, and
    # the re-CAST per step cannot overflow for bounded telemetry sums.
    def _fold_avg(field: str, start: str, length: str) -> Column:
        total = F.expr(
            f"aggregate(slice(_varr, {start}, {length}),"
            " CAST(0 AS DECIMAL(30,12)),"
            f" (acc, s) -> CAST(acc + CAST(s.{field} AS DECIMAL(30,12)) AS DECIMAL(30,12)))"
        )
        n = F.expr(length)
        # guard the ANSI divide: empty slice -> NULL (matches the
        # oracle's SUM-over-no-rows / COUNT=0 -> NULL)
        return F.when(n > 0, total.cast("double") / n)

    # representative-lap stats from the run-lap array: same filter the
    # old per-row `_rep` flag expressed, same DECIMAL sums as the old
    # grouped _davg/_dstd (decimal addition is exact and order-free)
    rep_arr = F.expr(
        "filter(_runarr, s -> s.p IS NOT NULL AND s.d IS NOT NULL"
        " AND s.d >= _med_dist * 0.5)"
    )
    agg = agg.withColumn("_rep_arr", rep_arr).withColumn(
        "_rep_n", F.size("_rep_arr")
    )
    rep_sx = F.expr(
        "aggregate(_rep_arr, CAST(0 AS DECIMAL(30,12)),"
        " (acc, s) -> CAST(acc + CAST(s.p AS DECIMAL(30,12))"
        " AS DECIMAL(30,12)))"
    ).cast("double")
    rep_sxx = F.expr(
        "aggregate(_rep_arr, CAST(0 AS DECIMAL(38,12)),"
        " (acc, s) -> CAST(acc + CAST(s.p * s.p AS DECIMAL(38,12))"
        " AS DECIMAL(38,12)))"
    ).cast("double")
    rn = F.col("_rep_n")
    agg = agg.withColumn(
        "_rep_mean", F.when(rn > 0, rep_sx / rn)
    ).withColumn(
        "_rep_std",
        F.when(
            rn > 1,
            F.sqrt(
                F.greatest(
                    (rep_sxx - rep_sx * rep_sx / rn) / (rn - 1), F.lit(0.0)
                )
            ),
        ),
    )
    agg = (
        agg.withColumn("_nrep", F.size("_varr"))
        .withColumn("_mid", F.floor(F.col("_nrep") / 2).cast("int"))
        .withColumn("_p_early", _fold_avg("p", "1", "_mid"))
        .withColumn("_h_early", _fold_avg("h", "1", "_mid"))
        .withColumn("_p_late", _fold_avg("p", "_mid + 1", "_nrep - _mid"))
        .withColumn("_h_late", _fold_avg("h", "_mid + 1", "_nrep - _mid"))
    )
    ratio_early = (1.0 / F.col("_p_early")) / F.col("_h_early")
    ratio_late = (1.0 / F.col("_p_late")) / F.col("_h_late")
    drift = F.when(
        (F.col("_nrep") >= 2) & ratio_early.isNotNull() & (ratio_early != 0),
        (ratio_early - ratio_late) / ratio_early * 100.0,
    )
    cv = F.when(
        (F.col("_rep_n") >= 2) & (F.col("_rep_mean") > 0),
        F.col("_rep_std") / F.col("_rep_mean"),
    ).otherwise(
        F.when(
            (F.col("_all_n") == 1), F.lit(0.0)
        ).when(
            (F.col("_all_n") > 1) & (F.col("_all_mean") > 0),
            F.col("_all_std") / F.col("_all_mean"),
        )
    )
    structure = F.when(
        (F.col("_work_n") >= 2) & (F.col("_rest_n") >= 2) & (F.col("_transitions") >= 3),
        F.lit("interval"),
    ).otherwise(F.lit("steady"))
    out = agg
    return out.select(
        activity_col,
        cv.alias("pace_consistency"),
        structure.alias("workout_structure"),
        drift.alias("rep_hr_drift_pct"),
        F.col("_work_n").alias("n_work_laps"),
        F.col("_rest_n").alias("n_rest_laps"),
    )


def phase_weighted_stats(
    splits: DataFrame,
    activity_col: str = "activity_id",
    intensity_col: str = "intensity_type",
    index_col: str = "split_index",
    pace_col: str = "pace_seconds_per_km",
    hr_col: str = "heart_rate",
    cadence_col: str = "cadence",
    power_col: str = "power",
    distance_col: str = "distance",
    duration_col: str = "duration_seconds",
) -> DataFrame:
    """D10/A11: per-(activity, phase) weighted stats — distance-weighted
    pace, time-weighted HR/cadence/power, plus the member split CSV
    (``performance_trends.py:263-318``)."""
    phased = splits.withColumn("_phase", role_phase(F.col(intensity_col))).filter(
        F.col("_phase").isNotNull()
    )

    def wavg(value: str, weight: str) -> Column:
        num = F.sum(F.when(F.col(value).isNotNull(), F.col(value) * F.col(weight)))
        den = F.sum(F.when(F.col(value).isNotNull(), F.col(weight)))
        return num / den

    aggs = [
        F.array_join(
            F.array_sort(F.collect_list(F.col(index_col).cast("int"))), ","
        ).alias("splits_csv"),
        wavg(pace_col, distance_col).alias("avg_pace_seconds_per_km"),
        wavg(hr_col, duration_col).alias("avg_hr"),
    ]
    # cadence/power are optional in many split sources
    if cadence_col in splits.columns:
        aggs.append(wavg(cadence_col, duration_col).alias("avg_cadence"))
    if power_col in splits.columns:
        aggs.append(wavg(power_col, duration_col).alias("avg_power"))
    return phased.groupBy(activity_col, F.col("_phase").alias("phase")).agg(*aggs)
