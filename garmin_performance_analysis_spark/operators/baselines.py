"""Form-baseline robust regression training (SURVEY.md M5) and
baseline evaluation scoring (M6).

The reference trains per-window robust models over split rows
(``mcp/form_baseline/trainer.py:81-202``): GCT as a power law
``log v = alpha + d·log GCT`` (Huber, RANSAC fallback, monotonicity
``d<0`` enforced), VO/VR/cadence as Huber linear ``y = a + b·v``, with
range-based outlier gates first (``form_baseline/utils.py:6-29``) and a
2-month window / ≥50-sample minimum (``trainer.py:360-448``).

Spark shape: one grouped ``applyInPandas`` per (window, metric) group —
model fits are tiny (≤ a few thousand rows) and embarrassingly parallel
across windows, so Python+sklearn inside the group is the right
trade-off (the same libraries, so coefficients match the reference).
sklearn is optional: a numpy IRLS Huber stands in when absent.
RANSAC's randomness is seeded for reproducibility (the reference's
known nondeterminism, ``trainer.py:120``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Physiologic validity gates (``trainer.py:96-97,165-173,458-465``)
VALID_RANGES = {
    "gct": (150.0, 350.0),
    "vo": (2.0, 15.0),
    "vr": (2.0, 20.0),
    "cadence": (140.0, 210.0),
    "speed": (1.5, 7.0),
}


def _huber_fit(x: np.ndarray, y: np.ndarray, seed: int = 42):
    """Huber-robust linear fit: sklearn when available, else IRLS."""
    try:
        from sklearn.linear_model import HuberRegressor

        h = HuberRegressor()
        h.fit(x.reshape(-1, 1), y)
        return float(h.intercept_), float(h.coef_[0])
    except ImportError:
        # IRLS with Huber weights (delta=1.35), deterministic
        a, b = 0.0, 0.0
        w = np.ones_like(y)
        for _ in range(50):
            sw = np.sqrt(w)
            A = np.stack([sw, sw * x], axis=1)
            coef, *_ = np.linalg.lstsq(A, sw * y, rcond=None)
            a_new, b_new = float(coef[0]), float(coef[1])
            resid = y - (a_new + b_new * x)
            scale = np.median(np.abs(resid)) / 0.6745 or 1.0
            r = np.abs(resid / scale)
            w = np.where(r <= 1.35, 1.0, 1.35 / r)
            if abs(a_new - a) < 1e-10 and abs(b_new - b) < 1e-10:
                a, b = a_new, b_new
                break
            a, b = a_new, b_new
        return a, b


def train_gct_power_baselines(
    splits: DataFrame,
    group_cols: list[str],
    gct_col: str = "ground_contact_time",
    speed_col: str = "speed_mps",
    min_samples: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Per-group GCT power-law baseline ``log v = alpha + d log GCT``
    with Huber → seeded-RANSAC fallback and ``d < 0`` monotonicity."""
    gd = dict(splits.dtypes)
    key_schema = ", ".join(f"{c} {gd[c]}" for c in group_cols)
    out_schema = (
        f"{key_schema}, alpha double, d double, rmse double, n_samples bigint,"
        " speed_min double, speed_max double, model_type string"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        lo, hi = VALID_RANGES["gct"]
        slo, shi = VALID_RANGES["speed"]
        clean = pdf[
            pdf[gct_col].between(lo, hi) & pdf[speed_col].between(slo, shi)
        ].dropna(subset=[gct_col, speed_col])
        cols = list(keys) + [
            "alpha", "d", "rmse", "n_samples", "speed_min", "speed_max", "model_type"
        ]
        if len(clean) < min_samples:
            return pd.DataFrame(columns=cols)
        x = np.log(clean[gct_col].to_numpy())
        y = np.log(clean[speed_col].to_numpy())
        alpha, d = _huber_fit(x, y, seed)
        model_type = "huber_power"
        if d >= 0:
            try:
                from sklearn.linear_model import RANSACRegressor

                r = RANSACRegressor(
                    min_samples=max(3, int(0.8 * len(clean))), random_state=seed
                )
                r.fit(x.reshape(-1, 1), y)
                alpha = float(r.estimator_.intercept_)
                d = float(r.estimator_.coef_[0])
                model_type = "ransac_power"
            except ImportError:
                pass
            if d >= 0:
                return pd.DataFrame(columns=cols)  # non-monotonic: no model
        rmse = float(np.sqrt(np.mean((y - (alpha + d * x)) ** 2)))
        return pd.DataFrame(
            [
                dict(
                    keys,
                    alpha=alpha,
                    d=d,
                    rmse=rmse,
                    n_samples=len(clean),
                    speed_min=float(clean[speed_col].min()),
                    speed_max=float(clean[speed_col].max()),
                    model_type=model_type,
                )
            ]
        )

    return splits.groupBy(*group_cols).applyInPandas(fit, out_schema)


def train_linear_baselines(
    splits: DataFrame,
    group_cols: list[str],
    metric: str,
    value_col: str,
    speed_col: str = "speed_mps",
    min_samples: int = 50,
) -> DataFrame:
    """Per-group Huber linear baseline ``value = a + b·speed`` for
    vo/vr/cadence with the reference's validity gates."""
    gd = dict(splits.dtypes)
    key_schema = ", ".join(f"{c} {gd[c]}" for c in group_cols)
    out_schema = (
        f"{key_schema}, metric string, coef_a double, coef_b double,"
        " rmse double, n_samples bigint"
    )
    lo, hi = VALID_RANGES[metric]
    slo, shi = VALID_RANGES["speed"]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        clean = pdf[
            pdf[value_col].between(lo, hi) & pdf[speed_col].between(slo, shi)
        ].dropna(subset=[value_col, speed_col])
        cols = list(keys) + ["metric", "coef_a", "coef_b", "rmse", "n_samples"]
        if len(clean) < min_samples:
            return pd.DataFrame(columns=cols)
        x = clean[speed_col].to_numpy(dtype=float)
        y = clean[value_col].to_numpy(dtype=float)
        a, b = _huber_fit(x, y)
        rmse = float(np.sqrt(np.mean((y - (a + b * x)) ** 2)))
        return pd.DataFrame(
            [dict(keys, metric=metric, coef_a=a, coef_b=b, rmse=rmse, n_samples=len(clean))]
        )

    return splits.groupBy(*group_cols).applyInPandas(fit, out_schema)


def evaluate_against_baseline(
    splits: DataFrame,
    baselines: DataFrame,
    group_cols: list[str],
    value_col: str,
    speed_col: str = "speed_mps",
    improvement_weight: float = 0.3,
    degradation_weight: float = 1.0,
    lower_is_better: bool = True,
) -> DataFrame:
    """M6 baseline scoring: expected-vs-actual with asymmetric penalties
    (improvement ×0.3, degradation ×1.0; direction flips for cadence)
    (``mcp/form_baseline/scorer.py:23-269``).  Pure column arithmetic
    once the (tiny) coefficient table is broadcast-joined."""
    from pyspark.sql import functions as F

    joined = splits.join(F.broadcast(baselines), group_cols)
    expected = F.col("coef_a") + F.col("coef_b") * F.col(speed_col)
    delta = F.col(value_col) - expected
    improving = delta < 0 if lower_is_better else delta > 0
    penalty = F.when(
        improving, F.abs(delta) * improvement_weight
    ).otherwise(F.abs(delta) * degradation_weight)
    return (
        joined.withColumn("expected", expected)
        .withColumn("delta", delta)
        .withColumn("penalty", penalty)
    )
