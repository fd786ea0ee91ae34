"""Heuristic intensity-type estimation (SURVEY.md D6, the "92.7%
accuracy" fallback when Garmin omits intensityType).

The rule set (``splits_helpers/phase_mapping.py:34-105``) has a
loop-carried dependency — RECOVERY requires the *previous estimated*
label — so it cannot be a window expression.  It becomes a grouped
``applyInPandas``: one activity (≤ ~30 splits) per group, Arrow-batched,
embarrassingly parallel across activities.  This is exactly the class
of operator the guide reserves pandas UDFs for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def estimate_intensity(
    splits: DataFrame,
    activity_col: str = "activity_id",
    index_col: str = "split_index",
    hr_col: str = "avg_heart_rate",
    pace_col: str = "pace_seconds_per_km",
) -> DataFrame:
    """Per-activity estimated intensity types.

    Rules (in priority order, matching the reference):
      1. first 2 splits WARMUP (1 if n<=6), last 2 COOLDOWN (1 if n<=6)
      2. RECOVERY: pace>400 AND previous estimate in {INTERVAL, RECOVERY}
      3. INTERVAL: pace < avg_pace*0.90 OR hr > avg_hr*1.1
      4. ACTIVE otherwise; single-split activities are ACTIVE.
    """
    out_schema = f"{activity_col} long, {index_col} int, estimated_intensity string"

    def per_activity(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(index_col).reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=[activity_col, index_col, "estimated_intensity"])
        if n == 1:
            labels = ["ACTIVE"]
        else:
            hrs = pdf[hr_col].dropna()
            paces = pdf[pace_col].dropna()
            avg_hr = hrs.mean() if len(hrs) else 0.0
            avg_pace = paces.mean() if len(paces) else 0.0
            if avg_hr == 0 and avg_pace == 0:
                labels = ["ACTIVE"] * n
            else:
                warm = 2 if n > 6 else 1
                cool = 2 if n > 6 else 1
                labels = []
                for i in range(n):
                    hr = pdf[hr_col].iloc[i]
                    pace = pdf[pace_col].iloc[i]
                    position = i + 1
                    if position <= warm:
                        labels.append("WARMUP")
                    elif position > n - cool:
                        labels.append("COOLDOWN")
                    elif (
                        pace is not None
                        and not pd.isna(pace)
                        and pace > 400
                        and i > 0
                        and labels[i - 1] in ("INTERVAL", "RECOVERY")
                    ):
                        labels.append("RECOVERY")
                    elif (
                        pace is not None and not pd.isna(pace) and pace < avg_pace * 0.90
                    ) or (hr is not None and not pd.isna(hr) and hr > avg_hr * 1.1):
                        labels.append("INTERVAL")
                    else:
                        labels.append("ACTIVE")
        return pd.DataFrame(
            {
                activity_col: pdf[activity_col],
                index_col: pdf[index_col],
                "estimated_intensity": labels,
            }
        )

    return splits.groupBy(activity_col).applyInPandas(per_activity, out_schema)
