"""Physical-plan inspection helpers.

The engine's scale story rests on Catalyst doing the right thing —
filters reaching the parquet scan, projections shrinking ReadSchema,
small sides broadcasting, whole-stage codegen spanning the hot path.
These helpers turn ``explain`` output into assertions so tests (and
reviews) verify the plan, not just the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the parquet ReadSchema (what the scan actually
    reads after pruning)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for field in inner.split(","):
                name = field.split(":", 1)[0].strip()
                if name:
                    cols.append(name)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True when at least one WholeStageCodegen subtree exists.  Uses
    the codegen explain mode because AQE's formatted output hides
    codegen annotations before execution."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return "WholeStageCodegen" in plan


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better, given
    equal semantics).  Counts the detail-section operator headers so the
    tree summary doesn't double-count; broadcast exchanges are excluded
    (they move only the small side)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
