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


def _top_level_split(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def global_window_specs(df: DataFrame) -> list[str]:
    """Window specs whose partition clause is EMPTY — the 'move every
    row to one partition' anti-pattern (Spark logs ``No Partition
    Defined for Window operation`` for these).  A windowspecdefinition
    renders its partition columns as plain expressions and its sort
    keys with ASC/DESC, so a spec where every pre-frame argument
    carries a sort direction has no partition clause at all.

    Bounded single-partition windows (rank-the-top-k frames) must use
    the non-foldable constant key from
    ``operators.windows.bounded_partition_key`` — same execution, but
    explicit — so this check stays a zero-tolerance gate."""
    plan = formatted_plan(df)
    bad: list[str] = []
    marker = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(marker, i)
        if i == -1:
            break
        j, depth = i + len(marker), 1
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        spec = plan[i + len(marker) : j - 1]
        args = [
            a
            for a in _top_level_split(spec)
            if not a.startswith("specifiedwindowframe(")
        ]
        # vacuously-true on an empty arg list: a window with neither
        # partition nor order keys is ALSO a single-partition window
        if all(" ASC" in a or " DESC" in a for a in args):
            bad.append(spec)
        i = j
    return bad


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better, given
    equal semantics).  Counts the detail-section operator headers so the
    tree summary doesn't double-count; broadcast exchanges are excluded
    (they move only the small side)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
