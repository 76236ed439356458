"""Physical-plan introspection — assert the plan, not just the answer.

SURVEY.md §4: the reference relies on Catalyst for pushdown, pruning, join
strategy, and top-k fusion. These helpers let tests assert each of those
actually happened (`test_plans.py`), and are the tool for the
".explain and iterate until it's the plan you'd want" loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    return "\n".join(
        line for line in physical_plan(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) — verify column pruning reached the scan."""
    return "\n".join(
        line for line in physical_plan(df).splitlines() if "ReadSchema" in line
    )


def num_shuffles(df: DataFrame) -> int:
    """Count exchange operators in the physical plan (SURVEY.md §7.2: every
    P2+ operator documents its shuffle count — this verifies it)."""
    plan = physical_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    plan = physical_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "WholeStageCodegen" in line:
            ids.add(line.split("WholeStageCodegen")[-1].strip())
    return len(ids)
