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
    """Count true shuffle exchanges (SURVEY.md §7.2: every P2+ operator
    documents its shuffle count — this verifies it). Counts only the
    numbered node list of the formatted plan (each node appears once there;
    the tree rendering above it would double-count), and excludes
    BroadcastExchange — broadcasts move the small side only, which is
    exactly the point of using them."""
    plan = physical_plan(df)
    n = 0
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("(") and ") Exchange" in line and "Broadcast" not in line:
            n += 1
    return n


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees ('codegen' explain mode — the
    formatted mode hides them under an unresolved AdaptiveSparkPlan)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    import re

    # Zero case: "Found 0 WholeStageCodegen subtrees."
    # Nonzero: one "== Subtree i / N ... ==" header per compiled subtree.
    m = re.search(r"Found (\d+) WholeStageCodegen", text)
    if m:
        return int(m.group(1))
    return len(re.findall(r"== Subtree \d+ / \d+", text))
