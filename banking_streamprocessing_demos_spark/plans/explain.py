"""Physical-plan assertions (SURVEY §4): the engine's scale contract is
that Catalyst picks the plans we designed for — broadcast hash joins
for dimensions, pushed filters, pruned scans, whole-stage codegen in
the hot paths.  These helpers make that contract testable so a plan
regression (e.g. a broadcast falling back to sort-merge after a schema
change) fails CI instead of surfacing as a 100x slowdown at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def assert_broadcast_join(df: DataFrame, expect: bool = True) -> str:
    plan = formatted_plan(df)
    has = "BroadcastHashJoin" in plan
    assert has == expect, f"BroadcastHashJoin expected={expect} in plan:\n{plan[:2000]}"
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan[:2000]}"
    return plan


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [
        line.strip() for line in plan.splitlines() if line.strip().startswith("PushedFilters")
    ]


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [line.strip() for line in plan.splitlines() if line.strip().startswith("ReadSchema")]


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (counted once via the detail
    section '(<id>) Exchange' headers, not the plan-tree echo)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1 for line in plan.splitlines() if re.fullmatch(r"\(\d+\) Exchange", line.strip())
    )


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "WholeStageCodegen" in line:
            ids.add(line.split("WholeStageCodegen")[-1].strip())
    return len(ids)
