"""Physical-plan inspection helpers.

The 100 TB contract for every operator is checked here as plan properties,
not vibes: filters reach the Parquet scan (PushedFilters), projections
prune the read schema (ReadSchema), dimension joins broadcast
(BroadcastHashJoin), hot paths stay inside WholeStageCodegen, and global
sort+limit compiles to TakeOrderedAndProject.  tests/test_plans.py asserts
these for the headline queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some Parquet scan pushes a filter mentioning ``fragment``."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line and "[]" not in line
        for line in plan.splitlines()
    )


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every Parquet ReadSchema in the plan (pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)[-1].rstrip(">")
            out.append([c.split(":")[0].strip() for c in inside.split(",") if c])
    return out


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan; forces execution."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the *final* plan (AQE shows
    them as ``*(n)`` stage markers)."""
    plan = executed_plan(df)
    stages = {
        line.split("*(", 1)[1].split(")", 1)[0]
        for line in plan.splitlines()
        if "*(" in line
    }
    return len(stages)
