"""Plan inspection: make scale properties assertable.

Tests use these to pin the plan shapes that matter at 100 TB —
broadcast joins stay broadcast, filters reach the parquet scan,
top-k compiles to TakeOrderedAndProject instead of a global sort,
and no operator regresses into a cartesian product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Execute the plan and return the final adaptive physical plan in
    simple mode — codegen appears as `*(n)` stage markers, and AQE's
    final-plan decisions only exist after execution. Must execute the
    DataFrame's own QueryExecution (a write would plan a separate
    command), so this collects; use on aggregated/small results."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans in the executed plan."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the formatted plan. Counts the
    node-detail headers (``(n) Exchange``) because the formatted output
    renders every node twice (tree + detail); broadcast exchanges are
    excluded — they're data distribution, not a shuffle."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def plan_contains(df: DataFrame, *fragments: str) -> bool:
    plan = formatted_plan(df)
    return all(f in plan for f in fragments)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out
