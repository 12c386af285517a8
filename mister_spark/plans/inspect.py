"""Physical-plan inspection: the 'would this survive 100x' checks.

Used by tests/test_plans.py to pin the plan shapes that matter at scale:
filters reaching the parquet scan, dimension joins broadcasting, and
shuffle counts staying constant as data grows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "extended"
    )


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reach file scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (pre-AQE)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def count_unpartitioned_windows(df: DataFrame) -> int:
    """Number of Window operators in the FINAL physical plan with an
    empty PARTITION BY — the single-task global-sort shape that melts at
    scale (WindowExec warns 'Moving all data to a single partition').

    A physical Window node prints three top-level bracket groups when
    partitioned and ordered (`Window [exprs], [partSpec], [orderSpec]`)
    and two when either the partition or the order spec is empty;
    brackets never nest inside the groups (expressions use parens), so
    splitting on `], [` is exact. A 2-group node is only the dangerous
    single-task shape when its second group is an ORDER spec (contains
    ASC/DESC); a partition-only window (no order) is parallel and
    fine.
    """
    plan = physical_plan(df)
    if "== Physical Plan ==" in plan:
        plan = plan.rsplit("== Physical Plan ==", 1)[1]
    n = 0
    for line in plan.splitlines():
        body = line.split("Window [", 1)
        if len(body) != 2:
            continue
        groups = ("[" + body[1]).split("], [")
        if len(groups) == 2 and (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            n += 1
    return n
