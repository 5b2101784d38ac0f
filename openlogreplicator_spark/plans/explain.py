"""Physical-plan inspection — the feedback loop the task demands.

The reference hand-tunes its physical execution (early dictionary probe,
zero-copy parse, LWN batch sort — SURVEY.md §4); in Spark the equivalents
are Catalyst behaviors we must VERIFY, not assume: filters reaching the
parquet scan (PushedFilters), column pruning (ReadSchema), small sides
broadcast.  Tests use these asserts so plan regressions fail CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, fragment: str):
    """Assert some filter got pushed into the scan (PushedFilters: [...])."""
    plan = plan_string(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan[:2000]}"
    assert fragment in plan, f"expected {fragment!r} pushed; plan:\n{plan[:2000]}"


def assert_broadcast_join(df: DataFrame, count: int = 1):
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= count, f"expected ≥{count} BroadcastHashJoin, got {n}:\n{plan[:2000]}"


def assert_column_pruned(df: DataFrame, absent_column: str):
    """Assert the scan schema does NOT read the given column."""
    plan = plan_string(df)
    # ReadSchema lines list the pruned struct
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert absent_column not in line, f"column {absent_column} not pruned: {line}"
