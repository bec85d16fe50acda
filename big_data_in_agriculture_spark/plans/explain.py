"""Physical-plan inspection helpers.

The reference has no optimizer — its "plans" are hand-written control
flow (SURVEY.md §4). On Spark the optimizer is Catalyst, and the
engine's scale posture lives in properties of the *physical plan*:
filters pushed into scans, partition directories pruned, small dims
broadcast, no cartesian products. These helpers turn those properties
into assertions so tests (and operators' own sanity checks) can fail
loudly when a plan regresses to a shape that would not survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, captured as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` line(s) of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` line(s) — directory-level pruning."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PartitionFilters" in line
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    got = pushed_filters(df)
    if fragment not in got:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; scans show: {got or '<none>'}"
        )


def assert_partition_pruned(df: DataFrame, fragment: str) -> None:
    got = partition_filters(df)
    if fragment not in got:
        raise AssertionError(
            f"expected partition filter containing {fragment!r}; scans show: {got or '<none>'}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"plan contains {bad} — quadratic at scale:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    if "BroadcastHashJoin" not in formatted_plan(df):
        raise AssertionError("expected a BroadcastHashJoin in the plan")
