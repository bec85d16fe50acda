"""Incremental materialized-view maintenance for rollup marts.

A serving mart (the reference's daily mart writ large) normally
rebuilds by rescanning history; at 100 TB the rebuild dominates the
pipeline. The standard fix is algebraic incremental maintenance: keep
the mart in terms of DISTRIBUTIVE partial aggregates (count, sum,
min, max — each mergeable by pairwise combination), aggregate ONLY
the newly-landed delta to the same grain, and merge state with one
(key, day)-grain combine. Derived measures (avg = sum/count) are
views over the state, recomputed at read time, never stored.

Correctness caveat carried in the API: min/max are distributive for
INSERTS only — a delete/retraction cannot shrink a stored min without
history. ``incremental_rollup_update`` therefore takes appends;
retraction streams belong to the CDC operators (cdc_apply) followed
by a rebuild of the touched partitions.

Scale shape: delta aggregation touches delta-sized input; the merge
is one hash aggregate over (existing ∪ delta partials), i.e. the
shuffle carries |mart| + |delta-grain| partial rows, never raw
events. Combined with partition-pruned writes
(sources/upsert.upsert_parquet_partitioned), only touched (key, day)
partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-aggregate state columns per value column
_STATE_FNS = ("n", "sum", "min", "max")


def rollup_state(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate events to (keys, day) DISTRIBUTIVE partials.

    The stored representation of the materialized view: count / sum /
    min / max per grain — every one pairwise-mergeable, so any two
    state tables over disjoint event sets combine exactly.
    """
    return events.groupBy(
        *key_cols, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(
        F.count(F.lit(1)).alias(f"{value_col}_n"),
        F.sum(value_col).alias(f"{value_col}_sum"),
        F.min(value_col).alias(f"{value_col}_min"),
        F.max(value_col).alias(f"{value_col}_max"),
    )


def merge_rollup_state(
    state: DataFrame,
    delta_state: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Combine two partial-aggregate states: one grain-keyed aggregate.

    n/sum add; min/max take the extremum. Exact for appends at any
    split of the event history (associativity of the partials).
    """
    both = state.unionByName(delta_state)
    return both.groupBy(*key_cols, "day").agg(
        F.sum(f"{value_col}_n").alias(f"{value_col}_n"),
        F.sum(f"{value_col}_sum").alias(f"{value_col}_sum"),
        F.min(f"{value_col}_min").alias(f"{value_col}_min"),
        F.max(f"{value_col}_max").alias(f"{value_col}_max"),
    )


def incremental_rollup_update(
    state: DataFrame,
    new_events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Fold an append-only delta into the materialized state.

    Cost is delta-sized + one state-grain merge — history is never
    rescanned. The result equals ``rollup_state`` over the full
    history (tested as the algebraic invariant).
    """
    delta = rollup_state(new_events, key_cols, ts_col, value_col)
    return merge_rollup_state(state, delta, key_cols, value_col)


def serve_rollup(
    state: DataFrame, value_col: str = "value", cast: str = "float"
) -> DataFrame:
    """Read-time view over the state: derived measures materialize here.

    avg = sum/n is ALGEBRAIC (derivable from distributive partials) —
    storing it would make the state unmergeable; deriving it keeps the
    maintenance exact. Floats cast once at the end per the suite-wide
    determinism contract.
    """
    out = state.select(
        *[c for c in state.columns if not c.startswith(f"{value_col}_")],
        F.col(f"{value_col}_n").cast("long").alias("n_events"),
        F.col(f"{value_col}_sum").alias("_s"),
        F.col(f"{value_col}_min").alias("_mn"),
        F.col(f"{value_col}_max").alias("_mx"),
    )
    avg = F.col("_s") / F.col("n_events")
    cols = [
        avg.alias("value_mean"),
        F.col("_s").alias("value_sum"),
        F.col("_mn").alias("value_min"),
        F.col("_mx").alias("value_max"),
    ]
    if cast:
        cols = [c.cast(cast) for c in cols]
        # re-alias after cast (cast drops the alias)
        names = ["value_mean", "value_sum", "value_min", "value_max"]
        cols = [c.alias(n) for c, n in zip(cols, names)]
    return out.select(
        *[c for c in out.columns if c not in ("_s", "_mn", "_mx")], *cols
    ).drop("_s", "_mn", "_mx")
