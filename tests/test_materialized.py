"""Incremental materialized-view maintenance (operators/materialized.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.operators import materialized as mv

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 4, 1) + dt.timedelta(hours=h), 1, k, v, "{}")
            for i, (k, h, v) in enumerate(rows)
        ],
        SCHEMA,
    )


def _served(df):
    return {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["value_sum"], r["value_min"],
            r["value_max"], r["value_mean"],
        )
        for r in df.collect()
    }


def test_incremental_equals_full_rebuild_at_any_split(spark):
    """The algebraic invariant: state(history) + delta == state(all),
    for every split point — min/max/count exact, sums within float32."""
    rows = [("a", h, float((h * 7) % 13) - 3.0) for h in range(72)] + [
        ("b", h, float(h % 5)) for h in range(48)
    ]
    ev = _events(spark, rows)
    full = _served(mv.serve_rollup(mv.rollup_state(ev, ["event_type"])))
    for split in (1, 40, 100, 119):
        hist = ev.filter(F.col("event_id") < split)
        delta = ev.filter(F.col("event_id") >= split)
        state = mv.rollup_state(hist, ["event_type"])
        updated = mv.incremental_rollup_update(state, delta, ["event_type"])
        assert _served(mv.serve_rollup(updated)) == full, split


def test_merge_is_commutative(spark):
    ev = _events(spark, [("a", h, float(h)) for h in range(30)])
    s1 = mv.rollup_state(ev.filter("event_id < 10"), ["event_type"])
    s2 = mv.rollup_state(ev.filter("event_id >= 10"), ["event_type"])
    ab = _served(mv.serve_rollup(mv.merge_rollup_state(s1, s2, ["event_type"])))
    ba = _served(mv.serve_rollup(mv.merge_rollup_state(s2, s1, ["event_type"])))
    assert ab == ba


def test_new_grain_appears_and_old_grain_untouched(spark):
    ev = _events(spark, [("a", 1, 5.0), ("a", 2, 7.0)])
    late = _events(spark, [("b", 50, 1.0)]).withColumn(
        "event_id", F.col("event_id") + 100
    )
    state = mv.rollup_state(ev, ["event_type"])
    updated = mv.incremental_rollup_update(state, late, ["event_type"])
    served = _served(mv.serve_rollup(updated))
    keys = {k for k, _ in served}
    assert keys == {"a", "b"}
    (a_vals,) = [v for (k, _), v in served.items() if k == "a"]
    assert a_vals[0] == 2 and a_vals[1] == 12.0  # n, sum unchanged


def test_delta_only_cost_shape(spark):
    """The maintenance plan must not rescan history: the update's plan
    contains the delta scan and the state relation, nothing keyed to
    raw historical events."""
    ev = _events(spark, [("a", h, 1.0) for h in range(24)])
    state = mv.rollup_state(ev, ["event_type"]).localCheckpoint()
    delta = _events(spark, [("a", 30, 2.0)])
    plan = (
        mv.incremental_rollup_update(state, delta, ["event_type"])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # exactly two aggregates: delta rollup + the merge — a history
    # rescan would add a third over the raw event relation
    assert plan.count("Aggregate") == 2, plan
