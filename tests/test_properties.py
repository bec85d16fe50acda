"""Property-based invariants (hypothesis) for core operators.

Few examples, deterministic seeds, deadline off — Spark jobs are slow
per example, so each property gets a handful of generated cases that
still explore shapes hand-written fixtures miss (empty groups, single
rows, duplicate keys, extreme floats).
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_in_agriculture_spark.operators.daily import daily_rollup
from big_data_in_agriculture_spark.operators.relational import sessionize
from big_data_in_agriculture_spark.sources.upsert import merge_frames

SLOW = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 72), finite),
        min_size=1,
        max_size=40,
    )
)
def test_daily_rollup_invariants(spark, rows):
    data = [(r, dt.datetime(2022, 1, 1) + dt.timedelta(hours=h), v) for r, h, v in rows]
    df = spark.createDataFrame(data, ["region", "ts", "t2m"])
    out = daily_rollup(df, agg_specs={"t2m": ["mean", "min", "max"]}, cast=None).collect()
    # one output row per (region, day) present in the input
    assert len(out) == len({(r, t.date()) for r, t, _ in data})
    for row in out:
        group = [v for r, t, v in data if r == row["region"] and t.date() == row["day"]]
        assert row["t2m_min"] == min(group)
        assert row["t2m_max"] == max(group)
        assert math.isclose(row["t2m_mean"], sum(group) / len(group), rel_tol=1e-9)
        assert row["t2m_min"] <= row["t2m_mean"] <= row["t2m_max"]


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    gap=st.sampled_from([1, 5, 30]),
)
def test_sessionize_invariants(spark, events, gap):
    data = [
        (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts"])
    out = sessionize(df, gap_minutes=gap).collect()
    # every event lands in exactly one session
    assert sum(r["n_events"] for r in out) == len(data)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sessions in by_user.items():
        sessions.sort(key=lambda r: r["session_start"])
        for s in sessions:
            assert s["session_start"] <= s["session_end"]
        # consecutive sessions of one user are separated by > gap
        for a, b in zip(sessions, sessions[1:]):
            assert (b["session_start"] - a["session_end"]).total_seconds() > gap * 60


@SLOW
@given(
    # existing is key-unique — merge_frames' documented precondition
    # (every table the upsert module writes is PK-unique)
    existing=st.lists(
        st.tuples(st.integers(0, 5), finite), max_size=15, unique_by=lambda t: t[0]
    ),
    incoming=st.lists(st.tuples(st.integers(0, 5), finite), max_size=15),
)
def test_merge_frames_invariants(spark, existing, incoming):
    ex = spark.createDataFrame(existing, ["k", "v"]) if existing else spark.createDataFrame([], "k int, v float")
    inc = spark.createDataFrame(incoming, ["k", "v"]) if incoming else spark.createDataFrame([], "k int, v float")
    merged = merge_frames(ex, inc, ["k"]).collect()
    keys = [r["k"] for r in merged]
    # key-unique result covering exactly the union of key sets
    assert sorted(keys) == sorted(set(keys))
    assert set(keys) == {k for k, _ in existing} | {k for k, _ in incoming}
    # incoming wins: every incoming key's value comes from incoming
    inc_keys = {k for k, _ in incoming}
    inc_vals = {k: {v for kk, v in incoming if kk == k} for k in inc_keys}
    for r in merged:
        if r["k"] in inc_keys:
            assert any(
                r["v"] == v or (math.isnan(r["v"]) and math.isnan(v))
                for v in inc_vals[r["k"]]
            )
