"""Relational surface sanity: sessionize gap logic, set ops, rollup.

The full relational surface is oracle-checked against DuckDB by
``scripts/selfcheck.py`` / the driver at sf0.01; these tests pin the
hand-computable semantics on tiny hand-built inputs.
"""

from __future__ import annotations

import datetime as dt

from big_data_in_agriculture_spark.operators import relational


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def test_sessionize_gap_splits(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0),
        (2, 7, t0 + dt.timedelta(minutes=10)),            # same session
        (3, 7, t0 + dt.timedelta(minutes=10, seconds=1)), # same session
        (4, 7, t0 + dt.timedelta(minutes=41, seconds=2)), # > 30min gap → new
        (5, 8, t0),                                       # other user
    ]
    out = {(r["user_id"], r["session_seq"]): r for r in
           relational.sessionize(_ev(spark, rows), gap_minutes=30).collect()}
    assert out[(7, 1)]["n_events"] == 3
    assert out[(7, 2)]["n_events"] == 1
    assert out[(8, 1)]["n_events"] == 1
    assert out[(7, 1)]["session_start"] == t0
    assert out[(7, 1)]["session_end"] == t0 + dt.timedelta(minutes=10, seconds=1)


def test_sessionize_exact_boundary_gap_stays(spark):
    # gap EXACTLY equal to the threshold does not open a new session
    # (strictly-greater comparison).
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 7, t0), (2, 7, t0 + dt.timedelta(minutes=30))]
    out = relational.sessionize(_ev(spark, rows), gap_minutes=30).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_top_n_orders_tie_break(spark):
    rows = [(1, 10, 5.0), (2, 10, 5.0), (3, 11, 9.0)]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_custkey", "o_totalprice"])
    out = [r["o_orderkey"] for r in relational.top_n_orders(df, n=2).collect()]
    assert out == [3, 1]  # desc price, then asc orderkey among ties


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (4,)], ["k"])
    assert {r["k"] for r in relational.set_intersect(a, b).collect()} == {2}
    assert {r["k"] for r in relational.set_except(a, b).collect()} == {1, 3}
    assert {r["k"] for r in relational.set_union(a, b).collect()} == {1, 2, 3, 4}
