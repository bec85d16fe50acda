"""CDC collapse and SCD2 validity-interval semantics on hand-built logs."""

from __future__ import annotations

import datetime as dt

from big_data_in_agriculture_spark.operators.cdc import cdc_apply, scd2_history


def _log(spark, rows):
    return spark.createDataFrame(rows, ["key", "ts", "seq", "op", "val"])


T = lambda m: dt.datetime(2024, 1, 1, 0, m)


def test_cdc_last_write_wins_and_delete_removes(spark):
    log = _log(spark, [
        (1, T(0), 1, "U", "a"), (1, T(5), 2, "U", "b"),   # final: b
        (2, T(0), 3, "U", "x"), (2, T(9), 4, "D", None),  # deleted
        (3, T(2), 5, "D", None), (3, T(7), 6, "U", "z"),  # resurrected
    ])
    out = {r["key"]: r["val"]
           for r in cdc_apply(log, "key", "ts", "seq", "op").collect()}
    assert out == {1: "b", 3: "z"}


def test_cdc_tie_broken_by_seq(spark):
    log = _log(spark, [(1, T(0), 1, "U", "first"), (1, T(0), 2, "U", "second")])
    out = cdc_apply(log, "key", "ts", "seq", "op").collect()
    assert len(out) == 1 and out[0]["val"] == "second"


def test_scd2_intervals_abut_and_flag_current(spark):
    log = _log(spark, [
        (1, T(0), 1, "U", "v1"), (1, T(5), 2, "U", "v2"), (1, T(9), 3, "U", "v3"),
    ])
    rows = sorted(
        scd2_history(log, "key", "ts", "seq").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["val"] for r in rows] == ["v1", "v2", "v3"]
    # intervals abut exactly: each valid_to equals the next valid_from
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]
    assert [r["is_current"] for r in rows] == [False, False, True]
    # point-in-time lookup at T(6) lands in v2's interval
    hits = [r for r in rows
            if r["valid_from"] <= T(6)
            and (r["valid_to"] is None or T(6) < r["valid_to"])]
    assert len(hits) == 1 and hits[0]["val"] == "v2"


def test_snapshot_diff_classifies_each_change(spark):
    from big_data_in_agriculture_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        ["k", "price", "status"],
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),      # unchanged -> excluded
         (2, 25.0, "B"),      # changed value
         (3, 30.0, "C"),      # NULL -> value is a change
         (5, 50.0, "E")],     # added; key 4 removed
        ["k", "price", "status"],
    )
    out = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"], ["price", "status"]).collect()}
    assert out == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_ab_test_summary_known_means(spark):
    import math

    from pyspark.sql import functions as F

    from big_data_in_agriculture_spark.operators.analytics import ab_test_summary

    rows = [(i, 10.0 + (i % 3)) if i % 2 == 0 else (i, 20.0 + (i % 5))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    r = ab_test_summary(df, F.col("user_id") % 2 == 0, "value").collect()[0]
    assert r["n_a"] == 100 and r["n_b"] == 100
    assert math.isclose(r["mean_a"], 11.0, abs_tol=0.2)
    assert math.isclose(r["mean_b"], 22.0, abs_tol=0.2)
    assert r["t_stat"] < -10  # hugely separated arms
