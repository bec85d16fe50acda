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
