"""FIXTURES.md §2: hourly → daily rollup semantics (A3, C6, C9, C4)."""

from __future__ import annotations

import datetime as dt

import pytest

from big_data_in_agriculture_spark.functions.convert import with_water_balance
from big_data_in_agriculture_spark.operators.daily import daily_rollup


def _hourly(spark, rows, cols):
    return spark.createDataFrame(rows, list(cols))


def test_agg_name_flattening_and_values(spark):
    rows = [
        ("a", dt.datetime(2022, 1, 1, 0), 10.0, 1.0),
        ("a", dt.datetime(2022, 1, 1, 23), 20.0, 2.0),
        ("a", dt.datetime(2022, 1, 2, 0), 30.0, 4.0),
    ]
    out = daily_rollup(
        _hourly(spark, rows, ("region", "ts", "t2m", "tp")),
        agg_specs={"t2m": ["mean", "min", "max"], "tp": ["sum"]},
        cast=None,
    )
    assert sorted(out.columns) == ["day", "region", "t2m_max", "t2m_mean", "t2m_min", "tp_sum"]
    got = {r["day"]: r for r in out.collect()}
    d1, d2 = dt.date(2022, 1, 1), dt.date(2022, 1, 2)
    assert got[d1]["t2m_mean"] == pytest.approx(15.0)
    assert got[d1]["t2m_min"] == 10.0 and got[d1]["t2m_max"] == 20.0
    assert got[d1]["tp_sum"] == pytest.approx(3.0)
    # partial day (one row) aggregates over what exists — no gap filling.
    assert got[d2]["t2m_mean"] == 30.0 and got[d2]["tp_sum"] == 4.0


def test_spec_intersected_with_present_columns(spark):
    # P2: a spec entry for an absent column is silently skipped.
    rows = [("a", dt.datetime(2022, 1, 1), 10.0)]
    out = daily_rollup(
        _hourly(spark, rows, ("region", "ts", "t2m")),
        agg_specs={"t2m": ["mean"], "swvl1": ["mean"]},
        cast=None,
    )
    assert "swvl1_mean" not in out.columns and "t2m_mean" in out.columns


def test_no_spec_column_present_raises(spark):
    rows = [("a", dt.datetime(2022, 1, 1), 10.0)]
    with pytest.raises(ValueError, match="no agg-spec column"):
        daily_rollup(
            _hourly(spark, rows, ("region", "ts", "t2m")),
            agg_specs={"swvl1": ["mean"]},
        )


def test_multi_region_keys(spark):
    rows = [
        ("a", dt.datetime(2022, 1, 1, 5), 1.0),
        ("b", dt.datetime(2022, 1, 1, 5), 9.0),
    ]
    out = daily_rollup(
        _hourly(spark, rows, ("region", "ts", "t2m")), agg_specs={"t2m": ["mean"]}, cast=None
    ).collect()
    assert {(r["region"], r["t2m_mean"]) for r in out} == {("a", 1.0), ("b", 9.0)}


def test_water_balance_gate(spark):
    # C4: fires only when BOTH tp_sum and pev_mm_sum exist.
    df_both = spark.createDataFrame([(5.0, 2.0)], ["tp_sum", "pev_mm_sum"])
    out = with_water_balance(df_both)
    assert out.collect()[0]["water_balance"] == pytest.approx(3.0)
    df_one = spark.createDataFrame([(5.0,)], ["tp_sum"])
    assert "water_balance" not in with_water_balance(df_one).columns
