"""Serving queries (FIXTURES.md §3: F2–F4, A4, A5, A6, O2)."""

from __future__ import annotations

import datetime as dt

import pytest

from big_data_in_agriculture_spark.operators import serve

D1, D2, D3 = dt.date(2022, 1, 1), dt.date(2022, 1, 2), dt.date(2022, 1, 3)


@pytest.fixture()
def daily(spark):
    rows = [
        ("a", D1, 1.0), ("a", D2, 2.0), ("a", D3, 3.0),
        ("b", D1, 10.0), ("b", D2, 20.0),
        ("c", D1, 100.0),
    ]
    return spark.createDataFrame(rows, ["region", "day", "t2m_mean"])


def test_query_cache_ttl_and_invalidate():
    clock = {"t": 0.0}
    calls = []
    cache = serve.QueryCache(ttl_seconds=60, clock=lambda: clock["t"])

    def compute():
        calls.append(1)
        return len(calls)

    assert cache.get("k", compute) == 1
    assert cache.get("k", compute) == 1  # hit, no recompute
    clock["t"] = 61.0
    assert cache.get("k", compute) == 2  # expired
    cache.invalidate("k")
    assert cache.get("k", compute) == 3
    assert len(calls) == 3


def test_distinct_keys_sorted(daily):
    assert [r["region"] for r in serve.distinct_keys(daily).collect()] == ["a", "b", "c"]


def test_filter_daily_membership_range_order(daily):
    out = serve.filter_daily(daily, ["a", "b"], D1, D2).collect()
    assert [(r["region"], r["day"]) for r in out] == [
        ("a", D1), ("a", D2), ("b", D1), ("b", D2)
    ]


def test_filter_hourly_end_day_expansion(spark):
    rows = [
        ("a", dt.datetime(2022, 1, 2, 23, 59, 59), 1.0),
        ("a", dt.datetime(2022, 1, 3, 0, 0, 0), 2.0),
    ]
    df = spark.createDataFrame(rows, ["region", "ts", "t2m"])
    out = serve.filter_hourly(df, ["a"], "2022-01-01", "2022-01-02").collect()
    # 23:59:59 on the end day is in; midnight of the NEXT day is out.
    assert len(out) == 1 and out[0]["t2m"] == 1.0


def test_pivot_static_values_and_missing_series(daily):
    out = serve.pivot_metric(
        daily, "t2m_mean", series_values=["a", "b", "zz"]
    )
    assert out.columns == ["day", "a", "b", "zz"]
    rows = {r["day"]: r for r in out.collect()}
    assert rows[D1]["a"] == 1.0 and rows[D1]["b"] == 10.0
    assert rows[D1]["zz"] is None  # absent series → all-NULL column
    assert rows[D3]["b"] is None   # absent day×series cell → NULL


def test_pivot_missing_metric_raises(daily):
    with pytest.raises(ValueError, match="metric column"):
        serve.pivot_metric(daily, "nope")


def test_kpis_single_row(daily):
    r = serve.kpis(daily).collect()[0]
    assert r["n_rows"] == 6 and r["n_region"] == 3
    assert r["min_day"] == D1 and r["max_day"] == D3


def test_verification_rollup(spark):
    rows = [
        ("a", dt.datetime(2022, 1, 1, 0)), ("a", dt.datetime(2022, 1, 1, 5)),
        ("b", dt.datetime(2022, 1, 2, 0)),
    ]
    df = spark.createDataFrame(rows, ["region", "ts"])
    out = serve.verification_rollup(df).collect()
    assert [(r["region"], r["n_rows"]) for r in out] == [("a", 2), ("b", 1)]
    assert out[0]["min_ts"] == dt.datetime(2022, 1, 1, 0)
    assert out[0]["max_ts"] == dt.datetime(2022, 1, 1, 5)
