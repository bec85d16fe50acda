"""Golden-output parity against the reference's committed marts.

The reference repo commits real pipeline outputs (SURVEY.md §5):
hourly marts for 4 regions × 12 months of 2022, and one daily mart
(Jan 2022, 4 regions × 7 days — the flow's ``limit_days=7`` default).
The raw→hourly step needs an HDF5 decoder this container lacks, but
hourly→daily is fully checkable: run OUR daily_rollup over THEIR
hourly mart and compare to THEIR daily mart row-by-row.

Reference generation: pandas float32 groupby (``aggregate_daily.py:
27-44``); ours aggregates in float64 and casts once — equal within
float32 resolution (SURVEY.md §4.3 rounded-precision contract).
"""

from __future__ import annotations

import datetime as dt
import glob

import pytest

from big_data_in_agriculture_spark.operators.daily import daily_rollup

HOURLY_GLOB = "/root/reference/data/marts/hourly/*/*/month=01.parquet"
DAILY_GOLDEN = "/root/reference/data/marts/daily/year=2022/month=01.parquet"

MEASURES = [
    "t2m_mean", "t2m_min", "t2m_max", "d2m_mean", "tp_sum",
    "swvl1_mean", "swvl2_mean", "wind_speed_10m_mean",
]


@pytest.fixture(scope="module")
def golden_files():
    files = sorted(glob.glob(HOURLY_GLOB))
    if not files:
        pytest.skip("reference marts not present")
    return files


def _read_hourly(spark, files):
    # the reference wrote pandas timestamp[ns]; same nanos handling as
    # the harness events reader (__spark_entry__._t)
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(*files)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def test_daily_rollup_reproduces_reference_daily_mart(spark, golden_files):
    hourly = _read_hourly(spark, golden_files)
    # the committed daily mart covers the first 7 days of Jan 2022
    hourly = hourly.filter(
        (hourly.ts >= dt.datetime(2022, 1, 1)) & (hourly.ts < dt.datetime(2022, 1, 8))
    )
    ours = daily_rollup(hourly, cast="float").toPandas()
    golden = spark.read.parquet(DAILY_GOLDEN).select(
        "region", "day", *MEASURES
    ).toPandas()

    assert len(ours) == len(golden) == 28
    ours_idx = ours.set_index(["region", "day"]).sort_index()
    gold_idx = golden.set_index(["region", "day"]).sort_index()
    assert list(ours_idx.index) == list(gold_idx.index)
    for col in MEASURES:
        a, b = ours_idx[col], gold_idx[col]
        # float32 storage on both sides; arithmetic float64 (ours) vs
        # float32 pandas (theirs) → equal within ~1e-5 relative.
        assert ((a - b).abs() <= (b.abs() * 1e-4 + 1e-4)).all(), (
            f"{col} mismatch:\n{(a - b).abs().max()}"
        )


def test_hourly_mart_shape_matches_reference(spark, golden_files):
    hourly = _read_hourly(spark, golden_files)
    # 4 regions × 744 hours of January
    assert hourly.count() == 2976
    assert {r["region"] for r in hourly.select("region").distinct().collect()} == {
        "bashkortostan", "belarus", "krasnodar", "moscow_oblast"
    }
    # the mart schema carries the full measure set incl. derived wind
    for col in ["ts", "t2m", "d2m", "tp", "u10", "v10", "swvl1", "swvl2", "wind_speed_10m"]:
        assert col in hourly.columns


def test_serve_layer_parity_on_reference_daily_mart(spark):
    """The serving ops reproduce pandas ground truth on the committed
    daily mart — the same frame the reference's dashboard serves
    (dashboards/app.py:35-61: membership filter, pivot, KPI scalars).
    """
    import pandas as pd

    from big_data_in_agriculture_spark.operators import serve

    try:
        golden = pd.read_parquet(DAILY_GOLDEN)
    except Exception:
        pytest.skip("reference marts not present")

    sdf = spark.createDataFrame(golden)
    regions = ["bashkortostan", "krasnodar"]

    start, end = "2022-01-01", "2022-01-07"
    filtered = serve.filter_daily(sdf, regions, start, end).toPandas()
    exp = golden[golden["region"].isin(regions)]
    assert len(filtered) == len(exp) == 14

    piv = serve.pivot_metric(
        serve.filter_daily(sdf, regions, start, end),
        metric="t2m_mean", series_values=regions,
    ).toPandas().set_index("day").sort_index()
    exp_piv = exp.pivot_table(index="day", columns="region",
                              values="t2m_mean").sort_index()
    for r in regions:
        assert (abs(piv[r].astype(float).to_numpy()
                    - exp_piv[r].astype(float).to_numpy()) < 1e-5).all()

    k = serve.kpis(sdf).collect()[0]
    assert k["n_rows"] == 28 and k["n_region"] == 4
    assert str(k["min_day"])[:10] == "2022-01-01"
    assert str(k["max_day"])[:10] == "2022-01-07"
