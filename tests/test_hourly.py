"""FIXTURES.md §1 degenerate cases for the grid → hourly transform.

Semantics under test (reference ``dask_jobs/aggregate_hourly.py``):
unweighted null-skipping spatial mean (A1), unit conversion AFTER the
mean (C1–C3), column-presence dynamism (S7/P2), time-axis rename (C7).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from big_data_in_agriculture_spark.operators.hourly import (
    normalize_time_axis,
    spatial_mean_hourly,
)

TS0 = dt.datetime(2022, 1, 1, 0)
TS1 = dt.datetime(2022, 1, 1, 1)


def _grid(spark, rows, cols=("region", "ts", "latitude", "longitude", "t2m", "u10", "v10")):
    return spark.createDataFrame(rows, list(cols))


def test_constant_grid_mean_is_exact(spark):
    # (b) constant-valued grid: mean == the constant, exactly.
    rows = [("r", TS0, la, lo, 280.0, 3.0, 4.0) for la in (50.0, 50.1) for lo in (30.0, 30.1)]
    out = spatial_mean_hourly(_grid(spark, rows), ["t2m", "u10", "v10"], cast=None).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t2m"] == pytest.approx(280.0 - 273.15, abs=0)
    # wind derived AFTER the mean: sqrt(3² + 4²) = 5, the 3-4-5 triangle.
    assert r["wind_speed_10m"] == pytest.approx(5.0, abs=0)


def test_all_null_variable_yields_null_mean(spark):
    # (a) every cell NULL for one variable at one timestamp → NULL mean
    # (xarray skipna mean of empty set; Spark avg over all-NULL group).
    rows = [
        ("r", TS0, 50.0, 30.0, None, 1.0, 1.0),
        ("r", TS0, 50.0, 30.1, None, 1.0, 1.0),
        ("r", TS1, 50.0, 30.0, 300.0, 1.0, 1.0),
    ]
    out = {r["ts"]: r for r in spatial_mean_hourly(_grid(spark, rows), ["t2m", "u10", "v10"], cast=None).collect()}
    assert out[TS0]["t2m"] is None
    assert out[TS1]["t2m"] == pytest.approx(300.0 - 273.15)


def test_null_skipping_mean_ignores_sea_cells(spark):
    # skipna: the NULL cell is excluded from the denominator.
    rows = [
        ("r", TS0, 50.0, 30.0, 274.15, 0.0, 0.0),
        ("r", TS0, 50.0, 30.1, 276.15, 0.0, 0.0),
        ("r", TS0, 50.1, 30.0, None, 0.0, 0.0),
    ]
    out = spatial_mean_hourly(_grid(spark, rows), ["t2m"], cast=None).collect()[0]
    assert out["t2m"] == pytest.approx((274.15 + 276.15) / 2 - 273.15)


def test_missing_component_drops_wind_speed(spark):
    # (c) no v10 column ⇒ no wind_speed_10m in output (presence gate,
    # reference aggregate_hourly.py:26-27,63).
    rows = [("r", TS0, 50.0, 30.0, 280.0, 3.0)]
    out = spatial_mean_hourly(
        _grid(spark, rows, cols=("region", "ts", "latitude", "longitude", "t2m", "u10")),
        ["t2m", "u10", "v10"],
        cast=None,
    )
    assert "wind_speed_10m" not in out.columns
    assert "v10" not in out.columns


def test_conversion_happens_after_mean(spark):
    # Mean of Kelvin then convert != mean of converted per-cell wind:
    # wind over cells (0,5) and (5,0) per-cell = 5, but from averaged
    # components sqrt(2.5² + 2.5²) ≈ 3.5355 — the reference averages first.
    rows = [
        ("r", TS0, 50.0, 30.0, 280.0, 0.0, 5.0),
        ("r", TS0, 50.0, 30.1, 280.0, 5.0, 0.0),
    ]
    out = spatial_mean_hourly(_grid(spark, rows), ["t2m", "u10", "v10"], cast=None).collect()[0]
    assert out["wind_speed_10m"] == pytest.approx(math.sqrt(2.5**2 + 2.5**2))


def test_tp_scaled_to_mm(spark):
    rows = [("r", TS0, 50.0, 30.0, 0.004, 0.0, 0.0)]
    out = spatial_mean_hourly(
        _grid(spark, rows, cols=("region", "ts", "latitude", "longitude", "tp", "u10", "v10")),
        ["tp"],
        cast=None,
    ).collect()[0]
    assert out["tp"] == pytest.approx(4.0)


def test_time_axis_rename_priority_and_error(spark):
    df_valid = spark.createDataFrame([("r", TS0)], ["region", "valid_time"])
    assert "ts" in normalize_time_axis(df_valid).columns
    df_time = spark.createDataFrame([("r", TS0)], ["region", "time"])
    assert "ts" in normalize_time_axis(df_time).columns
    df_none = spark.createDataFrame([("r",)], ["region"])
    with pytest.raises(ValueError, match="no time axis"):
        normalize_time_axis(df_none)


def test_no_requested_variable_present_raises(spark):
    rows = [("r", TS0, 50.0, 30.0, 1.0, 1.0, 1.0)]
    with pytest.raises(ValueError, match="none of the requested"):
        spatial_mean_hourly(_grid(spark, rows), ["swvl1"], cast=None)


def test_float_cast_applied_once_at_end(spark):
    rows = [("r", TS0, 50.0, 30.0, 280.0, 3.0, 4.0)]
    out = spatial_mean_hourly(_grid(spark, rows), ["t2m", "u10", "v10"], cast="float")
    types = dict(out.dtypes)
    assert types["t2m"] == "float" and types["wind_speed_10m"] == "float"
    assert types["region"] == "string"


def test_weighted_mean_weights_by_cos_lat(spark):
    import math

    import datetime as dt

    from big_data_in_agriculture_spark.operators.hourly import spatial_mean_weighted

    t0 = dt.datetime(2022, 1, 1)
    # two cells at different latitudes, same ts: weighted mean must
    # lean toward the equatorward (heavier) cell
    rows = [
        ("r", t0, 0.0, 10.0, 300.0),   # lat 0 → weight 1.0
        ("r", t0, 60.0, 10.0, 200.0),  # lat 60 → weight 0.5
    ]
    grid = spark.createDataFrame(
        rows, ["region", "ts", "latitude", "longitude", "t2m"]
    )
    out = spatial_mean_weighted(grid, ["t2m"], cast=None).collect()[0]
    expected_k = (1.0 * 300.0 + 0.5 * 200.0) / 1.5
    assert abs((out["t2m"] + 273.15) - expected_k) < 1e-9  # K→°C applied after


def test_weighted_mean_null_cells_drop_from_weights(spark):
    import datetime as dt

    from big_data_in_agriculture_spark.operators.hourly import spatial_mean_weighted

    t0 = dt.datetime(2022, 1, 1)
    rows = [
        ("r", t0, 0.0, 10.0, 300.0),
        ("r", t0, 60.0, 10.0, None),  # NULL cell: its weight must vanish
    ]
    grid = spark.createDataFrame(
        rows, ["region", "ts", "latitude", "longitude", "t2m"]
    )
    out = spatial_mean_weighted(grid, ["t2m"], cast=None).collect()[0]
    assert abs((out["t2m"] + 273.15) - 300.0) < 1e-9
