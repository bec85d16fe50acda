"""Config model: region enablement sentinel (F1) + registry shape."""

from __future__ import annotations

import pytest

from big_data_in_agriculture_spark import schemas


def test_enabled_regions_filters_sentinel():
    cfg = {
        "a": {"area": [56.6, 53.1, 51.6, 59.9]},
        "off": {"area": [0.0, 0.0, 0.0, 0.0]},
    }
    assert list(schemas.enabled_regions(cfg)) == ["a"]


def test_enabled_regions_missing_area_raises():
    with pytest.raises(KeyError, match="no 'area'"):
        schemas.enabled_regions({"bad": {}})


def test_daily_agg_spec_names_match_reference_marts():
    cols = [f"{c}_{f}" for c, fns in schemas.DAILY_AGG_SPECS.items() for f in fns]
    # the reference daily mart's measure columns, exactly
    assert cols == [
        "t2m_mean", "t2m_min", "t2m_max", "d2m_mean", "tp_sum",
        "swvl1_mean", "swvl2_mean", "wind_speed_10m_mean",
    ]


def test_var_map_covers_raw_variables():
    assert set(schemas.VAR_MAP) == set(schemas.RAW_VARIABLES)


def test_diff_schemas_reports_all_change_kinds():
    from pyspark.sql import types as T

    from big_data_in_agriculture_spark.schemas import diff_schemas

    old = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("gone", T.StringType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),   # silent retype!
            T.StructField("fresh", T.DateType()),
        ]
    )
    d = diff_schemas(old, new)
    assert d["added"] == ["fresh"]
    assert d["removed"] == ["gone"]
    assert d["retyped"] == [("b", "double", "string")]


def test_diff_schemas_identical_is_empty():
    from big_data_in_agriculture_spark.schemas import HOURLY_SCHEMA, diff_schemas

    d = diff_schemas(HOURLY_SCHEMA, HOURLY_SCHEMA)
    assert d == {"added": [], "removed": [], "retyped": []}
