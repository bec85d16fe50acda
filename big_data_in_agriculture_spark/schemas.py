"""Explicit schemas + the reference's column registry.

The reference drives everything off two conventions (reference
``dask_jobs/aggregate_daily.py:9-19``, ``flows/download_era5_land.py:17-31``):
a per-column aggregate spec for the daily rollup, and a short→CDS-long
variable-name map for ingest. Both are reproduced here as plain data so
operators stay presence-gated ("if the column exists, process it") the
way every reference stage is (``dask_jobs/aggregate_hourly.py:17-27``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# ERA5 mart schemas (reference data model, SURVEY.md §1)
# ---------------------------------------------------------------------------

#: Measures carried by the hourly mart, in mart column order (reference
#: parquet footer: region, ts, t2m, d2m, tp, u10, v10, swvl1, swvl2,
#: wind_speed_10m).
HOURLY_MEASURES = ["t2m", "d2m", "tp", "u10", "v10", "swvl1", "swvl2", "wind_speed_10m"]

#: Raw grid variables requested from CDS (before the derived wind speed).
RAW_VARIABLES = ["t2m", "d2m", "tp", "u10", "v10", "swvl1", "swvl2"]

#: Long-form decoded grid: one row per (region, ts, latitude, longitude).
RAW_GRID_SCHEMA = T.StructType(
    [T.StructField("region", T.StringType(), False),
     T.StructField("ts", T.TimestampType(), False),
     T.StructField("latitude", T.DoubleType(), False),
     T.StructField("longitude", T.DoubleType(), False)]
    + [T.StructField(v, T.FloatType(), True) for v in RAW_VARIABLES]
)

HOURLY_SCHEMA = T.StructType(
    [T.StructField("region", T.StringType(), False),
     T.StructField("ts", T.TimestampType(), False)]
    + [T.StructField(v, T.FloatType(), True) for v in HOURLY_MEASURES]
)

#: Daily rollup spec: column → list of aggregate function names, mirroring
#: the reference's AGG_SPECS (``dask_jobs/aggregate_daily.py:9-19``).
#: Output columns are named ``{col}_{fn}`` (``aggregate_daily.py:33-44``).
DAILY_AGG_SPECS: dict[str, list[str]] = {
    "t2m": ["mean", "min", "max"],
    "d2m": ["mean"],
    "tp": ["sum"],
    "swvl1": ["mean"],
    "swvl2": ["mean"],
    "wind_speed_10m": ["mean"],
}

DAILY_SCHEMA = T.StructType(
    [T.StructField("region", T.StringType(), False),
     T.StructField("day", T.DateType(), False)]
    + [
        T.StructField(f"{col}_{fn}", T.FloatType(), True)
        for col, fns in DAILY_AGG_SPECS.items()
        for fn in fns
    ]
)

#: Short code → CDS long variable name (reference
#: ``flows/download_era5_land.py:17-31``). Driver-side config, never shipped
#: to executors as data.
VAR_MAP: dict[str, str] = {
    "t2m": "2m_temperature",
    "d2m": "2m_dewpoint_temperature",
    "tp": "total_precipitation",
    "u10": "10m_u_component_of_wind",
    "v10": "10m_v_component_of_wind",
    "swvl1": "volumetric_soil_water_layer_1",
    "swvl2": "volumetric_soil_water_layer_2",
}

#: Sentinel bbox marking a disabled region (reference
#: ``config/regions.yaml`` + ``dask_jobs/aggregate_hourly.py:143``).
DISABLED_REGION_BBOX = [0.0, 0.0, 0.0, 0.0]


def enabled_regions(regions: dict[str, dict]) -> dict[str, dict]:
    """Filter out regions whose bbox is the all-zero disable sentinel.

    Reference semantics: ``dask_jobs/aggregate_hourly.py:143``,
    ``flows/download_era5_land.py:138-145`` (unknown names warn upstream).
    A region with no ``area`` key at all is malformed config and raises,
    matching the reference's KeyError rather than silently dropping it.
    """
    for name, cfg in regions.items():
        if "area" not in cfg:
            raise KeyError(f"region {name!r} has no 'area' bbox in config")
    return {
        name: cfg
        for name, cfg in regions.items()
        if list(cfg["area"]) != DISABLED_REGION_BBOX
    }


# ---------------------------------------------------------------------------
# Driver test-harness tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read the harness parquet tables and register them as temp views.

    Plain ``spark.read.parquet`` so scans keep predicate pushdown /
    column pruning; at cluster scale these would be catalog tables with
    the same names.
    """
    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def diff_schemas(old, new) -> dict[str, list]:
    """Field-level schema diff: added / removed / retyped columns.

    The CI gate for schema evolution: run against yesterday's mart
    footer before a write lands (pairs with the mergeSchema read path
    in sources/marts.py — additions are usually safe, silent retypes
    are how a double column becomes a string at 100 TB). Nested structs
    compare by their full simpleString, so any nested change surfaces
    as a retype of the top-level field.
    """
    old_f = {f.name: f.dataType.simpleString() for f in old.fields}
    new_f = {f.name: f.dataType.simpleString() for f in new.fields}
    return {
        "added": sorted(n for n in new_f if n not in old_f),
        "removed": sorted(n for n in old_f if n not in new_f),
        "retyped": sorted(
            (n, old_f[n], new_f[n])
            for n in old_f
            if n in new_f and old_f[n] != new_f[n]
        ),
    }
