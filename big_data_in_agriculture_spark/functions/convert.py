"""Unit conversions and derived measures (reference C1–C4).

Reference semantics (``dask_jobs/aggregate_hourly.py:15-29``): every
conversion is *presence-gated* — applied only if the column exists —
and happens AFTER the spatial mean (``aggregate_hourly.py:71→91``),
so the wind speed is derived from the spatially averaged components,
not averaged per-cell.

All of these are pure Column expressions: they compile into
whole-stage-codegen'd JVM arithmetic, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Kelvin → Celsius offset (reference ``aggregate_hourly.py:17-19``).
KELVIN_OFFSET = 273.15


def convert_units(df: DataFrame) -> DataFrame:
    """Apply the reference's unit conversions, presence-gated.

    * ``t2m``, ``d2m``: Kelvin → °C        (C1, ``aggregate_hourly.py:17-19``)
    * ``tp``: metres of water → mm          (C2, ``aggregate_hourly.py:22-23``)
    * ``wind_speed_10m = sqrt(u10² + v10²)`` iff both components exist
                                            (C3, ``aggregate_hourly.py:26-27``)
    """
    cols = set(df.columns)
    if "t2m" in cols:
        df = df.withColumn("t2m", F.col("t2m") - F.lit(KELVIN_OFFSET))
    if "d2m" in cols:
        df = df.withColumn("d2m", F.col("d2m") - F.lit(KELVIN_OFFSET))
    if "tp" in cols:
        df = df.withColumn("tp", F.col("tp") * F.lit(1000.0))
    if "u10" in cols and "v10" in cols:
        # sqrt(u² + v²) — spelled out (not Math.hypot) so the result
        # matches the reference's numpy formula within float32 rounding
        # and SQL oracles bit-for-bit when computed in float64.
        df = df.withColumn(
            "wind_speed_10m",
            F.sqrt(F.col("u10") * F.col("u10") + F.col("v10") * F.col("v10")),
        )
    return df


def with_water_balance(df: DataFrame) -> DataFrame:
    """``water_balance = tp_sum − pev_mm_sum`` iff BOTH columns exist.

    Latent in the reference (C4, ``dask_jobs/aggregate_daily.py:47-48``):
    ``pev`` is not in the default variable set, so this usually no-ops —
    the gate itself is the contract.
    """
    if {"tp_sum", "pev_mm_sum"} <= set(df.columns):
        df = df.withColumn("water_balance", F.col("tp_sum") - F.col("pev_mm_sum"))
    return df
