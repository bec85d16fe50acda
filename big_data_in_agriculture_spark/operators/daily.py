"""Daily mart: tumbling 1-day multi-agg with per-column specs (A3, C6, C9).

Reference semantics (``dask_jobs/aggregate_daily.py:9-44``): group the
hourly mart by ``(region, date(ts))``; each measure gets its own list
of aggregate functions; the spec is intersected with the columns that
actually exist; outputs are named ``{col}_{fn}``; the optional
``water_balance`` fires only when both inputs exist (C4).

This is a calendar-day tumbling window: expressed as
``groupBy(keys, to_date(ts))`` in batch, and the same logical op is
``F.window(ts, "1 day")`` in the streaming variant
(``streaming/events.py``). One shuffle on (keys, day); partial
aggregation makes the shuffle payload one row per group per input
partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.convert import with_water_balance
from ..schemas import DAILY_AGG_SPECS

_AGG_FNS = {
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
}


def daily_rollup(
    hourly: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    agg_specs: dict[str, list[str]] | None = None,
    cast: str | None = "float",
) -> DataFrame:
    """Roll an hourly-grain table up to daily grain.

    ``agg_specs`` defaults to the reference's spec
    (``schemas.DAILY_AGG_SPECS``); columns missing from the input are
    silently skipped (P2 presence contract,
    ``dask_jobs/aggregate_daily.py:27-28``) — so a mart built without
    ``v10`` simply lacks ``wind_speed_10m_mean`` downstream.
    """
    keys = key_cols if key_cols is not None else ["region"]
    specs = agg_specs if agg_specs is not None else DAILY_AGG_SPECS

    aggs: list[Column] = []
    for col, fns in specs.items():
        if col not in hourly.columns:
            continue
        for fn in fns:
            expr = _AGG_FNS[fn](col)
            if cast:
                expr = expr.cast(cast)
            aggs.append(expr.alias(f"{col}_{fn}"))
    if not aggs:
        raise ValueError("no agg-spec column present in input")

    out = (
        hourly.groupBy(*keys, F.to_date(F.col(ts_col)).alias("day"))
        .agg(*aggs)
    )
    return with_water_balance(out)
