"""Serving-layer queries (reference dashboard, F2–F5, A4, A5, A6).

The reference dashboard pushes filters into Postgres and reshapes in
pandas (``dashboards/app.py``). Here every step is a DataFrame op, so
the same filters push into the parquet scan (visible as
``PushedFilters`` in ``.explain``) and the pivot/KPI run distributed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QueryCache:
    """Serving-layer TTL result cache (reference D5, ``st.cache_data``).

    The dashboard pattern: memoize small *materialized* query results
    (region lists, filtered frames) driver-side for ``ttl`` seconds so
    widget interactions don't re-run Spark jobs. This caches RESULTS
    (rows), not DataFrames — for plan-level reuse inside the engine use
    ``df.cache()``/``persist``, which is a different tool.
    """

    def __init__(self, ttl_seconds: float = 60.0, clock=None):
        import time

        self.ttl = ttl_seconds
        self._clock = clock or time.monotonic
        self._store: dict = {}

    def get(self, key, compute):
        """Return the cached value for ``key`` or compute-and-store it.

        Expired entries (any key) are dropped on the way through, so a
        long-lived process doesn't accumulate dead results.
        """
        now = self._clock()
        expired = [k for k, (t, _) in self._store.items() if now - t >= self.ttl]
        for k in expired:
            del self._store[k]
        hit = self._store.get(key)
        if hit is not None:
            return hit[1]
        value = compute()
        self._store[key] = (now, value)
        return value

    def invalidate(self, key=None):
        if key is None:
            self._store.clear()
        else:
            self._store.pop(key, None)


def distinct_keys(df: DataFrame, col: str = "region") -> DataFrame:
    """``SELECT DISTINCT col ORDER BY col`` (F4, ``dashboards/app.py:27``)."""
    return df.select(col).distinct().orderBy(col)


def filter_daily(
    df: DataFrame,
    regions: list[str],
    start: dt.date | str,
    end: dt.date | str,
    region_col: str = "region",
    day_col: str = "day",
) -> DataFrame:
    """Membership + closed date-range filter, ordered (F2/F3/O2).

    Mirrors ``dashboards/app.py:35-41``: ``region = ANY(:regions) AND
    day BETWEEN :start AND :end ORDER BY region, day``. Both predicates
    are scan-pushable.
    """
    return (
        df.filter(F.col(region_col).isin(regions))
        .filter(F.col(day_col).between(start, end))
        .orderBy(region_col, day_col)
    )


def filter_hourly(
    df: DataFrame,
    regions: list[str],
    start_day: dt.date | str,
    end_day: dt.date | str,
    region_col: str = "region",
    ts_col: str = "ts",
) -> DataFrame:
    """Hourly variant: the end day is expanded to its last microsecond
    (``dashboards/app.py:165-166`` uses ``datetime.max.time()``)."""
    start_dt = F.to_timestamp(F.lit(f"{start_day} 00:00:00"))
    end_dt = F.to_timestamp(F.lit(f"{end_day} 23:59:59.999999"))
    return (
        df.filter(F.col(region_col).isin(regions))
        .filter(F.col(ts_col).between(start_dt, end_dt))
        .orderBy(region_col, ts_col)
    )


def pivot_metric(
    df: DataFrame,
    metric: str,
    time_col: str = "day",
    series_col: str = "region",
    series_values: list[str] | None = None,
) -> DataFrame:
    """Wide table for charting: one column per series value (A4).

    Mirrors ``dashboards/app.py:64-70`` (``pivot_table(aggfunc="mean")``).
    Passing ``series_values`` explicitly keeps the schema static and
    skips Spark's extra distinct-values job — at 100 TB that first pass
    is a full extra scan, so callers should always pass it when known.
    """
    if metric not in df.columns:
        raise ValueError(f"metric column {metric!r} not in input columns {df.columns}")
    grouped = df.groupBy(time_col)
    piv = (
        grouped.pivot(series_col, series_values)
        if series_values is not None
        else grouped.pivot(series_col)
    )
    return piv.agg(F.avg(metric)).orderBy(time_col)


def kpis(df: DataFrame, series_col: str = "region", time_col: str = "day") -> DataFrame:
    """Single-row KPI strip (A5, ``dashboards/app.py:73-78``)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(series_col).alias(f"n_{series_col}"),
        F.min(time_col).alias(f"min_{time_col}"),
        F.max(time_col).alias(f"max_{time_col}"),
    )


def verification_rollup(df: DataFrame, key_col: str = "region", ts_col: str = "ts") -> DataFrame:
    """Per-key count/min/max sanity rollup (A6, reference README runbook)."""
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(ts_col).alias(f"min_{ts_col}"),
            F.max(ts_col).alias(f"max_{ts_col}"),
        )
        .orderBy(key_col)
    )
