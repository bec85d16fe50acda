"""Bucketed tables: pre-shuffled storage for exchange-free joins.

The 100 TB lever the marts module doesn't cover: when two big fact
tables join on the same key repeatedly (orders ⋈ lineitem every day),
pay the shuffle ONCE at write time. ``bucketBy(n, key)`` hash-
partitions rows into a fixed bucket count inside each partition
directory; two tables bucketed the same way join with ZERO runtime
exchange — the sort-merge join reads co-located buckets directly
(plan-asserted in tests: no Exchange above either scan).

Bucketing requires the table catalog (``saveAsTable``), not plain
``parquet(path)`` — bucket metadata lives in the catalog entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``sort=True`` additionally sorts within buckets by the key, so the
    downstream sort-merge join skips its sort too — scan → merge,
    nothing else. ``path`` makes it an external table (the warehouse
    dir is a static conf, so tests point tables at temp dirs this way).
    """
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
