"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy maps.

    A small local parquet file arrives as ONE partition, serializing
    expensive per-row expressions (shingling, hashing, vector math) on
    one core. At real scale the scan already has thousands of splits
    and this is a no-op — we only repartition when the input has fewer
    partitions than the cluster has slots, so a 100 TB corpus never
    pays an extra shuffle here.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
