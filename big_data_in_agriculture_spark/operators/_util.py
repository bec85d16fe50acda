"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Assumed split size when the session conf is unreadable (Spark default).
_DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024


def _max_partition_bytes(df: DataFrame) -> int:
    raw = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", str(_DEFAULT_SPLIT_BYTES)
    )
    try:
        return int(str(raw).lower().rstrip("b"))
    except ValueError:
        return _DEFAULT_SPLIT_BYTES


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy maps.

    A small local parquet file arrives as ONE partition, serializing
    expensive per-row expressions (shingling, hashing, vector math) on
    one core. At real scale the scan already has thousands of splits
    and this is a no-op — we only repartition when the input is
    smaller than the cluster's slots could chew, so a 100 TB corpus
    never pays an extra shuffle here.

    The parallelism estimate comes from the OPTIMIZED PLAN'S size
    statistics (``stats().sizeInBytes`` / files.maxPartitionBytes — the
    same arithmetic FileSourceScan uses to size splits), not from
    ``df.rdd.getNumPartitions()``: touching ``.rdd`` forces RDD-lineage
    construction on every call (~700x slower per measurement, and it
    deserializes the whole plan). Catalyst keeps file-scan sizes exact
    (from the file index) and post-shuffle sizes estimated — both err
    LARGE for narrow inputs, so the no-op direction is the safe one.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable (exotic plan) — fall back to RDD
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df
    est_splits = max(1, -(-size // _max_partition_bytes(df)))
    if est_splits < target:
        return df.repartition(target)
    return df
