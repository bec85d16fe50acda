"""SparkSession factory.

The reference pipeline keeps every timestamp timezone-naive (Postgres
``TIMESTAMP``, pandas ``datetime64[ns]`` — reference
``docker/init/02_era5_tables.sql:5``), so the session timezone is pinned
to UTC: naive-in, naive-out, no DST drift.

Scale-oriented defaults (all standard Spark confs):
* AQE on — runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching; essential at 100 TB where static
  estimates are wrong.
* Arrow on — the few pandas-UDF islands (NetCDF decode, multimodal
  stubs) move columnar batches instead of pickled rows.
* shuffle partitions default 32 for the local harness; a real cluster
  deployment overrides to ~2-3x total cores (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB input splits: big enough to amortize task overhead, small
    # enough that a 100 TB scan still yields ~800k tasks, not 8M.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast anything under 64 MB — the star-schema dims (region,
    # nation, supplier, part) stay broadcast-able far beyond sf0.1.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime-injected bloom filters (default-on in Spark 4, pinned
    # here so a deployment override can't silently lose it): a
    # selective dim-side predicate seeds a bloom filter applied on the
    # fact side BEFORE its shuffle — at 100 TB this is the difference
    # between shuffling the whole fact table and shuffling the ~1%
    # that can actually join. Application kicks in past the 10 GB
    # fact-scan threshold, i.e. exactly the regime the local harness
    # can't reach; tests/test_plans.py lowers the threshold to audit
    # the injected filter shape.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(
    app_name: str = "big-data-in-agriculture-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` when no
    cluster master is configured externally.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
