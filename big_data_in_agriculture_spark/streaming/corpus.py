"""Incremental corpus ingestion: streaming arrivals, cross-batch dedup.

A training-data corpus grows by landed batches (crawl dumps, upload
drops); the pipeline must admit each document ONCE, ever — including
documents that re-arrive in later batches or on replay after failure.

``foreachBatch`` formulation:

1. within-batch: survivor-policy exact dedup on the normalized content
   fingerprint (min doc_id — deterministic under replay);
2. cross-batch: left-anti join against the fingerprints already in the
   sink — first batch to land a fingerprint wins, forever;
3. append the admitted rows (with their fingerprint column, which IS
   the dedup index).

Idempotence: a replayed batch re-runs steps 1-2 and admits nothing new
— the at-least-once delivery of foreachBatch composes to exactly-once
admission on the fingerprint key (same argument as the keyed-upsert
loader, sources/upsert.py).

Scale: the anti join is fingerprint ⋈ fingerprint — both sides hash
uniformly by construction. At 100 TB the sink side reads ONE column
(fingerprint) thanks to parquet column pruning; partitioning the sink
by a fingerprint prefix would turn it into a pruned point-lookup per
batch partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import text as TX


def admit_batch(batch: DataFrame, sink_path: str) -> None:
    """Dedup one landed batch against itself and the sink, then append."""
    spark = batch.sparkSession
    fp = batch.withColumn("fingerprint", TX.fingerprint("text"))
    in_batch = (
        fp.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    try:
        seen = spark.read.parquet(sink_path).select("fingerprint")
        fresh = in_batch.join(seen, "fingerprint", "left_anti")
    except Exception:  # first batch: no sink yet
        fresh = in_batch
    fresh.write.mode("append").parquet(sink_path)


def start_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream the landing dir; admit each fingerprint once ever."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: admit_batch(b, sink_path)
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
