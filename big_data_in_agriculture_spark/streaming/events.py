"""Streaming daily rollup over the events stream (SURVEY.md §2.9).

The reference pipeline is batch re-run by month, idempotent via
skip-if-exists + keyed upsert (S2/K4). Its natural streaming twin —
and the extension the driver's ``events`` table exists for — is:

    readStream (file source)
      → withWatermark("ts", …)           # bounded state, late-data cutoff
      → groupBy(window("ts","1 day"), key) multi-agg (A3's tumbling day)
      → foreachBatch(upsert)             # K4's idempotent keyed load

Watermarking makes state finite: a day's window is finalized (and its
state dropped) once the watermark passes its end; rows later than the
allowed lateness are dropped instead of reopening closed days —
exactly the trade the batch pipeline makes by re-running a month and
overwriting (late data beyond the re-run horizon never lands).

Scale notes:
* the aggregation state is one row per (key, open day-window) —
  bounded by watermark, independent of stream length;
* ``foreachBatch`` + keyed upsert gives effectively-exactly-once
  delivery on top of at-least-once batch replays (same idempotence
  argument as the reference's ON CONFLICT loader);
* ``availableNow`` triggers turn the same query into an incremental
  batch backfill — one code path for both modes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: Driver events schema (TESTDATA.md) — file streams must declare it.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: Same table as stored by the driver: ``ts`` is parquet
#: TIMESTAMP(NANOS), which Spark can only read as a long. Streams over
#: those files declare the long and convert (integer div — see
#: ``__spark_entry__._t`` for why ``/`` would corrupt the epoch).
EVENTS_SCHEMA_NANOS = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.LongType()) for f in EVENTS_SCHEMA]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    nanos_ts: bool = True,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing directory of event files."""
    reader = spark.readStream.schema(
        schema if schema is not None else (EVENTS_SCHEMA_NANOS if nanos_ts else EVENTS_SCHEMA)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if schema is None and nanos_ts:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def daily_event_rollup(
    events: DataFrame,
    watermark: str = "1 day",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling 1-day windowed aggregate with a late-data watermark.

    The streaming twin of ``operators.daily.daily_rollup``: same grain
    (key, day), same {col}_{fn} naming convention.
    """
    w = F.window(F.col(ts_col), "1 day")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("value").alias("value_mean"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col(key_col),
            F.to_date(F.col("win.start")).alias("day"),
            "n_events",
            "value_mean",
            "value_min",
            "value_max",
            "value_sum",
        )
    )


def start_daily_rollup_to_parquet(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint: str,
    watermark: str = "1 day",
    path_glob: str | None = None,
    available_now: bool = True,
    upsert_fn: Callable[[SparkSession, DataFrame, str, list[str]], int] | None = None,
) -> StreamingQuery:
    """Wire the full stream: files → windowed rollup → keyed upsert sink.

    ``foreachBatch`` receives each micro-batch as a plain DataFrame and
    applies the K4 upsert on (event_type, day) — replays after a
    checkpoint recovery rewrite the same keys, so the sink converges.
    """
    from ..sources.upsert import upsert_parquet

    do_upsert = upsert_fn or upsert_parquet
    rollup = daily_event_rollup(
        read_events_stream(spark, source_path, path_glob=path_glob),
        watermark=watermark,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        do_upsert(spark, batch_df, sink_path, ["event_type", "day"])

    writer = (
        rollup.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
