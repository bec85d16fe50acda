"""big_data_in_agriculture_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
project OsinDmitrii/Big_data_in_agriculture (an ERA5-Land climate ETL
pipeline: NetCDF → hourly mart → daily mart → warehouse → dashboard),
re-designed Spark-first:

* all relational work is declared with the DataFrame / Spark SQL API so
  Catalyst gets predicate pushdown, column pruning, partition pruning
  and join planning for free;
* Python/pandas code survives only inside explicitly-marked
  ``mapInPandas`` islands (NetCDF decode, multimodal feature stubs);
* every operator is designed for a multi-executor cluster (partition
  strategy, broadcast hints, skew notes in docstrings) even though the
  test harness runs ``local[*]``.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructTypes + the reference's column registry
    functions/    pure Column-expression helpers (unit conversions, text)
    operators/    hourly/daily marts, serving queries, relational surface,
                  dedup, similarity search, multimodal
    sources/      partitioned parquet marts, NetCDF ingest, keyed upsert
                  sink (parquet-backed MERGE; becomes MERGE INTO on
                  Delta/Iceberg, foreachPartition ON CONFLICT on JDBC)
    streaming/    Structured Streaming variants of the mart pipeline
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
    cli.py        aggregate-hourly / aggregate-daily / load / query /
                  curate / export-shards
"""

__version__ = "0.1.0"
