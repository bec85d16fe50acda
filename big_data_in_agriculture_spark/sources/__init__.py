"""Sources & sinks: partitioned parquet marts, keyed upsert, NetCDF ingest."""
