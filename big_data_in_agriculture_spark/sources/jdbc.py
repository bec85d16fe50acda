"""JDBC scan + upsert sink (reference S11/K4, warehouse deployment path).

The reference serves its dashboard from Postgres (``dashboards/app.py:
27-61``) and loads marts with psycopg2 ``execute_values`` ON CONFLICT
(``flows/load_hourly_parquet_to_postgres.py:20-41``). The harness has
no database, so these are the deployment-path wrappers: thin, standard
Spark JDBC for reads, and a ``foreachPartition`` upsert writer that
reproduces K4's dynamic SET-list semantics. Nothing here is exercised
by the test harness — the parquet-backed twin (``sources/upsert.py``)
carries the tested MERGE semantics.

Scale notes:
* reads push ``predicates``/``partitionColumn`` down so a 1000-executor
  scan issues bounded, disjoint range queries instead of one giant one;
* the upsert batches ``execute_values``-style (page_size parity) and
  commits per partition — same at-least-once + idempotent-on-key story
  as the reference loader.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S11: parallel JDBC scan; filters/projections push into the DB."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table_or_query
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound and "
                "upper_bound (Spark cannot infer JDBC split ranges)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def upsert_statement(table: str, columns: list[str], key: list[str]) -> str:
    """K4's dynamically-built ON CONFLICT statement (one row of %s).

    Postgres-dialect parity with the reference loader
    (flows/load_hourly_parquet_to_postgres.py:29-36): same dynamic
    SET-list over non-key columns, same ``ON CONFLICT (region, ts) DO
    UPDATE SET c=EXCLUDED.c`` shape. NOTE: embedded Derby (the only DB
    in the test harness) has no ``ON CONFLICT`` — the integration tests
    exercise the read path and the transaction/batching protocol
    against Derby, while this statement's TEXT is guarded by exact
    shape tests (tests/test_jdbc.py); executing it requires a real
    Postgres. The parquet-backed MERGE twin (sources/upsert.py) carries
    the fully-executed upsert semantics in-harness.
    """
    non_key = [c for c in columns if c not in key]
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_key)
    cols = ", ".join(columns)
    ph = ", ".join(["%s"] * len(columns))
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({ph}) "
        f"ON CONFLICT ({', '.join(key)}) DO UPDATE SET {sets}"
    )


def write_jdbc_upsert(
    df: DataFrame,
    table: str,
    key: list[str],
    connect,  # Callable[[], connection] — e.g. functools.partial(psycopg2.connect, dsn)
    page_size: int = 5000,
) -> None:
    """K4: keyed upsert via foreachPartition, one transaction/partition.

    ``connect`` is a zero-arg factory returning a DB-API connection —
    created INSIDE each partition task (connections don't serialize).
    Batches of ``page_size`` rows per statement mirror the reference's
    ``execute_values(page_size=5000)``.
    """
    columns = df.columns
    stmt = upsert_statement(table, columns, key)
    df.foreachPartition(
        lambda rows: upsert_partition(rows, columns, stmt, connect, page_size)
    )


def upsert_partition(
    rows: Iterator[Row],
    columns: list[str],
    stmt: str,
    connect,
    page_size: int,
) -> None:
    """The per-partition DB-API executor behind ``write_jdbc_upsert``.

    Module-level (not a closure) so tests can drive it directly with a
    fake DB-API connection — the executor protocol is asserted without
    a server: ``page_size`` batching (executemany pages mirror the
    reference's ``execute_values(page_size=5000)``), exactly one commit
    per partition AFTER the last page (D7), rollback-then-reraise on
    any failure, and close in all paths. Row tuples are built in
    ``columns`` order, matching the INSERT column list.
    """
    conn = connect()
    try:
        cur = conn.cursor()
        batch = []
        for row in rows:
            batch.append(tuple(row[c] for c in columns))
            if len(batch) >= page_size:
                cur.executemany(stmt, batch)
                batch = []
        if batch:
            cur.executemany(stmt, batch)
        conn.commit()  # D7: one commit per partition
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
