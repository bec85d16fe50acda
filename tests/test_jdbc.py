"""S11 JDBC scan against a real database: embedded Derby.

The deployment target is Postgres, but Spark's JDBC source is
engine-generic — the Derby jars Spark ships for its Hive metastore
give the harness a real JDBC endpoint with zero extra installs. These
tests exercise the actual JDBC code path: DataFrame→table write,
single and range-partitioned parallel reads, and filter pushdown into
the remote query.
"""

from __future__ import annotations

import pytest

from big_data_in_agriculture_spark.sources.jdbc import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db_dir};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS v", "CAST(id % 3 AS INT) AS grp"
    )
    (
        df.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "facts")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return derby_url


def test_jdbc_roundtrip(spark, seeded):
    back = read_jdbc(spark, seeded, "facts", properties={"driver": DRIVER})
    assert back.count() == 100
    assert {f.name.lower() for f in back.schema.fields} == {"id", "v", "grp"}


def test_jdbc_partitioned_parallel_read(spark, seeded):
    back = read_jdbc(
        spark, seeded, "facts",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, properties={"driver": DRIVER},
    )
    # 4 disjoint range queries, no rows lost or duplicated
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.select("id").distinct().count() == 100


def test_jdbc_filter_pushdown(spark, seeded):
    back = read_jdbc(spark, seeded, "facts", properties={"driver": DRIVER})
    filtered = back.filter("grp = 1").select("id")
    # the predicate must reach the JDBC source, not run post-scan
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan, plan
    assert filtered.count() == 33


def test_jdbc_requires_bounds_with_partition_column(spark, seeded):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, seeded, "facts", partition_column="id")


def test_upsert_statement_shape():
    from big_data_in_agriculture_spark.sources.jdbc import upsert_statement

    stmt = upsert_statement("hourly", ["region", "ts", "t2m"], key=["region", "ts"])
    assert stmt == (
        "INSERT INTO hourly (region, ts, t2m) VALUES (%s, %s, %s) "
        "ON CONFLICT (region, ts) DO UPDATE SET t2m = EXCLUDED.t2m"
    )


def test_upsert_statement_matches_reference_loader():
    """Exact Postgres-dialect parity with the reference's mart loader
    (flows/load_hourly_parquet_to_postgres.py:29-36): key (region, ts),
    EXCLUDED.<col> update for every non-key column in column order,
    schema-qualified table name preserved. Derby cannot execute ON
    CONFLICT, so the statement TEXT is the contract under test; the
    executed-upsert semantics live in sources/upsert.py tests."""
    from big_data_in_agriculture_spark.sources.jdbc import upsert_statement

    # the reference hourly mart's serving columns (dask_jobs/aggregate_hourly.py)
    cols = ["region", "ts", "t2m_c", "td2m_c", "wind10", "tp_mm"]
    stmt = upsert_statement("marts.era5_hourly", cols, key=["region", "ts"])
    assert stmt.startswith(
        "INSERT INTO marts.era5_hourly (region, ts, t2m_c, td2m_c, wind10, tp_mm) "
        "VALUES (%s, %s, %s, %s, %s, %s)"
    )
    assert "ON CONFLICT (region, ts) DO UPDATE SET " in stmt
    set_clause = stmt.split("DO UPDATE SET ")[1]
    assert set_clause == (
        "t2m_c = EXCLUDED.t2m_c, td2m_c = EXCLUDED.td2m_c, "
        "wind10 = EXCLUDED.wind10, tp_mm = EXCLUDED.tp_mm"
    )
    # key columns never appear in the SET list (they're the conflict target)
    assert "region = EXCLUDED" not in stmt and "ts = EXCLUDED" not in stmt
