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
