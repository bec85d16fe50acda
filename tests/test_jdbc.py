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


# ---------------------------------------------------------------------------
# Executor protocol against a FAKE DB-API connection (no server): the
# reference loader's execute_values(page_size=5000) + commit protocol
# (flows/load_hourly_parquet_to_postgres.py:20-41), asserted on
# upsert_partition — page boundaries, EXCLUDED-set application on a
# dict store, one commit after the last page, rollback-then-reraise
# and close-in-all-paths on failure.
# ---------------------------------------------------------------------------


class _FakeCursor:
    """Applies ON CONFLICT DO UPDATE semantics to a dict store and
    records every executemany page for batching assertions."""

    def __init__(self, store, columns, key, fail_on_page=None):
        self.store = store          # {key_tuple: committed row dict}
        self.pending = {}           # uncommitted writes
        self.columns = columns
        self.key = key
        self.pages = []
        self.fail_on_page = fail_on_page

    def executemany(self, stmt, batch):
        assert "ON CONFLICT" in stmt and "EXCLUDED" in stmt
        self.pages.append(len(batch))
        if self.fail_on_page is not None and len(self.pages) == self.fail_on_page:
            raise RuntimeError("injected page failure")
        for values in batch:
            row = dict(zip(self.columns, values))
            k = tuple(row[c] for c in self.key)
            merged = dict(self.pending.get(k) or self.store.get(k) or row)
            # DO UPDATE SET c = EXCLUDED.c for every non-key column
            for c in self.columns:
                if c not in self.key:
                    merged[c] = row[c]
            for c in self.key:
                merged[c] = row[c]
            self.pending[k] = merged


class _FakeConn:
    def __init__(self, store, columns, key, fail_on_page=None):
        self.store = store
        self.cur = _FakeCursor(store, columns, key, fail_on_page)
        self.commits = 0
        self.rollbacks = 0
        self.closed = False
        self.log = []

    def cursor(self):
        return self.cur

    def commit(self):
        self.store.update(self.cur.pending)
        self.cur.pending = {}
        self.commits += 1
        self.log.append("commit")

    def rollback(self):
        self.cur.pending = {}
        self.rollbacks += 1
        self.log.append("rollback")

    def close(self):
        self.closed = True
        self.log.append("close")


def _rows(pairs):
    from pyspark.sql import Row

    return iter([Row(**p) for p in pairs])


def test_upsert_partition_pages_and_excluded_semantics():
    from big_data_in_agriculture_spark.sources.jdbc import (
        upsert_partition,
        upsert_statement,
    )

    columns = ["region", "ts", "t2m"]
    key = ["region", "ts"]
    stmt = upsert_statement("hourly", columns, key)
    store = {}
    conn = _FakeConn(store, columns, key)

    rows = [
        {"region": "a", "ts": i, "t2m": float(i)} for i in range(7)
    ] + [
        # conflicting re-load of ts 0..2 with new values: must UPDATE
        {"region": "a", "ts": i, "t2m": 100.0 + i} for i in range(3)
    ]
    upsert_partition(_rows(rows), columns, stmt, lambda: conn, page_size=4)

    # 10 rows at page_size 4 -> pages of 4, 4, 2 (reference: 5000)
    assert conn.cur.pages == [4, 4, 2]
    # exactly one commit, after the final page, then close
    assert conn.commits == 1 and conn.rollbacks == 0
    assert conn.log == ["commit", "close"]
    # EXCLUDED-set semantics: later values win on the conflict key
    assert len(store) == 7
    assert store[("a", 0)]["t2m"] == 100.0
    assert store[("a", 2)]["t2m"] == 102.0
    assert store[("a", 5)]["t2m"] == 5.0


def test_upsert_partition_rollback_on_failure_leaves_store_untouched():
    import pytest as _pytest

    from big_data_in_agriculture_spark.sources.jdbc import (
        upsert_partition,
        upsert_statement,
    )

    columns = ["region", "ts", "t2m"]
    key = ["region", "ts"]
    stmt = upsert_statement("hourly", columns, key)
    store = {("a", 99): {"region": "a", "ts": 99, "t2m": 1.0}}
    conn = _FakeConn(store, columns, key, fail_on_page=2)

    rows = [{"region": "a", "ts": i, "t2m": float(i)} for i in range(7)]
    with _pytest.raises(RuntimeError, match="injected"):
        upsert_partition(_rows(rows), columns, stmt, lambda: conn, page_size=4)

    # rollback (not commit), connection closed, pre-existing rows intact,
    # nothing from the failed partition became visible
    assert conn.commits == 0 and conn.rollbacks == 1
    assert conn.log == ["rollback", "close"]
    assert store == {("a", 99): {"region": "a", "ts": 99, "t2m": 1.0}}


def test_upsert_partition_idempotent_double_load():
    """At-least-once delivery: replaying the same partition leaves the
    store bit-identical — the property the reference's ON CONFLICT
    loader relies on for safe re-runs."""
    from big_data_in_agriculture_spark.sources.jdbc import (
        upsert_partition,
        upsert_statement,
    )

    columns = ["region", "ts", "t2m"]
    key = ["region", "ts"]
    stmt = upsert_statement("hourly", columns, key)
    store = {}
    rows = [{"region": "r", "ts": i, "t2m": float(i) * 1.5} for i in range(9)]
    for _ in range(2):
        conn = _FakeConn(store, columns, key)
        upsert_partition(_rows(rows), columns, stmt, lambda c=conn: c, page_size=5)
    assert len(store) == 9
    assert store[("r", 4)]["t2m"] == 6.0


def test_write_jdbc_upsert_statement_wiring(spark):
    """The DataFrame entry point builds the statement from df.columns
    and the key, and hands every partition to upsert_partition. The
    store can't cross the executor boundary, so this asserts the
    end-to-end wiring via a file-backed sink."""
    import glob
    import json
    import os
    import tempfile

    from big_data_in_agriculture_spark.sources.jdbc import write_jdbc_upsert

    with tempfile.TemporaryDirectory() as td:

        class _FileConn:
            def __init__(self):
                self.rows = []

            def cursor(self):
                return self

            def executemany(self, stmt, batch):
                assert "ON CONFLICT (region, ts)" in stmt
                self.rows.extend(batch)

            def commit(self):
                path = os.path.join(
                    td, f"part-{os.getpid()}-{id(self)}.json"
                )
                with open(path, "w") as fh:
                    json.dump(self.rows, fh)

            def rollback(self):
                pass

            def close(self):
                pass

        df = spark.range(20).selectExpr(
            "'r' AS region", "id AS ts", "CAST(id AS DOUBLE) AS t2m"
        ).repartition(3)
        write_jdbc_upsert(df, "hourly", ["region", "ts"], _FileConn, page_size=8)
        got = []
        for f in glob.glob(os.path.join(td, "*.json")):
            got.extend(tuple(r) for r in json.load(open(f)))
        assert sorted(got) == [("r", i, float(i)) for i in range(20)]
