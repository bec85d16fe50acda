"""Keyed upsert sink: idempotence + last-writer-wins (K4/K5)."""

from __future__ import annotations

import datetime as dt

import pytest

from big_data_in_agriculture_spark.sources import upsert

T0 = dt.datetime(2022, 1, 1, 0)
T1 = dt.datetime(2022, 1, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["region", "ts", "t2m"])


def test_double_load_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "mart")
    df = _df(spark, [("a", T0, 1.0), ("a", T1, 2.0)])
    n1 = upsert.upsert_parquet(spark, df, path, upsert.HOURLY_KEY)
    n2 = upsert.upsert_parquet(spark, df, path, upsert.HOURLY_KEY)
    assert n1 == n2 == 2
    got = {(r["region"], r["ts"]): r["t2m"] for r in spark.read.parquet(path).collect()}
    assert got == {("a", T0): 1.0, ("a", T1): 2.0}


def test_conflicting_reload_wins(spark, tmp_path):
    path = str(tmp_path / "mart")
    upsert.upsert_parquet(spark, _df(spark, [("a", T0, 1.0), ("b", T0, 5.0)]), path, upsert.HOURLY_KEY)
    upsert.upsert_parquet(spark, _df(spark, [("a", T0, 9.0)]), path, upsert.HOURLY_KEY)
    got = {(r["region"], r["ts"]): r["t2m"] for r in spark.read.parquet(path).collect()}
    # a@T0 updated, b@T0 untouched
    assert got == {("a", T0): 9.0, ("b", T0): 5.0}


def test_incoming_duplicate_keys_collapse(spark, tmp_path):
    path = str(tmp_path / "mart")
    df = _df(spark, [("a", T0, 1.0), ("a", T0, 7.0)])
    n = upsert.upsert_parquet(spark, df, path, upsert.HOURLY_KEY)
    assert n == 1
    assert spark.read.parquet(path).count() == 1


def test_missing_key_column_raises(spark, tmp_path):
    df = spark.createDataFrame([("a", 1.0)], ["region", "t2m"])
    with pytest.raises(ValueError, match="missing key columns"):
        upsert.upsert_parquet(spark, df, str(tmp_path / "m"), upsert.HOURLY_KEY)


def test_schema_evolution_new_column(spark, tmp_path):
    # dynamic SET-list analogue (K4 builds SET from arriving columns):
    # a later load may carry a new measure; old rows get NULL for it.
    path = str(tmp_path / "mart")
    upsert.upsert_parquet(spark, _df(spark, [("a", T0, 1.0)]), path, upsert.HOURLY_KEY)
    wide = spark.createDataFrame([("b", T0, 2.0, 3.5)], ["region", "ts", "t2m", "tp"])
    upsert.upsert_parquet(spark, wide, path, upsert.HOURLY_KEY)
    back = spark.read.parquet(path)
    got = {r["region"]: (r["t2m"], r["tp"]) for r in back.collect()}
    assert got["a"] == (1.0, None) and got["b"] == (2.0, 3.5)


# ---------------------------------------------------------------------------
# Partition-sliced upsert
# ---------------------------------------------------------------------------

def test_partitioned_upsert_only_touches_affected_partitions(spark, tmp_path):
    import glob
    import os

    from big_data_in_agriculture_spark.sources.upsert import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "mart")
    base = spark.createDataFrame(
        [("r1", 1, 10.0), ("r1", 2, 20.0), ("r2", 1, 30.0), ("r3", 1, 40.0)],
        ["region", "seq", "v"],
    )
    upsert_parquet_partitioned(spark, base, path, ["region", "seq"], ["region"])

    untouched = sorted(glob.glob(f"{path}/region=r3/*.parquet"))
    mtimes = [os.path.getmtime(f) for f in untouched]

    # update one key in r1, insert a new key in r2; r3 must not move
    batch = spark.createDataFrame(
        [("r1", 2, 99.0), ("r2", 7, 70.0)], ["region", "seq", "v"]
    )
    n = upsert_parquet_partitioned(spark, batch, path, ["region", "seq"], ["region"])
    assert n == 4  # merged slice: r1 (2 rows) + r2 (2 rows)

    got = {(r["region"], r["seq"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("r1", 1): 10.0, ("r1", 2): 99.0, ("r2", 1): 30.0,
                   ("r2", 7): 70.0, ("r3", 1): 40.0}
    after = sorted(glob.glob(f"{path}/region=r3/*.parquet"))
    assert after == untouched
    assert [os.path.getmtime(f) for f in after] == mtimes


def test_partitioned_upsert_idempotent_reload(spark, tmp_path):
    from big_data_in_agriculture_spark.sources.upsert import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "mart")
    batch = spark.createDataFrame(
        [("r1", 1, 1.0), ("r2", 1, 2.0)], ["region", "seq", "v"]
    )
    for _ in range(2):  # replay the same load — converges, no dup rows
        upsert_parquet_partitioned(spark, batch, path, ["region", "seq"], ["region"])
    df = spark.read.parquet(path)
    assert df.count() == 2
