"""Versioned dataset snapshots: immutable publishes, pointer semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.sources import versioned as V


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_publish_read_latest_and_pinned(spark, tmp_path):
    root = str(tmp_path / "ds")
    v1 = V.write_version(_df(spark, 10, "one"), root)
    v2 = V.write_version(_df(spark, 20, "two"), root)
    assert (v1, v2) == (1, 2)
    assert V.latest_version(root) == 2
    assert V.read_version(spark, root).count() == 20
    # a pinned read reproduces the old corpus exactly
    old = V.read_version(spark, root, version=1)
    assert old.count() == 10
    assert old.select("tag").distinct().first()[0] == "one"


def test_rollback_is_pointer_move(spark, tmp_path):
    root = str(tmp_path / "ds")
    V.write_version(_df(spark, 10, "one"), root)
    V.write_version(_df(spark, 20, "two"), root)
    V.rollback(root, 1)
    assert V.latest_version(root) == 1
    assert V.read_version(spark, root).count() == 10
    # the rolled-back-from snapshot still exists (no data rewrite)
    assert V.list_versions(root) == [1, 2]
    # next publish does not reuse version 2
    v3 = V.write_version(_df(spark, 30, "three"), root)
    assert v3 == 3


def test_expire_keeps_newest_and_pointed(spark, tmp_path):
    root = str(tmp_path / "ds")
    for i in range(5):
        V.write_version(_df(spark, i + 1, f"t{i}"), root)
    V.rollback(root, 1)  # pointer at the OLDEST
    would = V.expire_versions(root, keep=2, dry_run=True)
    assert would == [2, 3]  # 1 is pointed, 4/5 are newest-2
    gone = V.expire_versions(root, keep=2)
    assert gone == [2, 3]
    assert V.list_versions(root) == [1, 4, 5]
    assert V.read_version(spark, root).count() == 1  # pointer intact


def test_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "ds")
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, root)
    V.write_version(_df(spark, 1, "x"), root)
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, root, version=9)
    with pytest.raises(FileNotFoundError):
        V.rollback(root, 9)
