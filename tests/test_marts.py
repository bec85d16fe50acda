"""Partitioned mart I/O: round-trip, dynamic overwrite, pruning (K1/K2/S9)."""

from __future__ import annotations

import datetime as dt

import pytest

from big_data_in_agriculture_spark.plans import explain
from big_data_in_agriculture_spark.sources import marts


@pytest.fixture()
def hourly(spark):
    rows = [
        ("a", dt.datetime(2022, 1, 1, h), 1.0 * h) for h in range(3)
    ] + [
        ("a", dt.datetime(2022, 2, 1, h), 2.0 * h) for h in range(3)
    ] + [
        ("b", dt.datetime(2022, 1, 1, h), 3.0 * h) for h in range(3)
    ]
    return spark.createDataFrame(rows, ["region", "ts", "t2m"])


def test_hourly_roundtrip_and_partition_columns(spark, hourly, tmp_path):
    root = str(tmp_path / "hourly")
    marts.write_hourly_mart(hourly, root)
    back = marts.read_mart(spark, root)
    assert back.count() == 9
    # discovery returns the partition columns
    assert {"region", "year", "month"} <= set(back.columns)
    assert {r["month"] for r in back.select("month").distinct().collect()} == {1, 2}


def test_read_mart_prunes_partitions(spark, hourly, tmp_path):
    root = str(tmp_path / "hourly")
    marts.write_hourly_mart(hourly, root)
    one = marts.read_mart(spark, root, regions=["a"], month=1)
    assert one.count() == 3
    # the region/month predicates must be directory-pruning partition
    # filters, not post-scan row filters
    explain.assert_partition_pruned(one, "region")
    explain.assert_partition_pruned(one, "month")


def test_dynamic_overwrite_keeps_sibling_partitions(spark, hourly, tmp_path):
    root = str(tmp_path / "hourly")
    marts.write_hourly_mart(hourly, root)
    # re-run ONLY region a / month 1 with changed values
    redo = spark.createDataFrame(
        [("a", dt.datetime(2022, 1, 1, 0), 99.0)], ["region", "ts", "t2m"]
    )
    marts.write_hourly_mart(redo, root, mode="overwrite")
    back = marts.read_mart(spark, root)
    # siblings (a/Feb, b/Jan) survive; a/Jan is replaced by the re-run
    assert back.filter("region='b'").count() == 3
    assert back.filter("region='a' and month=2").count() == 3
    a_jan = back.filter("region='a' and month=1").collect()
    assert len(a_jan) == 1 and a_jan[0]["t2m"] == 99.0


def test_refresh_daily_mart_incremental(spark, hourly, tmp_path):
    # continuous-aggregate refresh: only the refreshed month's daily
    # partition changes; siblings stay byte-identical
    hroot, droot = str(tmp_path / "h"), str(tmp_path / "d")
    marts.write_hourly_mart(hourly, hroot)
    specs = {"t2m": ["mean"]}
    marts.refresh_daily_mart(spark, hroot, droot, 2022, 1, agg_specs=specs)
    marts.refresh_daily_mart(spark, hroot, droot, 2022, 2, agg_specs=specs)
    before = {(r["region"], r["day"]): r["t2m_mean"]
              for r in marts.read_mart(spark, droot).collect()}
    assert len(before) == 3  # (a,Jan1) (b,Jan1) (a,Feb1)

    # hourly re-run changes month 1 only → refresh month 1
    redo = spark.createDataFrame(
        [("a", dt.datetime(2022, 1, 1, 0), 42.0)], ["region", "ts", "t2m"]
    )
    marts.write_hourly_mart(redo, hroot)
    marts.refresh_daily_mart(spark, hroot, droot, 2022, 1, agg_specs=specs)
    after = {(r["region"], r["day"]): r["t2m_mean"]
             for r in marts.read_mart(spark, droot).collect()}
    assert after[("a", dt.date(2022, 1, 1))] == 42.0
    # February slice untouched by the January refresh
    assert after[("a", dt.date(2022, 2, 1))] == before[("a", dt.date(2022, 2, 1))]
    # b's hourly partition was NOT overwritten (dynamic overwrite only
    # touched region=a/month=1), so b's daily row re-derives unchanged
    assert after[("b", dt.date(2022, 1, 1))] == before[("b", dt.date(2022, 1, 1))]


def test_daily_mart_layout(spark, tmp_path):
    rows = [
        ("a", dt.date(2022, 1, 1), 1.0),
        ("b", dt.date(2022, 1, 1), 2.0),
        ("a", dt.date(2022, 2, 1), 3.0),
    ]
    df = spark.createDataFrame(rows, ["region", "day", "t2m_mean"])
    root = str(tmp_path / "daily")
    marts.write_daily_mart(df, root)
    back = marts.read_mart(spark, root, month=1)
    got = {(r["region"], r["t2m_mean"]) for r in back.collect()}
    assert got == {("a", 1.0), ("b", 2.0)}  # regions together, month pruned


def test_compact_mart_collapses_small_files(spark, tmp_path):
    import glob

    from big_data_in_agriculture_spark.sources.marts import compact_mart

    root = str(tmp_path / "frag")
    # simulate streaming appends: 8 tiny files per partition directory
    for i in range(8):
        (
            spark.range(i * 10, i * 10 + 10)
            .selectExpr("id", "CAST(id % 2 AS INT) AS region", "id * 1.0 AS v")
            .repartition(1)
            .write.mode("append").partitionBy("region").parquet(root)
        )
    before = glob.glob(f"{root}/region=*/*.parquet")
    assert len(before) >= 16
    total_before = spark.read.parquet(root).count()

    compact_mart(spark, root, ["region"], sort_cols=["id"])
    after = glob.glob(f"{root}/region=*/*.parquet")
    assert len(after) == 2  # one file per directory
    df = spark.read.parquet(root)
    assert df.count() == total_before == 80
    # data intact, not just counts
    assert df.agg({"id": "sum"}).collect()[0][0] == sum(range(80))


def test_mart_read_merges_evolved_schema(spark, tmp_path):
    root = str(tmp_path / "evolve")
    spark.range(5).selectExpr("id", "CAST(1 AS INT) AS region", "id * 1.0 AS t2m") \
        .write.mode("append").partitionBy("region").parquet(root)
    # later writer adds a column (schema evolution, K-side)
    spark.range(5).selectExpr(
        "id + 10 AS id", "CAST(2 AS INT) AS region", "id * 1.0 AS t2m",
        "id * 2.0 AS wind_speed_10m",
    ).write.mode("append").partitionBy("region").parquet(root)

    merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert "wind_speed_10m" in merged.columns
    old = merged.filter("region = 1")
    assert old.filter(old.wind_speed_10m.isNull()).count() == 5


def test_expire_partitions_retention(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    root = str(tmp_path / "daily")
    rows = []
    for y, m in [(2021, 11), (2021, 12), (2022, 1), (2022, 2)]:
        rows.append(("r1", dt.date(y, m, 5), 1.0))
    df = spark.createDataFrame(rows, ["region", "day", "t2m_mean"]).withColumn(
        "day", F.col("day").cast("date")
    )
    marts.write_daily_mart(df, root)

    # dry run reports but deletes nothing
    would = marts.expire_partitions(spark, root, keep_from=(2022, 1), dry_run=True)
    assert len(would) == 2 and all("2021" in p for p in would)
    assert spark.read.parquet(root).count() == 4

    gone = marts.expire_partitions(spark, root, keep_from=(2022, 1))
    assert sorted(gone) == sorted(would)
    back = spark.read.parquet(root)
    assert back.count() == 2
    assert {(r["year"], r["month"]) for r in back.select("year", "month").collect()} == {
        (2022, 1), (2022, 2)
    }


class TestZorderLayout:
    def test_zorder_skips_on_both_dimensions(self, spark, tmp_path):
        """Z-order clustering must give file skipping on BOTH columns;
        a single-column sort gives ~zero skipping on the other."""
        import random

        from big_data_in_agriculture_spark.sources import layout

        rng = random.Random(7)
        rows = [
            (rng.randrange(10_000), rng.randrange(10_000)) for _ in range(20_000)
        ]
        df = spark.createDataFrame(rows, ["a", "b"]).repartition(8)

        zpath = str(tmp_path / "z")
        layout.zorder_write(df, zpath, ["a", "b"], n_files=16)

        # single-column sorted baseline: perfect on a, useless on b
        spath = str(tmp_path / "s")
        df.repartitionByRange(16, "a").sortWithinPartitions("a") \
            .write.mode("overwrite").parquet(spath)

        probes = [123.0, 4567.0, 8910.0]
        z_a = sum(layout.file_skipping_ratio(zpath, "a", p) for p in probes) / 3
        z_b = sum(layout.file_skipping_ratio(zpath, "b", p) for p in probes) / 3
        s_b = sum(layout.file_skipping_ratio(spath, "b", p) for p in probes) / 3

        # both dimensions skip well under z-order…
        assert z_a >= 0.5, z_a
        assert z_b >= 0.5, z_b
        # …while the 1-D sort leaves the second dimension unskippable
        assert s_b <= 0.2, s_b

    def test_zorder_write_preserves_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from big_data_in_agriculture_spark.sources import layout

        df = spark.range(1000).select(
            F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
        )
        path = str(tmp_path / "z2")
        layout.zorder_write(df, path, ["a", "b"], n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == 1000
        assert back.agg(F.sum("a")).first()[0] == 999 * 1000 // 2


class TestBloomFilterWrites:
    def test_bloom_metadata_present_and_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from big_data_in_agriculture_spark.sources import layout

        df = spark.range(50_000).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97).alias("bucket"),
        )
        path = str(tmp_path / "bloomed")
        layout.write_with_bloom(df, path, ["user_id"], ndv=50_000)
        assert layout.has_bloom_filter(spark, path, "user_id")
        assert not layout.has_bloom_filter(spark, path, "bucket")
        back = spark.read.parquet(path)
        assert back.count() == 50_000
        assert back.filter("user_id = 12345").count() == 1


def test_small_file_report_flags_fragmented_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_in_agriculture_spark.sources import marts

    root = str(tmp_path / "mart")
    # fragmented partition: 8 tiny files; healthy partition: 1 file
    spark.range(100).withColumn("p", F.lit("frag")).repartition(8) \
        .write.partitionBy("p").parquet(root)
    spark.range(100).withColumn("p", F.lit("ok")).coalesce(1) \
        .write.mode("append").partitionBy("p").parquet(root)

    rep = {r["partition"]: r for r in
           marts.small_file_report(spark, root).collect()}
    assert rep["p=frag"]["n_files"] == 8
    assert rep["p=frag"]["n_small"] == 8
    assert rep["p=ok"]["n_files"] == 1
    # worst partition sorts first
    first = marts.small_file_report(spark, root).first()
    assert first["partition"] == "p=frag"


def test_empty_mart_roundtrips_via_schema_sidecar(spark, tmp_path):
    """Writing an EMPTY mart under partitionBy produces zero parquet
    files; the _schema.json sidecar keeps the mart readable (and lets
    any reader skip footer sampling)."""
    import datetime as dt

    from big_data_in_agriculture_spark.sources.marts import (
        read_mart,
        write_hourly_mart,
    )

    df = spark.createDataFrame(
        [("r1", dt.datetime(2024, 1, 1), 1.0)], ["region", "ts", "t2m"]
    ).filter("1 = 0")
    root = str(tmp_path / "hourly")
    write_hourly_mart(df, root)
    back = read_mart(spark, root)
    assert back.count() == 0
    assert set(back.columns) == {"region", "ts", "t2m", "year", "month"}


def test_stale_sidecar_loses_to_data(spark, hourly, tmp_path):
    """Crash-between-data-and-sidecar window: a sidecar whose schema no
    longer matches the parquet footers is ignored — the data's own
    schema wins (trust_sidecar=False default)."""
    import json

    root = str(tmp_path / "hourly")
    marts.write_hourly_mart(hourly, root)
    # plant a stale sidecar: an old schema missing the t2m column
    stale = {
        "type": "struct",
        "fields": [
            {"name": "region", "type": "string", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
            {"name": "year", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "month", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    (tmp_path / "hourly" / "_schema.json").write_text(json.dumps(stale))
    # the Hadoop local FS keeps a checksum sidecar; planting the stale
    # file out-of-band invalidates it, so drop it like a crash would not
    crc = tmp_path / "hourly" / "._schema.json.crc"
    if crc.exists():
        crc.unlink()
    back = marts.read_mart(spark, root)
    assert "t2m" in back.columns          # data wins over the stale sidecar
    assert back.count() == 9
    # trust_sidecar=True takes the sidecar verbatim (the 100 TB fast path)
    trusted = marts.read_mart(spark, root, trust_sidecar=True)
    assert "t2m" not in trusted.columns
