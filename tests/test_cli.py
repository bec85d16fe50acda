"""End-to-end CLI: aggregate-daily → load → query over a real mart."""

from __future__ import annotations

import datetime as dt

from big_data_in_agriculture_spark import cli
from big_data_in_agriculture_spark.sources import marts


def test_csv_parsing():
    assert cli._csv("a, b,c") == ["a", "b", "c"]
    assert cli._csv("") == []
    assert cli._csv_int("1,2,12") == [1, 2, 12]


def test_cli_daily_load_query_chain(spark, tmp_path, capsys):
    # stage an hourly mart
    rows = [
        ("a", dt.datetime(2022, 1, 1, h), 273.15 + h, 0.001 * h) for h in range(4)
    ] + [("b", dt.datetime(2022, 1, 1, 0), 280.0, 0.0)]
    hourly = spark.createDataFrame(rows, ["region", "ts", "t2m", "tp"])
    hourly_root = str(tmp_path / "hourly")
    marts.write_hourly_mart(hourly, hourly_root)

    daily_root = str(tmp_path / "daily")
    assert cli.main(
        ["aggregate-daily", "--hourly", hourly_root, "--out", daily_root],
        spark=spark,
    ) == 0

    wh = str(tmp_path / "warehouse")
    assert cli.main(
        ["load", "--source", daily_root, "--target", wh, "--key", "region,day"],
        spark=spark,
    ) == 0

    assert cli.main(
        ["query", "--mart", wh, "--regions", "a", "--start", "2022-01-01",
         "--end", "2022-01-31"],
        spark=spark,
    ) == 0
    out = capsys.readouterr().out
    assert "'region': 'a'" in out and "t2m_mean" in out
    assert "'region': 'b'" not in out


def test_cli_curate_end_to_end(spark, tmp_path):
    from big_data_in_agriculture_spark.cli import main

    out = str(tmp_path / "curated")
    rc = main(
        [
            "curate",
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--rates", "en=0.5,de=1.0,es=1.0,fr=1.0,zh=1.0",
        ],
        spark=spark,
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    assert {"split"} <= set(curated.columns)
    splits = {r["split"] for r in curated.select("split").distinct().collect()}
    assert splits == {"train", "test"}
    assert 0 < curated.count() < 500  # gated + sampled below the input size


def test_export_shards_cli(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), 25)).alias("text"),
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "shards")
    rc = cli.main(
        [
            "export-shards", "--docs", src, "--out", out,
            "--tokens-per-shard", "100",
        ],
        spark=spark,
    )
    assert rc == 0
    assert "10 shards" in capsys.readouterr().out
    assert spark.read.parquet(f"{out}/data").count() == 40
    assert spark.read.parquet(f"{out}/manifest").count() == 10


def test_cli_search_profile_publish(spark, tmp_path, capsys):
    from big_data_in_agriculture_spark import cli

    docs = spark.createDataFrame(
        [(1, "spark engine joins data"), (2, "pandas local frames"),
         (3, "spark shuffles data fast")],
        ["doc_id", "text"],
    )
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)

    assert cli.main(
        ["search", "--docs", docs_path, "--query", "spark data", "--top-k", "2"],
        spark=spark,
    ) == 0
    out = capsys.readouterr().out
    assert "'doc_id': 1" in out or "'doc_id': 3" in out
    assert "'rank': 1" in out

    assert cli.main(["profile", "--table", docs_path], spark=spark) == 0
    out = capsys.readouterr().out
    assert "'column': 'text'" in out

    root = str(tmp_path / "versions")
    assert cli.main(
        ["publish", "--source", docs_path, "--root", root], spark=spark
    ) == 0
    assert "published version 1" in capsys.readouterr().out
    from big_data_in_agriculture_spark.sources import versioned as V

    assert V.latest_version(root) == 1
