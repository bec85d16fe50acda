"""Bucketed tables: the join must run with no runtime Exchange."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.plans import explain
from big_data_in_agriculture_spark.sources import bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.range(10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 500).alias("custkey"),
        (F.col("id") * 1.5).alias("price"),
    )
    lines = spark.range(40_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 7).alias("qty"),
    )
    bucketed.write_bucketed(
        orders, "b_orders", "o_orderkey", buckets=8, path=str(wh / "b_orders")
    )
    bucketed.write_bucketed(
        lines, "b_lines", "l_orderkey", buckets=8, path=str(wh / "b_lines")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # co-bucketed on the join key with equal bucket counts → the
    # shuffle was paid at write time; the join plan has NO Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = bucketed.read_table(spark, "b_orders")
        l = bucketed.read_table(spark, "b_lines")
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = explain.formatted_plan(joined)
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 0, plan
        assert joined.count() == 40_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # groupBy on the bucket key reuses the write-time distribution
    o = bucketed.read_table(spark, "b_orders")
    agg = o.groupBy("o_orderkey").agg(F.sum("price").alias("s"))
    plan = explain.formatted_plan(agg)
    import re as _re

    assert len(_re.findall(r"^\(\d+\) Exchange", plan, _re.M)) == 0, plan
    assert agg.count() == 10_000
