"""Incremental corpus ingestion: each fingerprint admitted once, ever."""

from __future__ import annotations

from pyspark.sql import types as T

from big_data_in_agriculture_spark.streaming import corpus

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _land(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def test_dedup_ingest_admits_each_fingerprint_once(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    # batch 0: doc 2 and 3 are same content modulo case/whitespace —
    # within-batch dedup keeps the min id
    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta"),
                                    (3, "GAMMA\tDELTA")])
    corpus.start_dedup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert got == {1, 2}

    # batch 1: doc 4 re-sends batch-0 content (cross-batch dup), doc 5
    # is new — only 5 admitted
    _land(spark, str(land / "b1"), [(4, "alpha beta"), (5, "epsilon zeta")])
    corpus.start_dedup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 5}
    # the sink carries the dedup index column
    assert all(len(r["fingerprint"]) == 64 for r in rows)
