"""CSV/JSONL sources: malformed-row contract (PERMISSIVE/DROP/FAILFAST)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from big_data_in_agriculture_spark.sources import text_formats as tf

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,9.5\n"
        "2,bob,not_a_number\n"   # malformed: score won't parse
        "3,carol,7.25\n"
    )
    return str(p)


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "alice", "score": 9.5}\n'
        "{this is not json}\n"
        '{"id": 3, "name": "carol", "score": 7.25}\n'
    )
    return str(p)


def test_csv_permissive_quarantines(spark, csv_file):
    df = tf.read_csv(spark, csv_file, SCHEMA)
    clean, bad = tf.split_quarantine(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    raw = bad.collect()
    assert len(raw) == 1 and "not_a_number" in raw[0][tf.CORRUPT_COL]
    # quarantine keeps the partially-parsed columns too
    assert raw[0]["id"] == 2


def test_csv_dropmalformed(spark, csv_file):
    df = tf.read_csv(spark, csv_file, SCHEMA, mode="DROPMALFORMED")
    assert sorted(r["id"] for r in df.collect()) == [1, 3]
    assert tf.CORRUPT_COL not in df.columns


def test_csv_failfast_raises(spark, csv_file):
    from py4j.protocol import Py4JJavaError

    df = tf.read_csv(spark, csv_file, SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_jsonl_permissive_quarantines(spark, jsonl_file):
    df = tf.read_jsonl(spark, jsonl_file, SCHEMA)
    clean, bad = tf.split_quarantine(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    # count() prunes all data columns away, re-triggering the
    # corrupt-only restriction — collect the full rows instead
    rows = bad.collect()
    assert len(rows) == 1 and "not json" in rows[0][tf.CORRUPT_COL]


def test_pushdown_survives_schema_enforcement(spark, csv_file):
    df = tf.read_csv(spark, csv_file, SCHEMA, mode="DROPMALFORMED")
    plan = (
        df.filter("id = 3").select("id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,3)]" in plan
