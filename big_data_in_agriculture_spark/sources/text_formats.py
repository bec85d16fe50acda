"""CSV / JSON-lines sources with an explicit bad-record policy.

The reference ingests only NetCDF + parquet (+ YAML config); a general
engine also lands delimited and JSONL drops — crawl exports, partner
feeds, logs. The design decision worth encoding is not the reader call
(one line) but the MALFORMED-ROW CONTRACT, which at 100 TB decides
whether one corrupt line kills a 6-hour job:

* PERMISSIVE (default): bad rows land with every data column NULL and
  the raw line preserved in ``_corrupt_record`` — quarantine-able via
  ``where _corrupt_record is not null`` and reprocessable later;
* DROPMALFORMED: bad rows vanish silently — only for sources where
  loss is acceptable and counted elsewhere;
* FAILFAST: abort on first bad row — for feeds with a schema SLA.

Schemas are REQUIRED (no inference): inference is a full extra pass at
scale, and a drifting inferred schema is how a feed silently turns
every downstream column into string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
    sep: str = ",",
) -> DataFrame:
    """Schema-enforced CSV scan with the bad-record policy above."""
    eff = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(eff)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("sep", sep)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-enforced JSON-lines scan with the bad-record policy above."""
    eff = _with_corrupt(schema) if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(eff)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) from a PERMISSIVE read.

    Clean rows drop the corrupt column; quarantined rows keep the FULL
    row — partially-parsed columns plus the raw line — for replay after
    a parser/schema fix. (Spark disallows a query that references ONLY
    the internal corrupt column of a raw scan
    [QUERY_ONLY_CORRUPT_RECORD_COLUMN], so the quarantine keeps the
    whole row rather than projecting the raw line alone; project after
    a cache/write if you want just the line.)
    """
    if CORRUPT_COL not in df.columns:
        return df, df.filter("1 = 0")
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, bad
