"""Semi-structured (JSON string) column handling.

The driver's ``events.props`` column is a JSON document per row — the
usual shape of instrumented event payloads. The scale rule: parse ONCE
with a typed schema (``from_json`` → struct, columnar after parsing,
whole-stage codegen keeps it JVM-side), never one ``get_json_object``
call per field — each of those re-parses the string.

Unknown/missing fields surface as NULLs (from_json is permissive), so
schema drift in the payload degrades to nulls instead of failing the
pipeline; pair with a null-rate monitor (operators/profile.py) to see
the drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed schema of the driver's events.props payload.
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def with_parsed_props(
    events: DataFrame,
    col: str = "props",
    schema: T.StructType = PROPS_SCHEMA,
) -> DataFrame:
    """Parse the JSON payload once; surface its fields as top columns."""
    parsed = events.withColumn("_p", F.from_json(F.col(col), schema))
    for field in schema.fieldNames():
        parsed = parsed.withColumn(field, F.col(f"_p.{field}"))
    return parsed.drop("_p")
