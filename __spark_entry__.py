"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query on sf0.001 (smoke check).
`queries()` — one callable per implemented operator (SURVEY.md §2 +
the LLM-pipeline surface); each takes (spark, sf_dir) → DataFrame.
`oracle_sql()` — DuckDB-runnable ANSI SQL twin per query.

Float determinism contract (shared by every query/oracle pair):
* all arithmetic in float64;
* order-dependent aggregates (sum/avg of doubles) cast to float32
  ONCE at the end on BOTH sides — partial-sum reordering between
  engines lives in the last ulp of the double and disappears below
  float32 resolution;
* per-row arithmetic (no aggregation) stays double: identical IEEE
  ops on identical inputs are bit-identical across engines;
* ranking on floats happens AFTER the rounding/cast, with a unique
  id tie-break, so top-N sets are engine-deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.operators import daily as daily_ops
from big_data_in_agriculture_spark.operators import hourly as hourly_ops
from big_data_in_agriculture_spark.operators import graph
from big_data_in_agriculture_spark.operators import llm, relational, serve, similarity
from big_data_in_agriculture_spark.operators import web as web_ops
from big_data_in_agriculture_spark.functions import web as WEB

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _date_as_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Cast DateType output columns to midnight timestamps.

    Spark DateType → pandas `datetime.date` objects while DuckDB DATE →
    pandas Timestamps; value-hash compares then disagree on identical
    days. Emitting timestamps on BOTH sides (oracles use
    CAST(... AS TIMESTAMP)) makes the rendered values engine-identical.
    """
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC so to_date/date_trunc on TimestampType match DuckDB's
    # naive-timestamp calendar math regardless of the host session TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet has stored ts as TIMESTAMP(NANOS) (which Spark's
        # parquet reader rejects) in some driver generations and as plain
        # TIMESTAMP(MICROS) in others. Handle both: read nanos as long if
        # present, integer-divide to micros (`div`, not `/` — these epochs
        # exceed 2^53 so double math would round); a native timestamp just
        # gets normalized to session-TZ TimestampType (UTC-pinned above).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Drift guard (same lesson as events.ts): if a driver generation
    # stores date-grain columns as parquet DATE instead of TIMESTAMP,
    # normalize to timestamp — Spark DateType → pandas `date` objects
    # while DuckDB DATE → pandas Timestamps, so raw dates hash-mismatch
    # on identical days. No-op on the current micros layout.
    from pyspark.sql.types import DateType

    for field in df.schema.fields:
        if isinstance(field.dataType, DateType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# ERA5-pipeline semantics exercised on the driver's `events` table.
# The reference's climate pipeline (grid → hourly mart → daily mart →
# serving) maps onto events as: region := event_type, ts := ts,
# measures := deterministic functions of `value`.
# ---------------------------------------------------------------------------

def _pseudo_grid(spark: SparkSession, sf_dir: str, hourly_ts: bool = True) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.date_trunc("hour", F.col("ts")) if hourly_ts else F.col("ts")
    return ev.select(
        F.col("event_type").alias("region"),
        ts.alias("ts"),
        (F.col("value") + F.lit(273.15)).alias("t2m"),
        (F.col("value") / F.lit(1000.0)).alias("tp"),
        (F.col("value") / F.lit(10.0)).alias("u10"),
        (F.col("value") / F.lit(7.0)).alias("v10"),
    )


def q_era5_hourly_spatial_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 + C1 + C2 + C3 + C7: unweighted mean per (region, hour), then
    # unit conversion AFTER the mean, float32 storage cast at the end.
    # The time axis arrives as `valid_time` to exercise the C7 rename.
    grid = _pseudo_grid(spark, sf_dir, hourly_ts=True).withColumnRenamed(
        "ts", "valid_time"
    )
    return hourly_ops.spatial_mean_hourly(
        grid, variables=["t2m", "tp", "u10", "v10"], cast="float"
    )


_ERA5_HOURLY_SQL = """
SELECT event_type AS region,
       date_trunc('hour', ts) AS ts,
       CAST(avg(value + 273.15) - 273.15 AS FLOAT) AS t2m,
       CAST(avg(value / 1000.0) * 1000.0 AS FLOAT) AS tp,
       CAST(avg(value / 10.0) AS FLOAT) AS u10,
       CAST(avg(value / 7.0) AS FLOAT) AS v10,
       CAST(sqrt(avg(value / 10.0) * avg(value / 10.0)
               + avg(value / 7.0) * avg(value / 7.0)) AS FLOAT) AS wind_speed_10m
FROM events
GROUP BY 1, 2
"""


def q_era5_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # area-weighted variant of A1: cos-lat cell weights. The oracle
    # replicates sum(w*x)/sum(w) with the same conversions-after-mean
    # order; cos/radians are both IEEE-correctly-rounded here and the
    # final float32 cast absorbs any last-ulp libm spread.
    ev = _t(spark, sf_dir, "events")
    grid = ev.select(
        F.col("event_type").alias("region"),
        F.date_trunc("hour", F.col("ts")).alias("ts"),
        ((F.col("user_id") % 120) / 2.0 - 30.0).alias("latitude"),
        (F.col("value") + F.lit(273.15)).alias("t2m"),
        (F.col("value") / F.lit(1000.0)).alias("tp"),
        (F.col("value") / F.lit(10.0)).alias("u10"),
        (F.col("value") / F.lit(7.0)).alias("v10"),
    )
    return hourly_ops.spatial_mean_weighted(
        grid, variables=["t2m", "tp", "u10", "v10"], cast="float"
    )



_ERA5_WEIGHTED_SQL = """
WITH grid AS (
    SELECT event_type AS region,
           date_trunc('hour', ts) AS ts,
           cos(radians((user_id % 120) / 2.0 - 30.0)) AS w,
           value + 273.15 AS t2m,
           value / 1000.0 AS tp,
           value / 10.0 AS u10,
           value / 7.0 AS v10
    FROM events
),
agg AS (
    SELECT region, ts,
           sum(w * t2m) / sum(w) AS t2m,
           sum(w * tp) / sum(w) AS tp,
           sum(w * u10) / sum(w) AS u10,
           sum(w * v10) / sum(w) AS v10
    FROM grid GROUP BY 1, 2
)
SELECT region, ts,
       CAST(t2m - 273.15 AS FLOAT) AS t2m,
       CAST(tp * 1000.0 AS FLOAT) AS tp,
       CAST(u10 AS FLOAT) AS u10,
       CAST(v10 AS FLOAT) AS v10,
       CAST(sqrt(u10 * u10 + v10 * v10) AS FLOAT) AS wind_speed_10m
FROM agg
"""


def q_era5_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3 + C6 + C9: per-column agg specs, {col}_{fn} naming, presence-gated.
    hourly = _pseudo_grid(spark, sf_dir, hourly_ts=False).select(
        "region", "ts", "t2m", "tp"
    )
    out = daily_ops.daily_rollup(
        hourly,
        agg_specs={"t2m": ["mean", "min", "max"], "tp": ["sum"], "swvl1": ["mean"]},
        cast="float",
    )
    return _date_as_ts(out, "day")


_ERA5_DAILY_SQL = """
SELECT event_type AS region,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       CAST(avg(value + 273.15) AS FLOAT) AS t2m_mean,
       CAST(min(value + 273.15) AS FLOAT) AS t2m_min,
       CAST(max(value + 273.15) AS FLOAT) AS t2m_max,
       CAST(sum(value / 1000.0) AS FLOAT) AS tp_sum
FROM events
GROUP BY 1, 2
"""


def q_era5_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's full mart chain: grid → hourly (double) → daily (float32).
    grid = _pseudo_grid(spark, sf_dir, hourly_ts=True).select("region", "ts", "t2m", "tp")
    hourly = hourly_ops.spatial_mean_hourly(grid, variables=["t2m", "tp"], cast=None)
    out = daily_ops.daily_rollup(
        hourly, agg_specs={"t2m": ["mean", "min", "max"], "tp": ["sum"]}, cast="float"
    )
    return _date_as_ts(out, "day")


_ERA5_CHAIN_SQL = """
WITH hourly AS (
    SELECT event_type AS region,
           date_trunc('hour', ts) AS ts,
           avg(value + 273.15) - 273.15 AS t2m,
           avg(value / 1000.0) * 1000.0 AS tp
    FROM events
    GROUP BY 1, 2
)
SELECT region,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       CAST(avg(t2m) AS FLOAT) AS t2m_mean,
       CAST(min(t2m) AS FLOAT) AS t2m_min,
       CAST(max(t2m) AS FLOAT) AS t2m_max,
       CAST(sum(tp) AS FLOAT) AS tp_sum
FROM hourly
GROUP BY 1, 2
"""


def q_era5_serve_filter_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F2 + F3 + O2: membership + closed date range, pushed to the scan.
    day_grain = q_era5_chain(spark, sf_dir)
    return serve.filter_daily(day_grain, ["click", "view"], "2024-01-05", "2024-01-10")


_ERA5_FILTER_SQL = f"""
WITH daily AS ({_ERA5_CHAIN_SQL.replace("hourly", "hourly_cte")})
SELECT * FROM daily
WHERE region IN ('click', 'view')
  AND day BETWEEN DATE '2024-01-05' AND DATE '2024-01-10'
"""


def q_era5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4: wide series, static schema via explicit pivot values.
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    piv = serve.pivot_metric(
        ev, "value", time_col="day", series_col="event_type", series_values=EVENT_TYPES
    )
    piv = piv.select("day", *[F.col(t).cast("float").alias(t) for t in EVENT_TYPES])
    return _date_as_ts(piv, "day")


_ERA5_PIVOT_SQL = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       CAST(avg(CASE WHEN event_type = 'click' THEN value END) AS FLOAT) AS click,
       CAST(avg(CASE WHEN event_type = 'error' THEN value END) AS FLOAT) AS error,
       CAST(avg(CASE WHEN event_type = 'purchase' THEN value END) AS FLOAT) AS purchase,
       CAST(avg(CASE WHEN event_type = 'signup' THEN value END) AS FLOAT) AS signup,
       CAST(avg(CASE WHEN event_type = 'view' THEN value END) AS FLOAT) AS view
FROM events
GROUP BY 1
"""


def q_era5_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A5: single-row KPI strip.
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return _date_as_ts(
        serve.kpis(ev, series_col="event_type", time_col="day"), "min_day", "max_day"
    )


_ERA5_KPIS_SQL = """
SELECT count(*) AS n_rows,
       count(DISTINCT event_type) AS n_event_type,
       CAST(min(CAST(ts AS DATE)) AS TIMESTAMP) AS min_day,
       CAST(max(CAST(ts AS DATE)) AS TIMESTAMP) AS max_day
FROM events
"""


def q_era5_verification(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6: per-key count/min/max sanity rollup.
    return serve.verification_rollup(_t(spark, sf_dir, "events"), key_col="event_type")


_ERA5_VERIF_SQL = """
SELECT event_type, count(*) AS n_rows, min(ts) AS min_ts, max(ts) AS max_ts
FROM events GROUP BY 1 ORDER BY 1
"""


def q_era5_distinct_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4: SELECT DISTINCT key ORDER BY key.
    return serve.distinct_keys(_t(spark, sf_dir, "events"), "event_type")


_ERA5_DISTINCT_SQL = "SELECT DISTINCT event_type FROM events ORDER BY 1"


def q_era5_convert_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C1–C3 row-level: pure per-row float64 IEEE arithmetic, no agg —
    # bit-identical across engines, so no casts needed.
    from big_data_in_agriculture_spark.functions.convert import convert_units

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("value") + F.lit(273.15)).alias("t2m"),
        (F.col("value") + F.lit(280.0)).alias("d2m"),
        (F.col("value") / F.lit(1000.0)).alias("tp"),
        (F.col("value") / F.lit(10.0)).alias("u10"),
        (F.col("value") / F.lit(7.0)).alias("v10"),
    )
    return convert_units(ev)


_ERA5_CONVERT_SQL = """
SELECT event_id,
       (value + 273.15) - 273.15 AS t2m,
       (value + 280.0) - 273.15 AS d2m,
       (value / 1000.0) * 1000.0 AS tp,
       value / 10.0 AS u10,
       value / 7.0 AS v10,
       sqrt((value / 10.0) * (value / 10.0) + (value / 7.0) * (value / 7.0)) AS wind_speed_10m
FROM events
"""


# ---------------------------------------------------------------------------
# Relational surface (joins / windows / set ops / grouping sets)
# ---------------------------------------------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(_t(spark, sf_dir, "lineitem"))


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS FLOAT) AS sum_qty,
       CAST(sum(l_extendedprice) AS FLOAT) AS sum_base_price,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS sum_disc_price,
       CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS FLOAT) AS sum_charge,
       CAST(avg(l_quantity) AS FLOAT) AS avg_qty,
       CAST(avg(l_extendedprice) AS FLOAT) AS avg_price,
       CAST(avg(l_discount) AS FLOAT) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


_Q3_SQL = """
SELECT o_orderkey, o_orderdate,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.regional_revenue(
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


_Q5_SQL = """
SELECT n_name, CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY n_name
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.priority_order_counts(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customers_with_orders(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.customers_without_orders(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_customer_detail(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


_BROADCAST_SQL = """
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.running_order_total(_t(spark, sf_dir, "orders"))


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(o_totalprice) OVER w AS FLOAT) AS running_total,
       CAST(row_number() OVER w2 AS INTEGER) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_orders_per_customer(_t(spark, sf_dir, "orders"))


_TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 2
"""


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_value_lag(_t(spark, sf_dir, "orders"))


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice - lag(o_totalprice) OVER w AS FLOAT) AS delta_prev,
       CAST(lag(o_totalprice) OVER w AS FLOAT) AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


_SESSION_SQL = """
WITH flags AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flags
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessions
GROUP BY user_id, session_seq
"""


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return relational.set_intersect(a, b)


_INTERSECT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BUILDING customers minus those with any URGENT order — non-empty
    # at every sf, so the EXCEPT semantics actually get hash-checked.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return relational.set_except(a, b)


_EXCEPT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.acctbal_rollup(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


_ROLLUP_SQL = """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(sum(c_acctbal) AS FLOAT) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
-- HAVING: on an EMPTY input ANSI grouping sets still emit the ()
-- grand-total row (count 0) but Spark's rollup/cube/groupingSets emit
-- nothing; the count guard is a no-op on non-empty inputs (every
-- grouping row aggregates >= 1 source row) and aligns the engines
HAVING count(*) > 0
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


def q_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_n_orders(_t(spark, sf_dir, "orders"))


_TOP10_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# LLM-pipeline surface: dedup / text analysis / similarity search
# ---------------------------------------------------------------------------

def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.exact_dup_groups(_t(spark, sf_dir, "documents"))


_DEDUP_GROUPS_SQL = """
SELECT sha256(text) AS text_sha,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents GROUP BY sha256(text)
"""


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.dedup_exact(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars"
    )


_DEDUP_DOCS_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.text_stats(_t(spark, sf_dir, "documents"))


_TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
       ((CAST(length(text) AS DOUBLE)
         - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
        / CAST(len(string_split(text, ' ')) AS DOUBLE))
       * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality
FROM documents
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.corpus_profile(_t(spark, sf_dir, "documents"), by="lang")


_CORPUS_PROFILE_SQL = """
WITH stats AS (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           ((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality
    FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(avg(n_chars) AS FLOAT) AS avg_chars,
       CAST(avg(quality) AS FLOAT) AS avg_quality
FROM stats GROUP BY lang ORDER BY lang
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, k=3)


_JACCARD_SQL = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
shingled AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          FOR i IN range(1, greatest(len(t) - 2, 1) + 1)]) AS sh
    FROM toks
),
exploded AS (
    SELECT doc_id, len(sh) AS set_size, unnest(sh) AS shingle FROM shingled
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*) AS n_common,
       CAST(count(*) AS DOUBLE)
           / CAST(a.set_size + b.set_size - count(*) AS DOUBLE) AS jaccard
FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.set_size, b.set_size
HAVING CAST(count(*) AS DOUBLE)
           / CAST(a.set_size + b.set_size - count(*) AS DOUBLE) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.simhash(_t(spark, sf_dir, "documents"))


def _simhash_oracle() -> str:
    """Generate the DuckDB twin of llm.simhash: token hash = first 8
    hex chars of sha256 parsed digit-by-digit; per-bit ±1 sums; bit =
    sign. Pure integer arithmetic → engine-exact."""
    digit_poly = " + ".join(
        f"(strpos('0123456789abcdef', substr(sh, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (h // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(32))
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashed AS (
    SELECT doc_id, sha256(tok) AS sh FROM tok
),
hv AS (
    SELECT doc_id, CAST({digit_poly} AS BIGINT) AS h FROM hashed
),
bits AS (
    SELECT doc_id,
           {bit_sums}
    FROM hv GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(emb, queries, k=3)


#: DuckDB twin of similarity.vec_is_valid — the INVALID-VECTOR
#: convention (COVERAGE.md): every vector operator excludes, at entry,
#: NULL vectors AND vectors with any NULL/NaN/±Inf component (failed
#: encoder output; the --nanvec adversarial corpus plants all four).
_VALID_VEC = (
    "(embedding IS NOT NULL AND len(list_filter(embedding,"
    " x -> x IS NULL OR isnan(x) OR isinf(x))) = 0)"
)


_KNN_SQL = f"""
WITH q AS (
    -- invalid embeddings are excluded on both engines at entry
    -- (similarity.vec_is_valid / _VALID_VEC)
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < 10 AND {_VALID_VEC}
),
c AS (
    SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE {_VALID_VEC}
),
scored AS (
    SELECT query_id, neighbor_id,
           round(CASE WHEN (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv))) > 0
                      THEN list_dot_product(qv, cv)
                           / (sqrt(list_dot_product(qv, qv))
                              * sqrt(list_dot_product(cv, cv)))
                      ELSE 0.0 END,
                 6) AS cosine_sim
    FROM q, c
    WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id)
                AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 3
"""


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.norm_stats_by_label(_t(spark, sf_dir, "embeddings"))


_NORMS_SQL = f"""
WITH n AS (
    -- invalid embeddings excluded at entry (vec_is_valid convention;
    -- round 6: a NULL vector used to be counted with a NULL norm,
    -- now it does not appear in n_vectors at all)
    SELECT label,
           sqrt(list_dot_product(embedding::DOUBLE[],
                                 embedding::DOUBLE[])) AS l2
    FROM embeddings WHERE {_VALID_VEC}
)
SELECT label,
       count(*) AS n_vectors,
       CAST(avg(l2) AS FLOAT) AS avg_norm,
       CAST(min(l2) AS FLOAT) AS min_norm,
       CAST(max(l2) AS FLOAT) AS max_norm
FROM n GROUP BY label ORDER BY label
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Opaque-binary plumbing: text → bytes → (size, content hash). The
    # same shape a 100 TB image/audio column uses (binary + typed
    # metadata); decode itself lives in operators/multimodal.py stubs.
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


_MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
"""


# Approximate ops with FULL SQL twins: the Spark pipelines use only
# engine-portable hashing (md5-derived shingle/bucket hashes,
# deterministic hyperplane/centroid constants), so DuckDB replays the
# entire approximate pipeline — candidates included — bit-identically.

def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.minhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, num_perm=64, bands=16
    )


def _minhash_neardup_sql(
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    source: str = "documents",
    max_bucket_width: int | None = None,
) -> str:
    """DuckDB replay of the FULL MinHash-LSH near-dup pipeline.

    Mirrors llm.minhash_neardup_pairs(portable=True) stage by stage:
    md5-derived 32-bit shingle hashes (TX.shingle_hashes_md5), the
    same _affine_params (a_i*h + b_i) mod 2^61−1 minima, md5 band
    buckets over '|'-joined signature slices, in-bucket pairs with
    id_a < id_b, then exact-Jaccard verification on candidates.
    Integer hashing end-to-end; the final jaccard is ONE double
    division of exact integers — bit-identical across engines.

    ``source`` names the (doc_id, text) relation to read — "documents"
    or a CTE defined by a wrapping query (the collapsed variant feeds
    "reps"). ``max_bucket_width`` replays llm.lsh_candidate_pairs'
    bucket-width cap: buckets with more than that many members yield
    no candidates, on both engines identically (the widths are
    deterministic integers).
    """
    rows_per_band = num_perm // bands
    mers = (1 << 61) - 1
    params = [llm._affine_params(i) for i in range(num_perm)]
    sig_exprs = ",\n           ".join(
        f"list_min([(h*{a}+{b})%{mers} FOR h IN hs]) AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_structs = ",\n        ".join(
        "{'band': %d, 'bucket': ('0x' || substr(md5(concat_ws('|', %s)),1,15))::BIGINT}"
        % (
            i,
            ", ".join(
                f"s{i * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for i in range(bands)
    )
    if max_bucket_width is None:
        cand_sql = """
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
)"""
    else:
        cand_sql = f"""
ok_buckets AS (
    SELECT band, bucket FROM banded GROUP BY band, bucket
    HAVING count(*) <= {max_bucket_width}
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN ok_buckets o ON a.band = o.band AND a.bucket = o.bucket
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
)"""
    return f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM {source}
),
sh AS (
    SELECT doc_id, list_distinct([
        ('0x' || substr(md5(array_to_string(toks[(i+1):(i+{k})], ' ')),1,8))::BIGINT
        FOR i IN range(0, greatest(len(toks)-{k},0)+1)
    ]) AS hs
    FROM tok
),
sig AS (
    SELECT doc_id,
           {sig_exprs}
    FROM sh
),
banded AS (
    SELECT doc_id, u.band AS band, u.bucket AS bucket FROM (
        SELECT doc_id, unnest([
        {band_structs}
        ]) AS u FROM sig
    )
),
{cand_sql},
verified AS (
    SELECT id_a, id_b,
           len(list_intersect(sa.hs, sb.hs)) AS n_common,
           len(sa.hs) AS na, len(sb.hs) AS nb
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.id_a
    JOIN sh sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b,
       n_common::DOUBLE / (na + nb - n_common)::DOUBLE AS jaccard
FROM verified
WHERE n_common::DOUBLE / (na + nb - n_common)::DOUBLE >= {threshold}
"""


def q_minhash_neardup_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-heavy-corpus mode: exact families collapse to their
    representative before LSH, families come back as linear star edges,
    and a bucket-width cap backstops residual near-exact mega-families.
    Connected components equal the uncollapsed pipeline's (see
    llm.minhash_neardup_pairs docstring for the spanning-set contract)."""
    return llm.minhash_neardup_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.5,
        num_perm=64,
        bands=16,
        collapse_exact=True,
        max_bucket_width=64,
    )


def _minhash_collapsed_sql(
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    max_bucket_width: int = 64,
) -> str:
    """DuckDB replay of minhash_neardup_pairs(collapse_exact=True).

    Exact families group on the raw text (set-identical to the Spark
    side's sha256 grouping — same texts, same families, and min(doc_id)
    picks the same representative); the inner pipeline is the SAME
    generated SQL as the uncollapsed oracle, pointed at the reps CTE
    with the bucket-width cap applied.
    """
    inner = _minhash_neardup_sql(
        threshold, num_perm, bands, k,
        source="reps", max_bucket_width=max_bucket_width,
    )
    return f"""
WITH fam AS (
    SELECT text, min(doc_id) AS keep_id FROM documents GROUP BY text
),
reps AS (
    SELECT keep_id AS doc_id, text FROM fam
),
star AS (
    SELECT f.keep_id AS id_a, d.doc_id AS id_b, 1.0::DOUBLE AS jaccard
    FROM documents d JOIN fam f ON d.text = f.text
    WHERE d.doc_id <> f.keep_id
)
SELECT id_a, id_b, jaccard FROM ({inner})
UNION ALL
SELECT id_a, id_b, jaccard FROM star
"""


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(emb, queries, dim=64, k=3, num_tables=4, num_bits=8)


def _knn_lsh_sql(
    dim: int = 64, k: int = 3, num_tables: int = 4, num_bits: int = 8
) -> str:
    """DuckDB replay of the sign-LSH kNN pipeline.

    The hyperplanes are similarity._hyperplane's deterministic
    constants, emitted as DOUBLE[] literals (Python float repr
    round-trips to the identical IEEE double). Bucket = sum of
    2^b over planes with round(⟨v, r⟩, 9) ≥ 0 — BOTH engines round
    the projection to 9 decimals before taking the sign (same
    contract as similarity._bucketize/lsh_bucket), so a
    near-orthogonal pair whose dot differs in the last ulp between
    numpy's BLAS fold and DuckDB's sequential fold cannot flip a
    bucket bit. Candidates, exact re-rank (ROUND 6), and the
    row_number top-k mirror similarity.knn_lsh.
    """
    tbl_structs = []
    for t in range(num_tables):
        bits = []
        for b in range(num_bits):
            plane = similarity._hyperplane(42, t, b, dim)
            lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN round(list_dot_product(v, {lit}), 9) >= 0"
                f" THEN {2 ** b} ELSE 0 END)"
            )
        tbl_structs.append(
            "{'tbl': %d, 'bucket': (%s)::BIGINT}" % (t, " + ".join(bits))
        )
    structs = ",\n        ".join(tbl_structs)
    return f"""
WITH e AS (
    -- invalid embeddings can't be bucketed; excluded on both engines
    -- (vec_is_valid / _VALID_VEC)
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
bb AS (
    SELECT vec_id, v, u.tbl AS tbl, u.bucket AS bucket FROM (
        SELECT vec_id, v, unnest([
        {structs}
        ]) AS u FROM e
    )
),
cand AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           max(round(CASE WHEN (sqrt(list_dot_product(q.v, q.v))
                                * sqrt(list_dot_product(c.v, c.v))) > 0
                            THEN list_dot_product(q.v, c.v)
                                 / (sqrt(list_dot_product(q.v, q.v))
                                    * sqrt(list_dot_product(c.v, c.v)))
                            ELSE 0.0 END, 6)) AS cosine_sim
    FROM bb q JOIN bb c ON q.tbl = c.tbl AND q.bucket = c.bucket
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    GROUP BY q.vec_id, c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id)
                AS INTEGER) AS rank
    FROM cand
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Round-2 widening: hourly serving filter, water balance, rolling window,
# TPC-H Q6, cube, union-all, fingerprints/langid, streaming, multimodal.
# ---------------------------------------------------------------------------

def q_era5_filter_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F3 hourly variant: end day expands to 23:59:59.999999
    # (dashboards/app.py:165-166).
    hourly = q_era5_hourly_spatial_mean(spark, sf_dir)
    return serve.filter_hourly(hourly, ["click", "error"], "2024-01-03", "2024-01-04")


_ERA5_FILTER_HOURLY_SQL = f"""
WITH hourly AS ({_ERA5_HOURLY_SQL})
SELECT * FROM hourly
WHERE region IN ('click', 'error')
  AND ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
             AND TIMESTAMP '2024-01-04 23:59:59.999999'
"""


def q_era5_water_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4: water_balance fires because BOTH tp_sum and pev_mm_sum exist.
    ev = _t(spark, sf_dir, "events")
    hourly = ev.select(
        F.col("event_type").alias("region"),
        F.col("ts"),
        (F.col("value") / F.lit(1000.0)).alias("tp"),
        (F.col("value") / F.lit(2000.0)).alias("pev_mm"),
    )
    out = daily_ops.daily_rollup(
        hourly, agg_specs={"tp": ["sum"], "pev_mm": ["sum"]}, cast=None
    )
    out = out.select(
        "region", "day",
        F.col("tp_sum").cast("float").alias("tp_sum"),
        F.col("pev_mm_sum").cast("float").alias("pev_mm_sum"),
        F.col("water_balance").cast("float").alias("water_balance"),
    )
    return _date_as_ts(out, "day")


_ERA5_WATER_SQL = """
WITH d AS (
    SELECT event_type AS region,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           sum(value / 1000.0) AS tp_sum,
           sum(value / 2000.0) AS pev_mm_sum
    FROM events GROUP BY 1, 2
)
SELECT region, day,
       CAST(tp_sum AS FLOAT) AS tp_sum,
       CAST(pev_mm_sum AS FLOAT) AS pev_mm_sum,
       CAST(tp_sum - pev_mm_sum AS FLOAT) AS water_balance
FROM d
"""


def q_window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE-frame trailing window over days (gaps shrink the window).
    daily = q_era5_chain(spark, sf_dir).select("region", "day", "tp_sum")
    out = relational.rolling_day_sum(
        daily.withColumn("day", F.to_date("day")),
        "region", "day", "tp_sum", days=7, out_col="tp_7d",
    )
    out = out.withColumn("tp_7d", F.col("tp_7d").cast("float"))
    return _date_as_ts(out, "day")


_ROLLING_SQL = f"""
WITH daily AS ({_ERA5_CHAIN_SQL.replace("hourly", "hourly_cte")})
SELECT region, day, tp_sum,
       CAST(sum(tp_sum) OVER (
           PARTITION BY region ORDER BY CAST(day AS DATE)
           RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS FLOAT) AS tp_7d
FROM daily
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q6 shape: pure scan-filter-agg; every predicate pushes to parquet.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount"))
            .cast("float")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_SQL = """
SELECT CAST(sum(l_extendedprice * l_discount) AS FLOAT) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUBE over two dims: all four grouping sets in one aggregate.
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").cast("float").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_totalprice) AS FLOAT) AS total_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
HAVING count(*) > 0  -- see _ROLLUP_SQL: Spark emits no rows on empty input
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


def q_union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1: stack two per-segment frames (concat), then one agg over both.
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY")
    return (
        a.unionByName(b)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").cast("float").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


_UNION_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(c_acctbal) AS FLOAT) AS total_acctbal
FROM (
    SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sha256 of lower/collapsed-whitespace content + marker-word langid.
    return llm.doc_fingerprints(_t(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    from big_data_in_agriculture_spark.functions.text import LANG_MARKERS

    score = {
        lang: (
            "len(list_filter(string_split(text, ' '), "
            f"t -> lower(t) IN ({', '.join(repr(m) for m in words)})))"
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join(f's_{lang}' for lang in langs)})"
    case = "CASE "
    for lang in langs:  # first max wins, insertion order
        case += f"WHEN s_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return f"""
WITH scored AS (
    SELECT doc_id, text, {scores_sql} FROM documents
),
with_best AS (
    SELECT *, {best} AS best FROM scored
)
SELECT doc_id,
       sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
       {case} AS lang_guess
FROM with_best
"""


def q_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9 sliding windows: 1-day window every 6 hours — each event in
    # exactly 4 overlapping epoch-aligned windows. Batch form of
    # streaming.events.sliding_rollup (same code path; the streaming
    # variant only adds a watermark). Order-dependent double sums cast
    # to float32 once at the end, per the determinism contract.
    from big_data_in_agriculture_spark.streaming.events import sliding_rollup

    out = sliding_rollup(_t(spark, sf_dir, "events"), "1 day", "6 hours")
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        F.col("value_mean").cast("float").alias("value_mean"),
        F.col("value_sum").cast("float").alias("value_sum"),
    )


_SLIDING_SQL = """
WITH win AS (
    SELECT make_timestamp(((CAST(floor(epoch(ts) / 21600) AS BIGINT) - i) * 21600) * 1000000)
               AS window_start,
           event_type, value
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS i)
    WHERE ts IS NOT NULL  -- unwindowable; Spark's window() drops them
)
SELECT window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(avg(value) AS FLOAT) AS value_mean,
       CAST(sum(value) AS FLOAT) AS value_sum
FROM win
GROUP BY 1, 2, 3
"""



def q_stream_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.9: real Structured Streaming micro-batch (file source →
    # watermark → 1-day window → foreachBatch keyed upsert), run with an
    # availableNow trigger and the sink read back as the result. The
    # first batch's watermark is epoch, so no row is late-dropped and
    # the end state equals the batch aggregate — SQL-oracle-checkable.
    import shutil
    import tempfile

    from big_data_in_agriculture_spark.streaming.events import (
        start_daily_rollup_to_parquet,
    )

    # This query never goes through _t(), so pin UTC itself — the 1-day
    # window boundaries and to_date are session-TZ-dependent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tmp = tempfile.mkdtemp(prefix="streamq-")
    landing = f"{tmp}/landing"
    import os

    os.makedirs(landing)
    shutil.copy(f"{sf_dir}/events.parquet", f"{landing}/batch-000.parquet")
    q = start_daily_rollup_to_parquet(
        spark, landing, f"{tmp}/sink", f"{tmp}/chk", available_now=True
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming rollup did not finish within 300s")
    out = spark.read.parquet(f"{tmp}/sink").select(
        "event_type",
        F.col("day"),
        "n_events",
        F.col("value_mean").cast("float").alias("value_mean"),
        "value_min",
        "value_max",
        F.col("value_sum").cast("float").alias("value_sum"),
    )
    return _date_as_ts(out, "day")


_STREAM_SQL = """
SELECT event_type,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       CAST(avg(value) AS FLOAT) AS value_mean,
       min(value) AS value_min,
       max(value) AS value_max,
       CAST(sum(value) AS FLOAT) AS value_sum
FROM events
WHERE ts IS NOT NULL  -- unwindowable; Spark's window() drops them
GROUP BY 1, 2
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Binary-column plumbing end-to-end: text → payload bytes → Arrow-
    # batched mapInPandas kernel → typed features. The kernel is the
    # deterministic stand-in for an image decoder (none installed); its
    # outputs are pure functions of the bytes, so SQL can twin them.
    from big_data_in_agriculture_spark.operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )

    def kernel(raw: bytes):
        return (len(raw), 1, [float(len(raw))])

    return extract_features(assets, kernel).select(
        "asset_id", "n_bytes", "payload_sha", "width", "height"
    )


_MULTIMODAL_FEATURES_SQL = """
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha,
       CAST(octet_length(encode(text)) AS INTEGER) AS width,
       CASE WHEN text IS NULL THEN NULL ELSE 1 END AS height
FROM documents
"""


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join: each click attributed to the user's most recent
    # purchase at-or-before it. DuckDB twins it with a native ASOF JOIN.
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = relational.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="purchase_ts",
        right_cols=["purchase_ts", "purchase_value"],
    )
    return out.select("event_id", "user_id", "ts", "purchase_ts", "purchase_value")


_ASOF_SQL = """
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Skew-safe salted join — result identical to the plain equi-join
    # (the oracle IS the plain join), shuffle spread over 8 sub-keys.
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return relational.salted_join(orders, cust, "c_custkey", salts=8)


_SALTED_SQL = """
SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BPE-ish pre-tokenization + stopword ratio over documents.
    from big_data_in_agriculture_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.n_bpe_tokens("text").alias("n_bpe_tokens"),
        TX.stopword_count("text").alias("n_stopwords"),
        TX.stopword_ratio("text").alias("stopword_ratio"),
    )


def _bpe_sql() -> str:
    from big_data_in_agriculture_spark.functions.text import LANG_MARKERS

    words = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    in_list = ", ".join(repr(w) for w in words)
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> lower(t) IN ({in_list}))) AS BIGINT) AS n_stopwords,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> lower(t) IN ({in_list}))) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
FROM documents
"""


_EMB_NEARDUP_SQL = f"""
WITH u AS (
    -- invalid embeddings excluded at entry (vec_is_valid convention)
    SELECT vec_id, embedding FROM embeddings WHERE {_VALID_VEC}
    UNION ALL
    SELECT vec_id + 1000000, embedding FROM embeddings
    WHERE vec_id < 5 AND {_VALID_VEC}
),
p AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CASE WHEN (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                  a.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]))) > 0
                      THEN list_dot_product(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[])
                           / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                    a.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                    b.embedding::DOUBLE[])))
                      ELSE 0.0 END,
                 6) AS cosine_sim
    FROM u a JOIN u b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM p WHERE cosine_sim >= 0.9
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.returned_item_revenue(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "nation"),
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.promo_revenue_share(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


_Q14_SQL = """
SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
            / sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS promo_pct,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_supplier_by_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier")
    )


#: max-EQUALITY semantics, matching relational.top_supplier_by_revenue
#: exactly: every supplier tied at the max revenue is returned. The
#: previous rank()-with-suppkey-tiebreak twin returned ONE row on a
#: revenue tie while the Spark side returned all — a latent parity
#: break float revenues merely made improbable (round-9 ADVICE).
_Q15_SQL = """
WITH per_supp AS (
    SELECT l_suppkey,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS total_revenue
    FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
ORDER BY s_suppkey
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.large_orders(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(total_qty AS FLOAT) AS total_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150.0
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.disjunctive_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


_Q19_SQL = """
SELECT CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.nation_volume(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        nation_a="NATION_1", nation_b="NATION_2",
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every synthetic customer has SOME order, so the anti-join runs
    # against urgent orders only — non-vacuous at every sf
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return relational.untapped_customers(_t(spark, sf_dir, "customer"), orders)


_Q22_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(c_acctbal) AS FLOAT) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1
"""


def q_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Native session_window — independently implements the session
    # semantics the SQL oracle derives with lag + conditional cumsum;
    # hash-equality of the two is a strong cross-check.
    from big_data_in_agriculture_spark.streaming.events import session_rollup

    return session_rollup(_t(spark, sf_dir, "events"), gap="30 minutes")


_SESSION_WINDOW_SQL = """
WITH flags AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL  -- unwindowable; Spark's session_window drops them
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
    FROM flags
)
SELECT user_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessions GROUP BY user_id, seq
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Iterative distributed connected components over the exact
    # near-dup pair graph; DuckDB twins it with a recursive CTE.
    pairs = llm.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, k=3)
    return llm.neardup_components(pairs)


_COMPONENTS_SQL = f"""
WITH RECURSIVE edges AS (
    SELECT id_a AS src, id_b AS dst FROM ({_JACCARD_SQL}) jp
    UNION
    SELECT id_b, id_a FROM ({_JACCARD_SQL}) jp2
),
reach(id, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id, min(lab) AS component_id FROM reach GROUP BY id
"""


def q_mart_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # K1 + S9 + A3 inside the gate: write a hive-partitioned hourly
    # mart, read it back with partition pruning, roll up one region.
    import tempfile

    from big_data_in_agriculture_spark.sources.marts import (
        read_mart,
        write_hourly_mart,
    )

    hourly = hourly_ops.spatial_mean_hourly(
        _pseudo_grid(spark, sf_dir, hourly_ts=True).select("region", "ts", "t2m", "tp"),
        variables=["t2m", "tp"],
        cast=None,
    )
    root = tempfile.mkdtemp(prefix="martq-") + "/hourly"
    write_hourly_mart(hourly, root)
    back = read_mart(spark, root, regions=["click"]).drop("year", "month")
    out = daily_ops.daily_rollup(
        back, agg_specs={"t2m": ["mean", "min", "max"], "tp": ["sum"]}, cast="float"
    )
    return _date_as_ts(out, "day")


_MART_ROUNDTRIP_SQL = f"""
WITH daily AS ({_ERA5_CHAIN_SQL.replace("hourly", "hourly_cte")})
SELECT * FROM daily WHERE region = 'click'
"""


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact one-pass table profile (null rates, cardinalities, ranges).
    from big_data_in_agriculture_spark.operators.profile import profile_table

    return profile_table(
        _t(spark, sf_dir, "lineitem"),
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )


def _profile_sql() -> str:
    rows = []
    for c, numeric in [("l_orderkey", True), ("l_quantity", True), ("l_returnflag", False)]:
        mn = f"CAST(min({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        rows.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows, count({c}) AS n_non_null, "
            f"count(*) - count({c}) AS n_null, count(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_val, {mx} AS max_val FROM lineitem"
        )
    return "\nUNION ALL\n".join(rows)


def q_approx_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ distinct + percentile sketches — approximate by design, so
    # rows-only (the exact twins are profile_lineitem / era5 KPI aggs).
    from big_data_in_agriculture_spark.operators.profile import approx_profile

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return approx_profile(ev, "event_type", "value", "user_id")


def q_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HTML strip + PII masking + repetition score. The corpus is clean
    # synthetic prose, so markup/emails/digits are injected around it —
    # both engines transform the same constructed input.
    from big_data_in_agriculture_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<div class='x'>intro</div> "),
            F.col("text"),
            F.lit(
                " contact: agent.7@example.com ip 10.1.2.3"
                " tel 555-123-4567 id 123456789 end"
            ),
        ).alias("raw"),
    )
    return docs.select(
        "doc_id",
        TX.strip_html(F.col("raw")).alias("stripped"),
        TX.mask_pii(F.col("raw")).alias("masked"),
        TX.repetition_ratio(F.col("raw"), 3).alias("repetition"),
    )


def _text_cleaning_sql() -> str:
    # masking replays TX.mask_pii via the shared _pii_mask_sql chain
    # (defined below with the pii_scan oracle — evaluated at
    # oracle_sql() call time, after the module finishes loading)
    return rf"""
WITH raw AS (
    -- '||', not concat(): DuckDB's concat() SKIPS NULL args while
    -- Spark's concat yields NULL; || propagates NULL on both engines,
    -- so a NULL-text doc cleans to NULL everywhere
    SELECT doc_id,
           '<div class=''x''>intro</div> ' || text ||
           ' contact: agent.7@example.com ip 10.1.2.3 tel 555-123-4567 id 123456789 end' AS raw
    FROM documents
),
shingled AS (
    SELECT doc_id, raw,
           string_split(raw, ' ') AS t
    FROM raw
),
sh AS (
    SELECT doc_id, raw,
           greatest(len(t) - 2, 1) AS total,
           len(list_distinct([array_to_string(t[i:i+2], ' ')
                              FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS nd
    FROM shingled
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(raw, '<[^>]{{1,512}}>', ' ', 'g'), '\s+', ' ', 'g')) AS stripped,
       {_pii_mask_sql("raw")} AS masked,
       CASE WHEN raw IS NULL THEN NULL
            ELSE 1.0 - CAST(nd AS DOUBLE) / CAST(total AS DOUBLE)
       END AS repetition  -- NULL in -> NULL ratio (repetition_ratio)
FROM sh
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The stream-stream interval join's batch form (same code path —
    # click_purchase_join_stream works on static frames; the streaming
    # run with watermark state is tested in tests/test_streaming_*).
    from big_data_in_agriculture_spark.streaming.events import (
        click_purchase_join_stream,
    )

    return click_purchase_join_stream(
        _t(spark, sf_dir, "events"), attribution_window="1 day", watermark="2 days"
    )


_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts <= c.ts
 AND p.ts >= c.ts - INTERVAL 1 DAY
"""


_NATION_RANK_SQL = """
WITH rev AS (
    SELECT n_name,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name, revenue,
       CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS INTEGER) AS rev_rank
FROM rev
ORDER BY rev_rank, n_name
"""


def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine's raw-SQL surface: the same ANSI text the DuckDB
    # oracle runs goes through spark.sql() over registered views —
    # parser/analyzer/optimizer parity on CTEs, joins, window rank.
    from big_data_in_agriculture_spark.schemas import load_tables

    load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return spark.sql(_NATION_RANK_SQL)


# Rows-only: approximate ANN variants (IVF probe + LSH near-dup).

def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_ivf(emb, queries, k=3, n_centroids=16, n_probe=4)


def _knn_ivf_sql(
    dim: int = 64, k: int = 3, n_centroids: int = 16, n_probe: int = 4,
    coarse_iters: int = 2, q: int = 6,
) -> str:
    """DuckDB replay of the IVF kNN pipeline (similarity.knn_ivf).

    The coarse centroids are TRAINED but bit-replayable (round 8):
    the same unrolled quantized-Lloyd chain the kmeans oracle uses
    (`_kmeans_cte_chain`, prefix g) re-derives similarity.kmeans_fit's
    exact model in SQL. Assignment/probing = squared-distance argmin
    with cid tie-break (row_number), exactly the array_sort((d, cid))
    order Spark uses; re-rank is the shared ROUND-6 cosine + id
    tie-break.
    """
    return f"""
WITH e AS (
    -- invalid embeddings excluded at entry (vec_is_valid / _VALID_VEC)
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
{_kmeans_cte_chain(coarse_iters, n_centroids, dim, q, source="e", prefix="g")},
cent AS (
    SELECT cid, cv FROM gc{coarse_iters}
),
dists AS (
    SELECT e.vec_id, cent.cid,
           list_sum(list_transform(range(1, {dim + 1}),
                    i -> (e.v[i]-cent.cv[i])*(e.v[i]-cent.cv[i]))) AS d
    FROM e, cent
),
assigned AS (
    SELECT vec_id AS neighbor_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
    ) WHERE rn = 1
),
probed AS (
    SELECT vec_id AS query_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists WHERE vec_id < 10
    ) WHERE rn <= {n_probe}
),
cand AS (
    SELECT p.query_id, a.neighbor_id,
           max(round(CASE WHEN (sqrt(list_dot_product(q.v, q.v))
                                * sqrt(list_dot_product(c.v, c.v))) > 0
                            THEN list_dot_product(q.v, c.v)
                                 / (sqrt(list_dot_product(q.v, q.v))
                                    * sqrt(list_dot_product(c.v, c.v)))
                            ELSE 0.0 END, 6)) AS cosine_sim
    FROM probed p
    JOIN assigned a ON p.cluster = a.cluster
    JOIN e q ON q.vec_id = p.query_id
    JOIN e c ON c.vec_id = a.neighbor_id
    WHERE a.neighbor_id <> p.query_id
    GROUP BY p.query_id, a.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id)
                AS INTEGER) AS rank
    FROM cand
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The synthetic embeddings have no natural near-dups (max pairwise
    # cosine ≈ 0.51), so plant exact copies of vecs 0–4 under shifted
    # ids: the operator must recover exactly those 5 pairs at cos 1.0.
    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    return similarity.embedding_neardup_pairs(
        emb.unionByName(planted), threshold=0.9, dim=64
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.market_share(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "part"),
        part_type="PROMO", region_name="ASIA", supp_nation="NATION_2",
    )


_Q8_SQL = """
WITH cust_r AS (
    SELECT c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
)
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n_name = 'NATION_2'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
            / sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN cust_r ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.nation_profit(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "part"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), name_token="red",
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(l_extendedprice * (1 - l_discount)
                - 0.1 * p_retailprice * l_quantity) AS FLOAT) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.important_nations(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), fraction=0.045,
    )


_Q11_SQL = """
SELECT n_name,
       CAST(sum(l_extendedprice * (1 - l_discount)) AS FLOAT) AS value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
HAVING sum(l_extendedprice * (1 - l_discount)) >
       (SELECT sum(l_extendedprice * (1 - l_discount)) * 0.045 FROM lineitem)
ORDER BY value DESC, n_name
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.shipping_delay_priority(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '1-FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN '2-MEDIUM'
            ELSE '3-SLOW' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.order_count_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


_Q13_SQL = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.small_quantity_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        brand="Brand#3", fraction=0.2,
    )


_Q17_SQL = """
SELECT CAST(sum(l_extendedprice) / 7.0 AS FLOAT) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = part.p_partkey)
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.waiting_suppliers(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "supplier"), late_days=60,
    )


# Independent formulation: the oracle keeps Q21's EXISTS / NOT EXISTS
# pair (numwait counts distinct orders, matching the engine's
# one-aggregate-per-order plan).
_Q21_SQL = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.priority_status_grouping_sets(_t(spark, sf_dir, "orders"))


_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_totalprice) AS FLOAT) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
HAVING count(*) > 0  -- see _ROLLUP_SQL: Spark emits no rows on empty input
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def q_unpivot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.melted_flag_summary(_t(spark, sf_dir, "lineitem"))


_UNPIVOT_SQL = """
WITH agg AS (
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS FLOAT) AS sum_qty,
           CAST(sum(l_extendedprice) AS FLOAT) AS sum_price,
           CAST(sum(l_discount) AS FLOAT) AS sum_disc
    FROM lineitem GROUP BY 1
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS amount FROM agg
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM agg
UNION ALL
SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
ORDER BY l_returnflag, metric
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.acctbal_percentiles(_t(spark, sf_dir, "customer"))


_PERCENTILES_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(quantile_cont(c_acctbal, 0.25) AS FLOAT) AS p25,
       CAST(quantile_cont(c_acctbal, 0.50) AS FLOAT) AS p50,
       CAST(quantile_cont(c_acctbal, 0.75) AS FLOAT) AS p75
FROM customer GROUP BY 1 ORDER BY 1
"""


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase")
    )
    daily = timeseries.daily_series(ev, "user_id", "ts", "value")
    out = timeseries.gapfill_locf(daily)
    return (
        out.select(
            F.col("key").alias("user_id"),
            "day",
            F.col("value_filled").cast("float").alias("value_filled"),
            F.col("was_filled").cast("int").alias("was_filled"),
        )
        .orderBy("user_id", "day")
    )


_GAPFILL_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
    FROM events
    WHERE user_id < 20 AND event_type = 'purchase'
    GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
),
spine AS (
    SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
    FROM bounds
),
dense AS (
    SELECT s.user_id, s.day, d.v
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, day,
       CAST(last_value(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS FLOAT)
           AS value_filled,
       CAST(v IS NULL AS INTEGER) AS was_filled
FROM dense
ORDER BY user_id, day
"""


def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clicks landing within 1 day after an error by the same user —
    # interval containment via bin-bucketed equi-join, never a BNLJ
    ev = _t(spark, sf_dir, "events")
    day_us = 86_400 * 1_000_000
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("lo"),
        (F.unix_micros("ts") + F.lit(day_us)).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("p"),
    )
    pairs = relational.binned_range_join(
        clicks, errors, ["user_id"], "p", "lo", "hi", bin_width=day_us
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("click_id").alias("n_clicks"),
            F.countDistinct("error_id").alias("n_errors"),
        )
        .orderBy("user_id")
    )


_RANGE_JOIN_SQL = """
WITH e AS (
    SELECT user_id, event_id AS error_id, epoch_us(ts) AS lo,
           epoch_us(ts) + CAST(86400 AS BIGINT) * 1000000 AS hi
    FROM events WHERE event_type = 'error'
),
c AS (
    SELECT user_id, event_id AS click_id, epoch_us(ts) AS p
    FROM events WHERE event_type = 'click'
)
SELECT c.user_id, count(*) AS n_pairs,
       count(DISTINCT click_id) AS n_clicks,
       count(DISTINCT error_id) AS n_errors
FROM c JOIN e ON c.user_id = e.user_id AND c.p >= e.lo AND c.p <= e.hi
GROUP BY 1 ORDER BY 1
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.quality_filter(_t(spark, sf_dir, "documents"))


_QUALITY_FILTER_SQL = """
WITH m AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dr
    FROM documents
    WHERE text IS NOT NULL  -- no content to gate; Spark side filters too
)
SELECT doc_id, n_tokens,
       CAST(dr AS FLOAT) AS distinct_ratio,
       CASE WHEN n_tokens < 20 THEN 'too_short'
            WHEN n_tokens > 90 THEN 'too_long'
            WHEN dr < 0.40 THEN 'low_distinct'
            ELSE 'ok' END AS reason,
       CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 90 AND dr >= 0.40
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM m
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.min_cost_supplier(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"), size=15, region_name="EUROPE",
    )


# Independent formulation: correlated min subquery (the engine uses a
# window over the region-filtered bridge).
_Q2_SQL = """
WITH b AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM lineitem GROUP BY 1, 2
),
sr AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT CAST(s_acctbal AS FLOAT) AS s_acctbal, s_name, n_name,
       ps_partkey AS p_partkey, p_brand
FROM b
JOIN part ON ps_partkey = p_partkey
JOIN sr ON ps_suppkey = s_suppkey
WHERE p_size = 15
  AND s_acctbal = (SELECT min(sr2.s_acctbal)
                   FROM b b2 JOIN sr sr2 ON b2.ps_suppkey = sr2.s_suppkey
                   WHERE b2.ps_partkey = b.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.parts_supplier_counts(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
    )


_Q16_SQL = """
WITH b AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM lineitem GROUP BY 1, 2
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM b JOIN part ON ps_partkey = p_partkey
WHERE ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_name LIKE '%0')
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.excess_stock_suppliers(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"),
        name_token="red", nation_name="NATION_3",
    )


# Independent formulation: IN-chain with a correlated scalar subquery
# re-scanning lineitem (the engine computes the part total with a
# window over the bridge instead).
_Q20_SQL = """
SELECT s_suppkey, s_name, CAST(s_acctbal AS FLOAT) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
      SELECT ps_suppkey FROM (
          SELECT l_suppkey AS ps_suppkey, l_partkey AS pk,
                 sum(l_quantity) AS q
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%red%')
          GROUP BY 1, 2) b
      WHERE q > 0.12 * (SELECT sum(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = b.pk))
ORDER BY s_suppkey
"""


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import robust_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = robust_outliers(ev, "event_type", "value", z_thresh=3.5)
    return out.select(
        "event_id", "event_type",
        F.col("value").cast("float").alias("value"),
        F.col("robust_z").cast("float").alias("robust_z"),
    ).orderBy("event_type", "event_id")


_OUTLIERS_SQL = """
WITH ev AS (
    -- NaN measurements excluded like NULL (Spark side filters too)
    SELECT * FROM events WHERE value IS NULL OR NOT isnan(value)
),
med AS (
    SELECT event_type, median(value) AS m FROM ev GROUP BY 1
),
stats AS (
    SELECT e.event_type, any_value(m) AS m,
           median(abs(value - m)) AS mad
    FROM ev e JOIN med USING (event_type) GROUP BY 1
)
SELECT event_id, e.event_type,
       CAST(value AS FLOAT) AS value,
       CAST(0.6745 * (value - m) / mad AS FLOAT) AS robust_z
FROM ev e JOIN stats USING (event_type)
WHERE abs(0.6745 * (value - m) / mad) > 3.5
ORDER BY event_type, event_id
"""


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.top_tokens(_t(spark, sf_dir, "documents"), k=20)


_TOP_TOKENS_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY 1
ORDER BY n DESC, token
LIMIT 20
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant formatting-variant duplicates: an uppercased copy of every
    # doc shares the normalized fingerprint; quality ties, so the
    # doc_id tie-break must keep the original. ASCII-only translate,
    # NOT upper(): the engines' unicode case maps disagree (Java
    # upper('ß') = 'SS', DuckDB keeps 'ß'), so a unicode-planted
    # variant would round-trip through lower() on one engine and not
    # the other — found by the adversarial-values fuzz corpus.
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.translate(F.col("text"), "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ").alias("text"),
    )
    out = llm.dedup_keep_best(docs.unionByName(variants))
    return out.select("doc_id").orderBy("doc_id")


_KEEP_BEST_SQL = """
WITH all_docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           translate(text, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ')
    FROM documents
),
scored AS (
    SELECT doc_id,
           sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
           ((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS q
    FROM all_docs
),
ranked AS (
    SELECT doc_id,
           row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
    FROM scored
)
SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.functions.json_props import with_parsed_props

    ev = with_parsed_props(_t(spark, sf_dir, "events"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long")
            .alias("n_unparsed"),
            F.sum("k").alias("sum_k"),
            F.avg("k").cast("float").alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_JSON_PROPS_SQL = """
WITH p AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(avg(k) AS FLOAT) AS avg_k,
       max(k) AS max_k
FROM p GROUP BY 1 ORDER BY 1
"""


def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # End-to-end corpus pipeline: clean → quality gate → survivor-policy
    # dedup → per-lang stats. Each stage is an independently oracle-
    # checked operator; this query checks their COMPOSITION (stage
    # coupling bugs — schema drift, filter ordering — don't hide).
    from big_data_in_agriculture_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id", "lang", TX.mask_pii(TX.strip_html("text")).alias("text")
    )
    gated = (
        llm.quality_filter(cleaned)
        .filter(F.col("keep") == 1)
        .select("doc_id", "n_tokens")
        .join(cleaned, "doc_id")
    )
    surviving = llm.dedup_keep_best(gated)
    return (
        surviving.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("n_tokens").cast("float").alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def _llm_pipeline_sql() -> str:
    # cleaning replays TX.mask_pii(TX.strip_html(...)) via the shared
    # _pii_mask_sql chain (defined with the pii_scan oracle)
    from big_data_in_agriculture_spark.functions.text import HTML_TAG_PATTERN

    stripped = (
        f"trim(regexp_replace(regexp_replace(text, '{HTML_TAG_PATTERN}',"
        " ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
WITH cleaned AS (
    SELECT doc_id, lang,
           {_pii_mask_sql(stripped)} AS text
    FROM documents
),
gated AS (
    SELECT doc_id, lang, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dr
    FROM cleaned
),
kept AS (
    SELECT * FROM gated
    WHERE n_tokens >= 20 AND n_tokens <= 90 AND dr >= 0.40
),
scored AS (
    SELECT doc_id, lang, n_tokens,
           sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
           ((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS q
    FROM kept
),
ranked AS (
    SELECT doc_id, lang, n_tokens,
           row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn
    FROM scored
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(avg(n_tokens) AS FLOAT) AS avg_tokens
FROM ranked WHERE rn = 1
GROUP BY 1 ORDER BY 1
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import value_histogram

    return value_histogram(
        _t(spark, sf_dir, "events").select("value"), "value", bins=20
    )


_HISTOGRAM_SQL = """
WITH ev AS (
    -- neither NULL nor NaN can be binned; excluded (Spark side
    -- filters too — otherwise NULL-skipping least() put NULLs in the
    -- LAST bin on both engines)
    SELECT * FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
stats AS (
    SELECT CAST(min(value) AS DOUBLE) AS mn,
           CAST(max(value) AS DOUBLE) AS mx
    FROM ev
),
binned AS (
    -- mx = mn (constant / single-value column) collapses to bin 0 on
    -- both engines; without the guard DuckDB's NULL-ignoring least()
    -- would silently put the value in the LAST bin
    SELECT CASE WHEN mx > mn
                THEN least(CAST(floor((value - mn) / ((mx - mn) / 20.0))
                           AS BIGINT), 19)
                ELSE 0 END AS bin_id,
           mn, mx
    FROM ev CROSS JOIN stats
)
SELECT bin_id,
       CAST(any_value(mn) + bin_id * (any_value(mx) - any_value(mn)) / 20.0
            AS FLOAT) AS bin_lo,
       count(*) AS n
FROM binned GROUP BY 1 ORDER BY 1
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = llm.hash_split(_t(spark, sf_dir, "documents"))
    return (
        out.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


_HASH_SPLIT_SQL = """
SELECT CASE WHEN doc_id % 10 < 1 THEN 'test' ELSE 'train' END AS split,
       lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase")
    )
    daily = timeseries.daily_series(ev, "user_id", "ts", "value")
    out = timeseries.ema(daily, alpha=0.3)
    return out.select(
        F.col("key").alias("user_id"),
        "day",
        F.col("value").cast("float").alias("value"),
        F.col("ema").cast("float").alias("ema"),
    ).orderBy("user_id", "day")


# Closed form of the adjust=False recurrence:
#   y_t = (1-a)^t * (a * SUM_{i=1..t} x_i (1-a)^{-i} + x_0)
# — an independent derivation, so the Python-island recurrence is
# cross-checked by pure SQL window math.
_EMA_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS v
    FROM events
    WHERE user_id < 20 AND event_type = 'purchase'
    GROUP BY 1, 2
),
o AS (
    SELECT user_id, day, v,
           row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS t
    FROM daily
)
SELECT user_id, day,
       CAST(v AS FLOAT) AS value,
       CAST(power(0.7, t) * (
            0.3 * coalesce(sum(CASE WHEN t > 0 THEN v * power(0.7, -t) END)
                  OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
            + first_value(v) OVER (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            AS FLOAT) AS ema
FROM o
ORDER BY user_id, day
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import retention_cohorts

    out = retention_cohorts(_t(spark, sf_dir, "events"), max_weeks=8)
    return _date_as_ts(out, "cohort_week")


_RETENTION_SQL = """
WITH first AS (
    SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
    FROM events GROUP BY 1
),
cells AS (
    SELECT cohort_week,
           CAST(floor(date_diff('day', cohort_week,
                                date_trunc('week', ts)) / 7) AS BIGINT)
               AS week_n,
           e.user_id
    FROM events e JOIN first USING (user_id)
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_n,
       count(DISTINCT user_id) AS n_users
FROM cells
WHERE week_n < 8
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import funnel_conversion

    return funnel_conversion(
        _t(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


_FUNNEL_SQL = """
WITH relevant AS (
    SELECT user_id, event_type, ts FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t1
    FROM relevant GROUP BY 1
),
s2 AS (
    SELECT r.user_id, any_value(t1) AS t1,
           min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END) AS t2
    FROM relevant r JOIN s1 USING (user_id) GROUP BY 1
),
s3 AS (
    SELECT r.user_id, any_value(t1) AS t1, any_value(t2) AS t2,
           min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END) AS t3
    FROM relevant r JOIN s2 USING (user_id) GROUP BY 1
)
SELECT count(t1) AS n_step1, count(t2) AS n_step2, count(t3) AS n_step3
FROM s3
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


_TFIDF_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM tok WHERE token <> '' GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf,
           tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf_d
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, token, tf, tfidf_d,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf_d DESC, token) AS rank
    FROM scored
)
SELECT doc_id, token, tf, CAST(tfidf_d AS FLOAT) AS tfidf, rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.bm25_search(
        _t(spark, sf_dir, "documents"), "hash join filter", top_k=10
    )


_BM25_SQL = """
WITH base AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
           CAST(len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS DOUBLE) AS tf0,
           CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS DOUBLE) AS tf1,
           CAST(len(list_filter(string_split(text, ' '), x -> x = 'filter')) AS DOUBLE) AS tf2
    FROM documents
),
stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           sum(dl) AS total_len,
           sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
           sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
           sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
    FROM base
),
scored AS (
    SELECT b.doc_id,
           (0.0
            + ln(1.0 + (s.n_docs - s.df0 + 0.5) / (s.df0 + 0.5))
              * (b.tf0 * 2.2 / (b.tf0 + 1.2 * (0.25 + 0.75 * b.dl / (s.total_len / s.n_docs))))
            + ln(1.0 + (s.n_docs - s.df1 + 0.5) / (s.df1 + 0.5))
              * (b.tf1 * 2.2 / (b.tf1 + 1.2 * (0.25 + 0.75 * b.dl / (s.total_len / s.n_docs))))
            + ln(1.0 + (s.n_docs - s.df2 + 0.5) / (s.df2 + 0.5))
              * (b.tf2 * 2.2 / (b.tf2 + 1.2 * (0.25 + 0.75 * b.dl / (s.total_len / s.n_docs))))
           ) AS score_d
    FROM base b CROSS JOIN stats s
)
SELECT doc_id, CAST(score_d AS FLOAT) AS score,
       CAST(row_number() OVER (ORDER BY score_d DESC, doc_id) AS BIGINT) AS rank
FROM scored WHERE score_d > 0
ORDER BY score_d DESC, doc_id LIMIT 10
"""



def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same oracle as bm25_search: the indexed scorer is engineered to
    # be bit-identical to the scan-time scorer (exact-integer stats,
    # fixed-order float math) — one build, point-lookup queries after.
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bm25idx-")
    llm.build_inverted_index(_t(spark, sf_dir, "documents"), tmp)
    return llm.bm25_search_indexed(spark, tmp, "hash join filter", top_k=10)



def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.epoch_shuffle(_t(spark, sf_dir, "documents"), seed=7)


_EPOCH_SHUFFLE_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (
            ORDER BY md5('7:' || CAST(doc_id AS VARCHAR))) - 1 AS BIGINT)
           AS pos
FROM documents
"""



def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Flesch reading ease from whitespace words, sentence punctuation
    # (planted — synthetic docs carry none), and vowel-group syllable
    # estimates. Integer counts → one fixed-order double formula,
    # ROUND 2 + float32.
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(". "), F.col("text"), F.lit("!")
        ).alias("text"),
    )
    words = F.size(F.split(F.col("text"), " ")).cast("double")
    sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")),
        F.lit(1),
    ).cast("double")
    sylls = F.greatest(
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    ).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sents)
        - F.lit(84.6) * (sylls / words)
    )
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        # floor-based half-up (NOT F.round): ratios of small integers
        # land EXACTLY on .xx5 doubles (here 44/36 → 85.164999…), where
        # Spark's BigDecimal HALF_UP and DuckDB's round() disagree.
        # floor(x*100 + 0.5)/100 is the same IEEE op sequence in both
        # engines → bit-identical at every boundary.
        (F.floor(flesch * 100 + F.lit(0.5)) / 100).cast("float").alias("flesch"),
    )


_READABILITY_SQL = """
WITH base AS (
    SELECT doc_id, text || '. ' || text || '!' AS text FROM documents
),
counts AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
                AS DOUBLE) AS sents,
           CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                AS DOUBLE) AS sylls
    FROM base
)
SELECT doc_id,
       CAST(words AS BIGINT) AS n_words,
       CAST(sents AS BIGINT) AS n_sentences,
       CAST(sylls AS BIGINT) AS n_syllables,
       -- floor-based half-up, mirroring the Spark side: engine round()
       -- semantics diverge on exact .xx5 doubles
       CAST(floor((206.835 - 1.015 * (words / sents)
                   - 84.6 * (sylls / words)) * 100 + 0.5) / 100
            AS FLOAT) AS flesch
FROM counts
"""



def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant subset-duplication: wrapper docs embed docs 0-2 verbatim
    # plus fresh trailing prose — high containment, low Jaccard, the
    # case the symmetric near-dup measures miss
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    wrapper = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" completely new trailing commentary appended here"),
        ).alias("text"),
    )
    return llm.containment_pairs(
        docs.unionByName(wrapper), threshold=0.8, k=3
    )


_CONTAINMENT_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           text || ' completely new trailing commentary appended here'
               AS text
    FROM documents WHERE doc_id < 3
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
shingled AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          FOR i IN range(1, greatest(len(t) - 2, 1) + 1)]) AS sh
    FROM toks
),
exploded AS (
    SELECT doc_id, len(sh) AS set_size, unnest(sh) AS shingle FROM shingled
),
shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.set_size AS na, b.set_size AS nb, count(*) AS inter
    FROM exploded a JOIN exploded b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
),
directed AS (
    SELECT id_a AS contained, id_b AS container,
           CAST(inter AS DOUBLE) / na AS c FROM shared
    UNION ALL
    SELECT id_b AS contained, id_a AS container,
           CAST(inter AS DOUBLE) / nb AS c FROM shared
)
SELECT contained, container, CAST(c AS FLOAT) AS containment
FROM directed WHERE c >= 0.8
ORDER BY contained, container
"""



def q_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weight = n_chars: longer docs proportionally likelier
    return llm.weighted_topk_sample(
        _t(spark, sf_dir, "documents"), "n_chars", k=50
    )


_WEIGHTED_TOPK_SQL = """
WITH keyed AS (
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
           ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               + 1.0) / 4294967297.0) / CAST(n_chars AS DOUBLE) AS sk
    FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, CAST(round(sk, 10) AS FLOAT) AS sample_key
FROM keyed ORDER BY sk DESC, doc_id LIMIT 50
"""



def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-linguistics health check: OLS slope of ln(freq) vs
    # ln(rank) over the top-100 tokens (Zipf predicts ~ -1). Reuses the
    # sufficient-stats closed form (see timeseries.grouped_trend);
    # counts are exact integers so both engines see identical (x, y)
    # points and the rounded slope matches.
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("t")) \
        .filter(F.col("t") != "")
    from pyspark.sql import Window

    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("t"))
    top = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 100
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("f").cast("double"))
    s = top.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_tokens_fit"),
        F.round(slope, 4).cast("float").alias("zipf_slope"),
    )


_ZIPF_SQL = """
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
freq AS (
    SELECT t, count(*) AS f FROM tok WHERE t <> '' GROUP BY 1
),
top AS (
    SELECT f, row_number() OVER (ORDER BY f DESC, t) AS rank FROM freq
    QUALIFY rank <= 100
),
s AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           sum(ln(CAST(rank AS DOUBLE))) AS sx,
           sum(ln(CAST(f AS DOUBLE))) AS sy,
           sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(f AS DOUBLE))) AS sxy,
           sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) AS sxx
    FROM top
)
SELECT CAST(n AS BIGINT) AS n_tokens_fit,
       CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS FLOAT)
           AS zipf_slope
FROM s
"""


def q_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vocabulary-richness: share of vocab seen exactly once (hapax
    # legomena) and once-or-twice (dis) — exact integer ratios
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("t")) \
        .filter(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    return freq.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("f") == 1).cast("long")).alias("n_hapax"),
        F.round(
            F.sum((F.col("f") == 1).cast("double")) / F.count(F.lit(1)), 6
        ).cast("float").alias("hapax_rate"),
    )


_HAPAX_SQL = """
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
freq AS (SELECT t, count(*) AS f FROM tok WHERE t <> '' GROUP BY 1)
SELECT count(*) AS vocab_size,
       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(round(sum(CASE WHEN f = 1 THEN 1.0 ELSE 0.0 END) / count(*), 6)
            AS FLOAT) AS hapax_rate
FROM freq
"""



def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distribution of exact-duplicate cluster sizes — the dedup
    # dashboard number ("how much of the corpus is 2x, 3x, Nx
    # duplicated"). Duplicates planted: every 25th doc replicated
    # twice under offset ids → clusters of size 3.
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup1 = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    dup2 = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup1).unionByName(dup2)
    sizes = corpus.groupBy(F.sha2("text", 256).alias("_h")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


_DUP_HIST_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 25 = 0
    UNION ALL
    SELECT doc_id + 4000000, text FROM documents WHERE doc_id % 25 = 0
),
sizes AS (
    SELECT sha256(text) AS h, count(*) AS cluster_size
    FROM corpus GROUP BY 1
)
SELECT cluster_size, count(*) AS n_clusters
FROM sizes GROUP BY 1 ORDER BY 1
"""



def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.substring_dedup(_t(spark, sf_dir, "documents"), k=6)


_SUBSTR_DEDUP_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE text IS NOT NULL),
grams AS (
    SELECT doc_id, i + 1 AS pos, md5(array_to_string(t[i+1:i+6], ' ')) AS gh
    FROM toks, unnest(range(CASE WHEN len(t) >= 6 THEN len(t) - 5 ELSE 0 END)) u(i)
),
hot AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
covered AS (
    SELECT DISTINCT g.doc_id, g.pos + j AS idx   -- 1-based token index
    FROM grams g JOIN hot USING (gh), unnest(range(6)) r(j)
),
tokpos AS (
    SELECT doc_id, i + 1 AS idx, t[i+1] AS tok
    FROM toks, unnest(range(len(t))) u(i)
),
kept AS (
    SELECT tp.doc_id, tp.idx, tp.tok
    FROM tokpos tp ANTI JOIN covered c
      ON tp.doc_id = c.doc_id AND tp.idx = c.idx
)
SELECT d.doc_id,
       coalesce(k.clean_text, '') AS clean_text,
       coalesce(c.n_removed, 0) AS n_removed
FROM documents d
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
           FROM kept GROUP BY doc_id) k USING (doc_id)
LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
           FROM covered GROUP BY doc_id) c USING (doc_id)
WHERE d.text IS NOT NULL  -- excluded on both engines (no content)
"""



_REGION_BBOXES = [
    # region, N, W, S, E — /root/reference/config/regions.yaml:1-8
    ("bashkortostan", 56.6, 53.1, 51.6, 59.9),
    ("belarus", 56.2, 23.1, 51.2, 32.8),
    ("moscow_oblast", 56.90, 34.80, 54.20, 40.80),
    ("krasnodar", 46.30, 37.20, 43.20, 41.40),
]


def q_point_in_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spatial containment tag (reference C8 generalized): derive a
    # deterministic (lat, lon) per event, join against the reference's
    # region bboxes via the lat-banded equi-join. All-double math is
    # products/fmod of identical inputs — bit-identical across engines.
    ev = _t(spark, sf_dir, "events")
    # integer-hash lat/lon (exact, engine-portable); DISTINCT generators
    # per axis — correlated axes would make containment vacuously empty
    pts = ev.select(
        "event_id",
        (((F.col("event_id") * 7919) % 12000) / 100.0 - 60.0).alias("lat"),
        (((F.col("user_id") * 104729 + F.col("event_id")) % 36000) / 100.0
         - 180.0).alias("lon"),
    )
    boxes = spark.createDataFrame(
        _REGION_BBOXES, ["region", "north", "west", "south", "east"]
    )
    return relational.point_in_bbox_join(pts, boxes).select(
        "event_id", "lat", "lon", "region"
    )


_POINT_BBOX_SQL = """
WITH pts AS (
    SELECT event_id,
           ((event_id * 7919) % 12000) / 100.0 - 60.0 AS lat,
           ((user_id * 104729 + event_id) % 36000) / 100.0 - 180.0 AS lon
    FROM events
),
boxes(region, north, west, south, east) AS (
    VALUES ('bashkortostan', 56.6, 53.1, 51.6, 59.9),
           ('belarus', 56.2, 23.1, 51.2, 32.8),
           ('moscow_oblast', 56.90, 34.80, 54.20, 40.80),
           ('krasnodar', 46.30, 37.20, 43.20, 41.40)
)
SELECT event_id, lat, lon, region
FROM pts JOIN boxes
  ON lat >= south AND lat <= north AND lon >= west AND lon <= east
"""



def q_diurnal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.timeseries import (
        diurnal_anomaly,
    )

    return diurnal_anomaly(
        _t(spark, sf_dir, "events"), "event_type"
    ).withColumnRenamed("ts", "obs_ts")


_DIURNAL_SQL = """
WITH normals AS (
    SELECT event_type, hour(ts) AS hod, avg(value) AS normal_d
    FROM events GROUP BY 1, 2
)
SELECT e.event_type, e.ts AS obs_ts, e.value,
       CAST(n.normal_d AS FLOAT) AS normal,
       CAST(e.value - n.normal_d AS FLOAT) AS anomaly
FROM events e JOIN normals n
  ON e.event_type = n.event_type AND hour(e.ts) = n.hod
"""



def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.copurchase_pairs(_t(spark, sf_dir, "lineitem"))


_COPURCHASE_SQL = """
WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM parts a JOIN parts b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY n_orders DESC, part_a, part_b LIMIT 50
"""


def q_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.qoq_growth(_t(spark, sf_dir, "orders"))


_QOQ_SQL = """
WITH spend AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) AS VARCHAR) || '-Q'
               || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
           year(o_orderdate) * 4 + quarter(o_orderdate) AS qidx,
           sum(o_totalprice) AS spend
    FROM orders GROUP BY 1, 2, 3
),
lagged AS (
    SELECT o_custkey, quarter, spend,
           CASE WHEN qidx - lag(qidx) OVER w = 1
                THEN lag(spend) OVER w END AS prev_spend
    FROM spend
    WINDOW w AS (PARTITION BY o_custkey ORDER BY qidx)
)
SELECT o_custkey, quarter,
       CAST(spend AS FLOAT) AS spend,
       CAST(prev_spend AS FLOAT) AS prev_spend,
       CAST(round((spend - prev_spend) / prev_spend, 4) AS FLOAT) AS growth
FROM lagged
WHERE prev_spend IS NOT NULL
  AND CAST(round((spend - prev_spend) / prev_spend, 4) AS FLOAT) >= 0.2
ORDER BY o_custkey, quarter
"""


def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pareto_contribution(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
    )


_PARETO_SQL = """
WITH rev AS (
    SELECT n.n_name AS nation, l.l_partkey,
           sum(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT *,
           sum(revenue) OVER (PARTITION BY nation) AS total,
           coalesce(sum(revenue) OVER (
               PARTITION BY nation ORDER BY revenue DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS before
    FROM rev
)
SELECT nation, l_partkey,
       CAST(revenue AS FLOAT) AS revenue,
       CAST(round((before + revenue) / total, 4) AS FLOAT) AS cum_share
FROM ranked WHERE before / total < 0.8
ORDER BY nation, revenue DESC, l_partkey
"""



def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.association_rules(_t(spark, sf_dir, "lineitem"))


_ASSOC_SQL = """
WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM parts),
item AS (SELECT l_partkey AS item, count(*) AS item_orders FROM parts GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS pair_orders
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
),
directed AS (
    SELECT x AS antecedent, y AS consequent, pair_orders FROM pairs
    UNION ALL
    SELECT y AS antecedent, x AS consequent, pair_orders FROM pairs
)
SELECT d.antecedent, d.consequent, d.pair_orders,
       CAST(round(d.pair_orders / (SELECT n_orders FROM n), 6) AS FLOAT) AS support,
       CAST(round(CAST(d.pair_orders AS DOUBLE) / ia.item_orders, 6) AS FLOAT) AS confidence,
       CAST(round((d.pair_orders * (SELECT n_orders FROM n))
                  / (CAST(ia.item_orders AS DOUBLE) * ic.item_orders), 6) AS FLOAT) AS lift
FROM directed d
JOIN item ia ON d.antecedent = ia.item
JOIN item ic ON d.consequent = ic.item
ORDER BY confidence DESC, antecedent, consequent LIMIT 50
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.rfm_segments(_t(spark, sf_dir, "orders"))


_RFM_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           datediff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-12-31')
               AS recency_days,
           count(*) AS frequency,
           sum(o_totalprice) AS monetary
    FROM orders GROUP BY 1
)
SELECT o_custkey, recency_days, frequency,
       CAST(monetary AS FLOAT) AS monetary,
       ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
       ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
       ntile(4) OVER (ORDER BY CAST(round(monetary * 100) AS BIGINT) DESC,
                      o_custkey) AS m_score
FROM per_cust
ORDER BY o_custkey
"""



def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triangle counts on the co-purchase graph (pairs sharing >= 2
    # orders) — graph built once from lineitem, triangles from the
    # edge table alone
    li = _t(spark, sf_dir, "lineitem")
    parts = li.select("l_orderkey", "l_partkey").distinct()
    a = parts.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = parts.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return relational.triangle_participation(edges)


_TRIANGLES_SQL = """
WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
),
tris AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
)
SELECT node, count(*) AS n_triangles
FROM corners GROUP BY 1
ORDER BY n_triangles DESC, node LIMIT 50
"""



def q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import (
        trending_items,
    )

    return trending_items(
        _t(spark, sf_dir, "events"), "6 hours", "2 hours", top_k=3
    )


_TRENDING_SQL = """
WITH win AS (
    SELECT make_timestamp(((CAST(floor(epoch(ts) / 7200) AS BIGINT) - i)
                           * 7200) * 1000000) AS window_start,
           event_type AS item
    FROM events CROSS JOIN (SELECT unnest(range(3)) AS i)
    WHERE ts IS NOT NULL  -- unwindowable; Spark's window() drops them
),
counts AS (
    SELECT window_start, item, count(*) AS n_events
    FROM win GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY window_start
                                 ORDER BY n_events DESC, item) AS rank
    FROM counts
)
SELECT window_start, item, n_events, rank
FROM ranked WHERE rank <= 3
ORDER BY window_start, rank
"""



def q_seasonal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.timeseries import (
        seasonal_envelope,
    )

    return seasonal_envelope(_t(spark, sf_dir, "events"), "event_type")


_SEASONAL_SQL = """
SELECT event_type, hour(ts) AS hour_of_day, count(*) AS n_obs,
       CAST(quantile_cont(value, 0.1) AS FLOAT) AS p_lo,
       CAST(quantile_cont(value, 0.5) AS FLOAT) AS p_mid,
       CAST(quantile_cont(value, 0.9) AS FLOAT) AS p_hi
FROM events
WHERE value IS NULL OR NOT isnan(value)  -- NaN excluded; NULLs keep
  -- their pre-existing both-engine semantics (Spark isnan(NULL) is
  -- false, DuckDB's is NULL -- the bare NOT isnan dropped NULLs on
  -- one engine only)
GROUP BY 1, 2
ORDER BY event_type, hour_of_day
"""


def q_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fraction of line items shipped within 30/60 days of order, per
    # order priority — conditional aggregates on one joined scan
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.avg((lag_days <= 30).cast("double")), 6
            ).cast("float").alias("within_30d"),
            F.round(
                F.avg((lag_days <= 60).cast("double")), 6
            ).cast("float").alias("within_60d"),
        )
        .orderBy("o_orderpriority")
    )


_SHIP_SLA_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(round(avg(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                          CAST(l_shipdate AS DATE)) <= 30
                           THEN 1.0 ELSE 0.0 END), 6) AS FLOAT) AS within_30d,
       CAST(round(avg(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                          CAST(l_shipdate AS DATE)) <= 60
                           THEN 1.0 ELSE 0.0 END), 6) AS FLOAT) AS within_60d
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""



def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gini coefficient of per-customer spend: the classic inequality
    # KPI. G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending-sorted spend
    # (custkey tie-break; ranks and the formula are exact given the
    # same x order — spend ordered by exact integer cents like RFM).
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    cents = F.round(F.col("x") * 100).cast("long")
    w = Window.orderBy(cents.asc(), F.col("o_custkey"))
    ranked = spend.withColumn("i", F.row_number().over(w).cast("double"))
    g = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    gini = (
        F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
        - (F.col("n") + 1.0) / F.col("n")
    )
    return g.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(gini, 4).cast("float").alias("gini"),
    )


_GINI_SQL = """
WITH spend AS (
    SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1
),
ranked AS (
    SELECT x,
           CAST(row_number() OVER (
               ORDER BY CAST(round(x * 100) AS BIGINT) ASC, o_custkey)
               AS DOUBLE) AS i
    FROM spend
),
s AS (
    SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
           sum(i * x) AS six
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(round(2.0 * six / (n * sx) - (n + 1.0) / n, 4) AS FLOAT) AS gini
FROM s
"""



def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-event-type value trend over time: x = days since epoch
    from big_data_in_agriculture_spark.operators.timeseries import grouped_trend

    # center x near the data (days since 2024-01-01): raw days-since-
    # epoch (~2e4) makes n·Σx² − (Σx)² cancel ~10 significant digits,
    # amplifying last-ulp sum differences past float32
    ev = _t(spark, sf_dir, "events").withColumn(
        "x_day",
        ((F.unix_timestamp("ts") - F.lit(1704067200)) / F.lit(86400.0)),
    )
    return grouped_trend(ev, ["event_type"], "x_day", "value")


_GROUPED_TREND_SQL = """
WITH base AS (
    SELECT event_type,
           (epoch(ts) - 1704067200) / 86400.0 AS x,
           CAST(value AS DOUBLE) AS y
    FROM events
),
s AS (
    SELECT event_type,
           count(*) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM base GROUP BY 1
)
SELECT event_type, n,
       CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS FLOAT) AS slope,
       CAST(round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
            AS FLOAT) AS intercept,
       CAST(round(CASE WHEN (n * syy - sy * sy) > 0
                 THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            END, 6) AS FLOAT) AS r2
FROM s
WHERE n >= 2 AND (n * sxx - sx * sx) > 0
ORDER BY event_type
"""



def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # downsample the dominant language, keep the rest whole — the
    # corpus-rebalancing move; md5-threshold draw is engine-portable
    out = llm.stratified_sample(
        _t(spark, sf_dir, "documents"),
        rates={"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0},
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def _stratified_sql() -> str:
    from big_data_in_agriculture_spark.operators.llm import _rate_threshold

    t_en = _rate_threshold(0.25)
    t_all = _rate_threshold(1.0)
    cases = " ".join(
        f"WHEN lang = '{s}' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t}'"
        for s, t in [
            ("de", t_all), ("en", t_en), ("es", t_all),
            ("fr", t_all), ("zh", t_all),
        ]
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE CASE {cases} ELSE FALSE END
ORDER BY doc_id
"""


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = llm.group_sample(
        _t(spark, sf_dir, "documents"), group_col="lang", k=10
    )
    return out.select("lang", "doc_id").orderBy("lang", "doc_id")


_GROUP_SAMPLE_SQL = """
WITH ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ) AS rn
    FROM documents
)
SELECT lang, doc_id FROM ranked WHERE rn <= 10
ORDER BY lang, doc_id
"""


def q_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import check_constraints

    li = _t(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        {
            "discount_le_5pct": F.col("l_discount") <= 0.05,
            "quantity_le_45": F.col("l_quantity") <= 45,
            "quantity_positive": F.col("l_quantity") >= 1,
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        },
    )


_CHECK_CONSTRAINTS_SQL = """
WITH agg AS (
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN l_discount <= 0.05 THEN 0 ELSE 1 END) AS BIGINT) AS c_disc,
           CAST(sum(CASE WHEN l_quantity <= 45 THEN 0 ELSE 1 END) AS BIGINT) AS c_q45,
           CAST(sum(CASE WHEN l_quantity >= 1 THEN 0 ELSE 1 END) AS BIGINT) AS c_qpos,
           CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS c_ship
    FROM lineitem
)
SELECT check_name, n_violations, n_rows,
       CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
FROM (
    SELECT 'discount_le_5pct' AS check_name, c_disc AS n_violations, n_rows FROM agg
    UNION ALL SELECT 'quantity_le_45', c_q45, n_rows FROM agg
    UNION ALL SELECT 'quantity_positive', c_qpos, n_rows FROM agg
    UNION ALL SELECT 'shipdate_not_null', c_ship, n_rows FROM agg
)
ORDER BY check_name
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS from_type
    FROM events
),
pairs AS (
    SELECT from_type, event_type AS to_type, count(*) AS n
    FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
           AS p_transition
FROM pairs
ORDER BY from_type, to_type
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plant contamination deterministically: the eval set is a per-lang
    # group_sample whose text is truncated to the first half of the
    # tokens — every eval doc shares shingles with its (still-in-train)
    # origin, so the report must recover exactly those origin docs.
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    half = (
        "array_join(slice(split(text, ' '), 1, "
        "greatest(cast(size(split(text, ' ')) / 2 as int), 1)), ' ')"
    )
    eval_docs = llm.group_sample(docs, group_col="lang", k=4).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(half).alias("text"),
    )
    return llm.contamination(docs, eval_docs, k=3, min_common=3)


_CONTAMINATION_SQL = """
WITH ranked AS (
    SELECT lang, doc_id, text,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
           ) AS rn
    FROM documents
),
eval AS (
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM ranked WHERE rn <= 4)
),
tr_sh AS (
    SELECT doc_id AS train_id,
           unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                  FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM eval))
),
ev_sh AS (
    SELECT doc_id AS eval_id,
           unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                  FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM eval)
),
pairs AS (
    SELECT train_id, eval_id, count(*) AS n_common
    FROM tr_sh JOIN ev_sh USING (shingle)
    GROUP BY 1, 2
)
SELECT train_id, count(*) AS n_eval_docs, max(n_common) AS max_common
FROM pairs WHERE n_common >= 3
GROUP BY 1 ORDER BY 1
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.vocab_coverage(_t(spark, sf_dir, "documents"), vocab_size=500)


_VOCAB_COVERAGE_SQL = """
WITH counts AS (
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> '' GROUP BY 1
),
vocab AS (SELECT token FROM counts ORDER BY n DESC, token LIMIT 500),
total AS (
    SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
           count(*) AS n_distinct_tokens
    FROM counts
),
cov AS (
    SELECT CAST(sum(n) AS BIGINT) AS covered_tokens
    FROM counts WHERE token IN (SELECT token FROM vocab)
)
SELECT total_tokens, n_distinct_tokens, covered_tokens,
       CAST(covered_tokens AS DOUBLE) / total_tokens AS coverage
FROM total, cov
"""


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    out = timeseries.rolling_zscore(
        daily, days=7, min_points=3, z_thresh=2.0
    )
    return _date_as_ts(out, "day")


_ROLLING_ZSCORE_SQL = """
WITH daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
),
scored AS (
    SELECT key, day, value,
           avg(value) OVER w AS m,
           stddev_samp(value) OVER w AS sd,
           count(value) OVER w AS n
    FROM daily
    WINDOW w AS (PARTITION BY key ORDER BY epoch(day)
                 RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
)
SELECT key, CAST(day AS TIMESTAMP) AS day, value,
       CAST((value - m) / sd AS FLOAT) AS zscore
FROM scored
WHERE n >= 3 AND sd > 0 AND abs((value - m) / sd) > 2.0
ORDER BY key, day
"""


def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import correlation_matrix

    return correlation_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


_CORRELATION_SQL = """
WITH agg AS (
    SELECT corr(l_quantity, l_extendedprice) AS c0,
           corr(l_quantity, l_discount) AS c1,
           corr(l_quantity, l_tax) AS c2,
           corr(l_extendedprice, l_discount) AS c3,
           corr(l_extendedprice, l_tax) AS c4,
           corr(l_discount, l_tax) AS c5
    FROM lineitem
)
SELECT col_a, col_b, CAST(c AS FLOAT) AS corr
FROM (
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, c0 AS c FROM agg
    UNION ALL SELECT 'l_quantity', 'l_discount', c1 FROM agg
    UNION ALL SELECT 'l_quantity', 'l_tax', c2 FROM agg
    UNION ALL SELECT 'l_extendedprice', 'l_discount', c3 FROM agg
    UNION ALL SELECT 'l_extendedprice', 'l_tax', c4 FROM agg
    UNION ALL SELECT 'l_discount', 'l_tax', c5 FROM agg
)
ORDER BY col_a, col_b
"""


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import quantile_bins

    return quantile_bins(_t(spark, sf_dir, "lineitem"), "l_extendedprice", bins=8)


_QUANTILE_BINS_SQL = """
WITH bounds AS (
    SELECT [round(b, 4) FOR b IN quantile_cont(l_extendedprice,
            [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])] AS q
    FROM lineitem
)
SELECT len(list_filter(q, b -> l_extendedprice > b)) AS bin_id,
       count(*) AS n,
       CAST(min(l_extendedprice) AS FLOAT) AS bin_min
FROM lineitem, bounds
GROUP BY 1 ORDER BY 1
"""


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.lang_confusion(_t(spark, sf_dir, "documents"))


def _lang_confusion_sql() -> str:
    from big_data_in_agriculture_spark.functions.text import LANG_MARKERS

    score = {
        lang: (
            "len(list_filter(string_split(text, ' '), "
            f"t -> lower(t) IN ({', '.join(repr(m) for m in words)})))"
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join(f's_{lang}' for lang in langs)})"
    case = "CASE "
    for lang in langs:  # first max wins, insertion order
        case += f"WHEN s_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return f"""
WITH scored AS (
    SELECT doc_id, lang, text, {scores_sql} FROM documents
),
with_best AS (
    SELECT *, {best} AS best FROM scored
),
cells AS (
    SELECT lang AS lang_label, {case} AS lang_pred, count(*) AS n
    FROM with_best GROUP BY 1, 2
)
SELECT lang_label, lang_pred, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang_label) AS rate
FROM cells
ORDER BY lang_label, lang_pred
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    out = llm.weighted_sample(docs, quality_score("text") / F.lit(10.0))
    return out.select("doc_id", "lang").orderBy("doc_id")


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       / 4294967296.0)
      < greatest(0.0, least(1.0,
          (((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE))) / 10.0))
ORDER BY doc_id
"""


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_dim_stats(_t(spark, sf_dir, "embeddings"))


_EMBEDDING_DIM_STATS_SQL = f"""
SELECT i AS dim,
       CAST(avg(v) AS FLOAT) AS mean,
       CAST(stddev_samp(v) AS FLOAT) AS std,
       CAST(min(v) AS FLOAT) AS vmin,
       CAST(max(v) AS FLOAT) AS vmax
FROM (SELECT generate_subscripts(embedding, 1) AS i,
             unnest(embedding) AS v
      -- invalid embeddings excluded (vec_is_valid convention): one
      -- NaN component would poison its dimension's mean/std
      FROM embeddings WHERE {_VALID_VEC})
GROUP BY 1 ORDER BY 1
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events as a keyed changelog: per user, the last event wins;
    # a final 'error' event deletes the key.
    from big_data_in_agriculture_spark.operators.cdc import cdc_apply

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    out = cdc_apply(ev, "user_id", "ts", "event_id", "op")
    return out.select("user_id", "ts", "value").orderBy("user_id")


_CDC_APPLY_SQL = """
WITH ranked AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, ts, value FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY user_id
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = scd2_history(ev, "user_id", "ts", "event_id")
    return out.select(
        "user_id", "event_id", "value", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from", "event_id")


_SCD2_SQL = """
SELECT user_id, event_id, value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM events
ORDER BY user_id, valid_from, event_id
"""


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import (
        cumulative_unique_users,
    )

    out = cumulative_unique_users(_t(spark, sf_dir, "events"))
    return _date_as_ts(out, "day")


_CUMULATIVE_USERS_SQL = """
WITH first_seen AS (
    SELECT event_type AS segment, user_id,
           date_trunc('day', min(ts)) AS day
    FROM events
    WHERE ts IS NOT NULL  -- no day to place the user on; Spark filters too
    GROUP BY 1, 2
),
per_day AS (
    SELECT segment, day, count(*) AS new_users
    FROM first_seen GROUP BY 1, 2
)
SELECT segment, CAST(day AS TIMESTAMP) AS day, new_users,
       CAST(sum(new_users) OVER (PARTITION BY segment ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_users
FROM per_day
ORDER BY segment, day
"""


def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.analytics import debounce_events

    out = debounce_events(_t(spark, sf_dir, "events"), gap_seconds=172_800)
    return out.select("event_id", "user_id", "event_type", "ts").orderBy(
        "event_id"
    )


_DEBOUNCE_SQL = """
WITH g AS (
    SELECT event_id, user_id, event_type, ts,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS gap
    FROM events
)
SELECT event_id, user_id, event_type, ts FROM g
WHERE gap IS NULL OR gap >= 172800000000::BIGINT
ORDER BY event_id
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-2 composition: stratified downsample → quality gate →
    # keep-best dedup → contamination drop (vs a planted eval set) →
    # deterministic split → per-(lang, split) stats. Every stage is an
    # independently oracle-checked operator; this checks the WHOLE
    # curation plan as one declarative composition.
    from big_data_in_agriculture_spark.operators.llm import (
        contamination,
        group_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sampled = llm.stratified_sample(
        docs, rates={"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    )
    gated = (
        llm.quality_filter(sampled)
        .filter(F.col("keep") == 1)
        .select("doc_id", "n_tokens")
        .join(sampled, "doc_id")
    )
    survivors = llm.dedup_keep_best(gated)
    half = (
        "array_join(slice(split(text, ' '), 1, "
        "greatest(cast(size(split(text, ' ')) / 2 as int), 1)), ' ')"
    )
    eval_docs = group_sample(docs, group_col="lang", k=4).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(half).alias("text"),
    )
    flagged = contamination(survivors, eval_docs, min_common=3).select(
        F.col("train_id").alias("doc_id")
    )
    final = llm.hash_split(survivors.join(flagged, "doc_id", "left_anti"))
    return (
        final.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang", "split")
    )


def _curation_sql() -> str:
    from big_data_in_agriculture_spark.operators.llm import _rate_threshold

    t_en, t_all = _rate_threshold(0.5), _rate_threshold(1.0)
    cases = " ".join(
        f"WHEN lang = '{s}' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t}'"
        for s, t in [
            ("de", t_all), ("en", t_en), ("es", t_all),
            ("fr", t_all), ("zh", t_all),
        ]
    )
    return f"""
WITH sampled AS (
    SELECT doc_id, lang, text FROM documents
    WHERE CASE {cases} ELSE FALSE END
),
gated AS (
    SELECT doc_id, lang, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dr
    FROM sampled
),
kept AS (
    SELECT * FROM gated
    WHERE n_tokens >= 20 AND n_tokens <= 90 AND dr >= 0.40
),
scored AS (
    SELECT doc_id, lang, text, n_tokens,
           sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
           ((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * dr AS q
    FROM kept
),
survivors AS (
    SELECT doc_id, lang, text, n_tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY fp
                                     ORDER BY q DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn = 1
),
eval AS (
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(t[1:greatest(len(t) // 2, 1)], ' ') AS text
    FROM (
        SELECT doc_id, string_split(text, ' ') AS t,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 4
),
tr_sh AS (
    SELECT doc_id AS train_id,
           unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                  FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM survivors
          WHERE doc_id NOT IN (SELECT doc_id FROM eval))
),
ev_sh AS (
    SELECT doc_id AS eval_id,
           unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                  FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM eval)
),
flagged AS (
    SELECT DISTINCT train_id FROM (
        SELECT train_id, eval_id, count(*) AS n_common
        FROM tr_sh JOIN ev_sh USING (shingle)
        GROUP BY 1, 2
    ) WHERE n_common >= 3
)
SELECT lang,
       CASE WHEN doc_id % 10 < 1 THEN 'test' ELSE 'train' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM survivors
WHERE doc_id NOT IN (SELECT train_id FROM flagged)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checked since round 4: tol=0.0 pins the iteration count
    # (no data-dependent early stop) and quantize=6 rounds each
    # centroid update well above float-sum fold-order jitter, so the
    # DuckDB oracle replays the 5 Lloyd iterations as unrolled CTEs
    # bit-identically (_kmeans_clusters_sql). Cluster-quality
    # correctness is still covered by planted-cluster recovery tests.
    emb = _t(spark, sf_dir, "embeddings")
    # r12: fit and assign share ONE pinned (id, vec) scan — the
    # kmeans_fit wrapper pinned its own copy and kmeans_assign then
    # re-scanned the parquet + re-filtered for the identical row set.
    # Same expressions over the same rows: counts and hash unchanged.
    data = similarity._pinned_vectors(emb, "embedding", "vec_id")
    cents = similarity._kmeans_fit_pinned(
        data, k=8, max_iter=5, vec_col="embedding", id_col="vec_id",
        tol=0.0, quantize=6,
    )
    return (
        similarity.kmeans_assign(data, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )


def _quantize_sql(expr: str, q: int) -> str:
    """DuckDB twin of ``operators._util.quantize_half_away``: round
    half-away-from-zero via explicit IEEE ops (abs, scale, +0.5, floor,
    unscale, re-sign) instead of the engine's ``round``. Python rounds
    half-to-even, DuckDB half-away, and exactly-representable decimal
    ties DO exist (0.0078125 at 6 digits) — so BOTH sides run this
    identical op sequence, each step a correctly-rounded double
    primitive, making the quantize bit-identical by construction."""
    scale = float(10 ** q)
    # CAST first: a bare decimal literal would otherwise bind as
    # DECIMAL and overflow the fixed-point multiply; computed doubles
    # pass through unchanged.
    x = f"CAST({expr} AS DOUBLE)"
    return (
        f"(floor(abs({x}) * {scale!r} + 0.5) / {scale!r}"
        f" * sign({x}))"
    )


def _kmeans_cte_chain(
    iters: int, k: int, dim: int, q: int, source: str = "e",
    prefix: str = "",
) -> str:
    """Unrolled-Lloyd CTE chain ``{prefix}c0 .. {prefix}c{iters}`` over
    ``source`` (a CTE with columns vec_id, v DOUBLE[]). ``prefix``
    namespaces the CTEs so several chains can share one WITH clause
    (the PQ oracle runs one chain per subspace).

    Bit-parity contract with ``similarity.kmeans_fit(tol=0.0,
    quantize=q)``: init = k lowest-id vectors (cid in id order);
    distance = the same left-to-right float64 fold over dims
    (list_sum(list_transform) ≡ Spark's aggregate(zip_with)); argmin
    tie-break by cid; per-cluster per-dim mean quantized to ``q``
    decimals via ``_quantize_sql`` — the op-for-op twin of the Python
    side's ``quantize_half_away``, killing sum-fold-order last-ulp
    jitter without the round()-mode mismatch; empty clusters keep
    their previous centroid.
    """
    parts = [
        f"""{prefix}c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
           v AS cv
    FROM (SELECT vec_id, v FROM {source} ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""{prefix}d{i} AS (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(range(1, {dim + 1}),
                    j -> (e.v[j]-c.cv[j])*(e.v[j]-c.cv[j]))) AS d
    FROM {source} e, {prefix}c{i - 1} c
),
{prefix}a{i} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM {prefix}d{i}
    ) WHERE rn = 1
),
{prefix}u{i} AS (
    SELECT a.cid, t.j AS dim,
           {_quantize_sql('sum(e.v[t.j]) / count(*)', q)} AS val
    FROM {prefix}a{i} a JOIN {source} e USING (vec_id), range(1, {dim + 1}) t(j)
    GROUP BY a.cid, t.j
),
{prefix}c{i} AS (
    SELECT cid, array_agg(val ORDER BY dim) AS cv FROM {prefix}u{i} GROUP BY cid
    UNION ALL
    SELECT p.cid, p.cv FROM {prefix}c{i - 1} p
    WHERE p.cid NOT IN (SELECT cid FROM {prefix}u{i})
)"""
        )
    return ",\n".join(parts)


def _kmeans_clusters_sql(
    iters: int = 5, k: int = 8, dim: int = 64, q: int = 6
) -> str:
    """DuckDB replay of q_kmeans_clusters: unrolled Lloyd + final
    assignment + per-cluster counts."""
    return f"""
WITH e AS (
    -- invalid embeddings are excluded at entry (vec_is_valid
    -- convention; pre-r6 a NULL vector silently diluted its
    -- cluster's mean denominator, and one NaN/Inf component would
    -- poison the whole centroid)
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
{_kmeans_cte_chain(iters, k, dim, q)},
df AS (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(range(1, {dim + 1}),
                    j -> (e.v[j]-c.cv[j])*(e.v[j]-c.cv[j]))) AS d
    FROM e, c{iters} c
),
af AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM df
    ) WHERE rn = 1
)
SELECT cluster, count(*) AS n_vectors
FROM af GROUP BY cluster ORDER BY cluster
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import winsorize

    li = _t(spark, sf_dir, "lineitem")
    out = winsorize(li, "l_extendedprice", 0.05, 0.95)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").cast("float").alias("clip_min"),
        F.max("l_extendedprice").cast("float").alias("clip_max"),
        F.avg("l_extendedprice").cast("float").alias("clipped_mean"),
    )


_WINSORIZE_SQL = """
WITH b AS (
    SELECT round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
    FROM lineitem
),
clipped AS (
    SELECT least(greatest(l_extendedprice, b.lo), b.hi) AS v
    FROM lineitem, b
)
SELECT count(*) AS n,
       CAST(min(v) AS FLOAT) AS clip_min,
       CAST(max(v) AS FLOAT) AS clip_max,
       CAST(avg(v) AS FLOAT) AS clipped_mean
FROM clipped
"""


def q_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant missingness: error events lose their value, then impute
    # from the user's own mean over the remaining events
    from big_data_in_agriculture_spark.operators.profile import impute_group_mean

    ev = _t(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    out = impute_group_mean(ev, "user_id", "value")
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("value").alias("n_filled"),
            F.avg("value").cast("float").alias("mean_value"),
        )
        .orderBy("event_type")
    )


_IMPUTE_SQL = """
WITH holed AS (
    SELECT user_id, event_type,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
    FROM events
),
means AS (
    SELECT user_id, avg(value) AS gm FROM holed GROUP BY 1
),
filled AS (
    SELECT h.event_type, coalesce(h.value, m.gm) AS value
    FROM holed h LEFT JOIN means m USING (user_id)
)
SELECT event_type, count(*) AS n,
       count(value) AS n_filled,
       CAST(avg(value) AS FLOAT) AS mean_value
FROM filled
GROUP BY 1 ORDER BY 1
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant a controlled delta: drop ~1% of orders, reprice ~1%, add
    # shifted-key copies; the diff must classify exactly those keys
    from big_data_in_agriculture_spark.operators.cdc import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 101 == 0,
                F.col("o_totalprice") * 2.0,
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    out = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return out.orderBy("o_orderkey")


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice * 2.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM old WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
    FROM old WHERE o_orderkey % 89 = 0
),
j AS (
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.o_orderkey IS NOT NULL AS in_old,
           n.o_orderkey IS NOT NULL AS in_new,
           (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
               OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
               AS changed
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN changed THEN 'changed'
            ELSE 'unchanged' END AS change_type
FROM j
WHERE CASE WHEN NOT in_old THEN 'added'
           WHEN NOT in_new THEN 'removed'
           WHEN changed THEN 'changed'
           ELSE 'unchanged' END <> 'unchanged'
ORDER BY o_orderkey
"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic variant assignment by user id parity — the same
    # append-stable principle as hash_split
    from big_data_in_agriculture_spark.operators.analytics import ab_test_summary

    ev = _t(spark, sf_dir, "events")
    return ab_test_summary(ev, F.col("user_id") % 2 == 0, "value")


_AB_TEST_SQL = """
WITH s AS (
    SELECT count(CASE WHEN user_id % 2 = 0 THEN value END) AS n_a,
           count(CASE WHEN user_id % 2 <> 0 THEN value END) AS n_b,
           avg(CASE WHEN user_id % 2 = 0 THEN value END) AS ma,
           avg(CASE WHEN user_id % 2 <> 0 THEN value END) AS mb,
           var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS va,
           var_samp(CASE WHEN user_id % 2 <> 0 THEN value END) AS vb
    FROM events
    WHERE value IS NULL OR NOT isnan(value)  -- NaN excluded; NULL kept
)
SELECT n_a, n_b,
       CAST(ma AS FLOAT) AS mean_a,
       CAST(mb AS FLOAT) AS mean_b,
       CAST(ma - mb AS FLOAT) AS mean_diff,
       CAST((ma - mb) / sqrt(va / n_a + vb / n_b) AS FLOAT) AS t_stat
FROM s
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.token_entropy(_t(spark, sf_dir, "documents"))


_TOKEN_ENTROPY_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
    SELECT doc_id, token, count(*) AS c
    FROM tok WHERE token <> '' GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
    FROM counts GROUP BY 1
)
SELECT doc_id, n_tokens,
       CAST(ln(CAST(n_tokens AS DOUBLE)) - clogc / n_tokens AS FLOAT)
           AS entropy
FROM per_doc ORDER BY doc_id
"""


def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.bpe_merge_step(_t(spark, sf_dir, "documents"), k=10)


_BPE_MERGE_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
pairs AS (
    SELECT unnest([tk[i] || ' ' || tk[i+1]
                   FOR i IN range(1, greatest(len(tk), 1))]) AS pair
    FROM t
)
SELECT pair, count(*) AS n FROM pairs
WHERE NOT starts_with(pair, ' ') AND NOT ends_with(pair, ' ')
GROUP BY 1 ORDER BY n DESC, pair LIMIT 10
"""


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checked since round 4: the merge loop is pure integer/string
    # state (pair counts, lexicographic tie-break, greedy left-to-right
    # rewrite), so the 8 iterations unroll into exact DuckDB CTEs —
    # the per-word rewrite fold runs as a list_reduce with an encoded
    # (out, prev) string accumulator (_bpe_train_sql). No floats, no
    # quantization needed.
    merges = llm.bpe_train(_t(spark, sf_dir, "documents"), n_merges=8)
    # explicit schema: an empty corpus trains zero merges, and
    # createDataFrame cannot infer types from an empty list
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank long, left string, right string",
    )


def _bpe_apply_merge_expr(syms: str, left: str, right: str) -> str:
    """DuckDB expression: greedy left-to-right application of one merge
    (left, right) to a symbol list — the exact twin of bpe_train's
    aggregate fold. list_reduce has no initial-accumulator form, so the
    (out, prev) state rides an encoded string: out || chr(2) || prev,
    with chr(3) as the prev-is-null sentinel and chr(0) separating
    out's symbols (symbols never contain control chars).

    Returns the complete expression: the fold result is re-bound to
    ``acc`` via a one-element list_transform so the finishing step
    (flush the pending ``prev`` and split on chr(0)) can reference it —
    ``acc`` only exists inside a lambda scope in DuckDB."""
    out = "string_split(acc, chr(2))[1]"
    prev = "string_split(acc, chr(2))[2]"
    out_plus_prev = (
        f"(CASE WHEN {out} = '' THEN {prev} "
        f"ELSE {out} || chr(0) || {prev} END)"
    )
    out_plus_sym = (
        f"(CASE WHEN {out} = '' THEN {left} || {right} "
        f"ELSE {out} || chr(0) || {left} || {right} END)"
    )
    folded = f"""list_reduce([chr(2) || chr(3)] || {syms},
        (acc, x) -> CASE
            WHEN {prev} = chr(3) THEN {out} || chr(2) || x
            WHEN {prev} = {left} AND x = {right}
                THEN {out_plus_sym} || chr(2) || chr(3)
            ELSE {out_plus_prev} || chr(2) || x
        END)"""
    finish = (
        f"string_split(CASE WHEN {prev} = chr(3) THEN {out} "
        f"ELSE {out_plus_prev} END, chr(0))"
    )
    return f"list_transform([{folded}], acc -> {finish})[1]"


def _bpe_train_cte_chain(n_merges: int) -> str:
    """The unrolled-training CTE list ``w0, p1, b1, w1 .. w{n}``
    shared by the bpe_train and bpe_encode oracles: n_merges
    argmax+rewrite rounds over the distinct-word frequency table. All
    state is integers and strings — bit-exact across engines by
    construction. Every CTE is MATERIALIZED (multiply-referenced;
    DuckDB's inlining would re-evaluate the prefix exponentially
    otherwise). An empty round (no pairs left) yields no b{i} row and
    empties the downstream state — the same early-stop shape as the
    driver loop's break."""
    parts = [
        """w0 AS MATERIALIZED (
    SELECT count(*) AS cnt, string_split(w, '') AS syms
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
)"""
    ]
    for i in range(1, n_merges + 1):
        apply_expr = _bpe_apply_merge_expr("w.syms", "b.l", "b.r")
        parts.append(
            f"""p{i} AS MATERIALIZED (
    SELECT s.p AS p, sum(s.cnt) AS n FROM (
        SELECT cnt, unnest([syms[k] || chr(0) || syms[k + 1]
                            FOR k IN range(1, greatest(len(syms), 1))]) AS p
        FROM w{i - 1}
    ) s GROUP BY s.p
),
b{i} AS MATERIALIZED (
    SELECT string_split(p, chr(0))[1] AS l, string_split(p, chr(0))[2] AS r
    FROM p{i} ORDER BY n DESC, p LIMIT 1
),
w{i} AS MATERIALIZED (
    SELECT w.cnt AS cnt, {apply_expr} AS syms
    FROM w{i - 1} w CROSS JOIN b{i} b
)"""
        )
    return ",\n".join(parts)


def _bpe_merge_table_sql(n_merges: int) -> str:
    """UNION of the per-round best-pair CTEs as (merge_rank, l, r)."""
    return "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, l, r FROM b{i}"
        for i in range(1, n_merges + 1)
    )


def _bpe_train_sql(n_merges: int = 8) -> str:
    """DuckDB replay of bpe_train — see ``_bpe_train_cte_chain``."""
    ranks = _bpe_merge_table_sql(n_merges).replace(
        " l, r FROM", ' l AS "left", r AS "right" FROM'
    )
    return f"""
WITH {_bpe_train_cte_chain(n_merges)}
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, "left", "right"
FROM ({ranks})
"""


def _bpe_encode_sql(n_merges: int = 8) -> str:
    """DuckDB replay of the train->encode round trip (q_bpe_encode).

    The GPT-2 encode loop looks data-dependent — "repeat until no
    merge applies" — but each round is exact relational algebra: pick
    the MINIMUM-rank merge whose (l, r) appears adjacently in the
    word's symbol list, rewrite greedily left-to-right (the same
    ``_bpe_apply_merge_expr`` fold the training oracle uses), stop
    when no merge matches. A recursive CTE replays exactly that loop
    per DISTINCT word — the same construct that unrolled
    first-fit-decreasing's bin state: rows that still have an
    applicable pair recurse, finished words simply drop out, and the
    per-word final state is the unique accumulated row with no
    applicable pair. Each step shrinks the symbol list by at least
    one, so termination is structural. Distinct-word encoding then
    joins back to per-doc word occurrences — mirroring the Spark
    kernel's per-batch word cache semantics (same word -> same
    segmentation, counted per occurrence)."""
    pair_hit = (
        "len(list_filter(range(1, greatest(len({syms}), 1)), "
        "k -> {syms}[k] = {m}.l AND {syms}[k + 1] = {m}.r)) > 0"
    )
    step = _bpe_apply_merge_expr("t.syms", "t.l", "t.r")
    return f"""
WITH RECURSIVE {_bpe_train_cte_chain(n_merges)},
m AS MATERIALIZED ({_bpe_merge_table_sql(n_merges)}),
words AS MATERIALIZED (
    SELECT DISTINCT w
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> ''
),
enc AS (
    SELECT w, string_split(w, '') AS syms FROM words
    UNION ALL
    SELECT t.w, {step} AS syms
    FROM (
        SELECT e.w, e.syms, mm.l, mm.r
        FROM enc e
        JOIN m mm ON mm.merge_rank = (
            SELECT min(m2.merge_rank) FROM m m2
            WHERE {pair_hit.format(syms='e.syms', m='m2')}
        )
    ) t
),
fin AS MATERIALIZED (
    SELECT e.w, len(e.syms) AS n_toks
    FROM enc e
    WHERE NOT EXISTS (
        SELECT 1 FROM m m2
        WHERE {pair_hit.format(syms='e.syms', m='m2')}
    )
),
occ AS (
    SELECT doc_id, w
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
    WHERE w <> ''
)
SELECT d.doc_id,
       CAST(COALESCE(j.total, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN (
    SELECT o.doc_id, sum(f.n_toks) AS total
    FROM occ o JOIN fin f ON o.w = f.w
    GROUP BY o.doc_id
) j ON d.doc_id = j.doc_id
"""


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.lm_perplexity(_t(spark, sf_dir, "documents"))


_LM_PERPLEXITY_SQL = """
WITH t AS (
    SELECT doc_id, ['<s>'] || string_split(text, ' ') AS tk FROM documents
),
big AS (
    SELECT doc_id, unnest([{'w1': tk[i], 'w2': tk[i+1]}
                           FOR i IN range(1, greatest(len(tk), 1))]) AS p
    FROM t
),
bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM big),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
cc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS vsz FROM bc),
doc_bg AS (
    SELECT doc_id, w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2, 3
),
per_doc AS (
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           sum(cnt * -ln((CAST(c12 AS DOUBLE) + 1.0)
                         / (CAST(c1 AS DOUBLE) + 1.0 * vsz))) / sum(cnt)
               AS avg_nll
    FROM doc_bg
    JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
    GROUP BY 1
)
SELECT doc_id, n_bigrams,
       CAST(avg_nll AS FLOAT) AS avg_nll,
       CAST(exp(avg_nll) AS FLOAT) AS ppl
FROM per_doc ORDER BY doc_id
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RefinedWeb-style line-level dedup. The driver's documents are
    # single-line, so the wrapper plants the boilerplate a crawl would
    # carry — a shared header and footer line around every doc — and the
    # operator must strip exactly those (plus any body shared by ≥2
    # docs, e.g. the corpus's planted duplicate texts) and reassemble
    # the rest in order.
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("subscribe to our newsletter\n"),
            F.col("text"),
            F.lit("\n(c) example corp - all rights reserved"),
        ).alias("text"),
    )
    return llm.line_dedup(docs, min_docs=2).select("doc_id", "text", "n_lines_kept")


_LINE_DEDUP_SQL = """
WITH docs2 AS (
    SELECT doc_id,
           'subscribe to our newsletter' || chr(10) || text || chr(10) ||
           '(c) example corp - all rights reserved' AS text
    FROM documents
),
lines AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, chr(10)), 1) AS pos,
           unnest(string_split(text, chr(10))) AS line
    FROM docs2
),
freq AS (
    SELECT line
    FROM (SELECT line, count(DISTINCT doc_id) AS n FROM lines GROUP BY 1)
    WHERE n >= 2
),
kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq))
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY pos) AS text,
       count(*) AS n_lines_kept
FROM kept GROUP BY doc_id
"""


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Domain/source blocklist gate: tiny blocklist broadcast, corpus
    # filtered in its scan stage (zero shuffles).
    docs = _t(spark, sf_dir, "documents")
    bl = spark.createDataFrame([("src3",), ("src7",), ("src15",)], ["source"])
    return llm.blocklist_filter(docs, bl)


_BLOCKLIST_SQL = """
SELECT * FROM documents WHERE source NOT IN ('src3', 'src7', 'src15')
"""


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Concat-and-chunk packing positions. The Spark side computes the
    # global prefix sum with the two-level bucketed scan (no global
    # window); the oracle uses the naive OVER (ORDER BY) form — equal
    # results prove the distributed decomposition is exact.
    return llm.pack_chunks(_t(spark, sf_dir, "documents"), chunk_len=512)


_PACK_CHUNKS_SQL = """
WITH t AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
o AS (
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens AS BIGINT) AS "offset"
    FROM t
)
SELECT doc_id, n_tokens, "offset",
       CAST(floor("offset" / 512.0) AS BIGINT) AS first_chunk,
       CAST(floor(("offset" + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT)
           AS last_chunk
FROM o
"""


def q_pack_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checked since round 4: the sharded FFD heuristic is
    # sequential PER BUCKET, which a recursive CTE expresses exactly —
    # the bin-fill list is the recursion state, one row per (bucket,
    # rank) step (_pack_firstfit_sql). Portable md5 doc-buckets make
    # the sharding itself replayable. Invariants (every doc assigned
    # once, fill ≤ capacity, oversize isolation) stay pytest-checked.
    return llm.pack_firstfit(_t(spark, sf_dir, "documents"), capacity=512)


def _pack_firstfit_sql(cap: int = 512, n_buckets: int = 64) -> str:
    """DuckDB replay of sharded first-fit-decreasing packing.

    Exactness argument: inside a bucket, FFD is a pure function of the
    (n_tokens DESC, doc_id) order — integer state only, no floats. The
    recursive CTE walks that order, carrying the open-bin fill list:
    each step places the doc in the FIRST bin where fill+n <= cap
    (list_position over a boolean list_transform — the same scan as
    the Python loop), else appends a bin; oversize docs (n > cap)
    always open their own bin. Global ids mirror the operator's
    bucket*2^32+local encoding. The per-bucket recursions advance in
    lockstep (one rank per recursion round), terminating at the
    deepest bucket.
    """
    pos = (
        f"COALESCE(CASE WHEN s.n_tokens <= {cap} THEN "
        "NULLIF(list_position(list_transform(r.fills, "
        f"f -> f + s.n_tokens <= {cap}), true), 0) END, len(r.fills) + 1)"
    )
    return f"""
WITH RECURSIVE s AS MATERIALIZED (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(('0x' || substring(md5(lower(CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
                % {n_buckets} AS INT) AS b,
           row_number() OVER (
               PARTITION BY ('0x' || substring(md5(lower(CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
                            % {n_buckets}
               ORDER BY CAST(len(string_split(text, ' ')) AS BIGINT) DESC,
                        doc_id) AS rn
    FROM documents
    WHERE text IS NOT NULL  -- nothing to pack; Spark side filters too
),
r AS (
    SELECT b, rn, doc_id, n_tokens,
           1 AS placed,
           [n_tokens] AS fills
    FROM s WHERE rn = 1
    UNION ALL
    SELECT s.b, s.rn, s.doc_id, s.n_tokens,
           {pos} AS placed,
           CASE WHEN {pos} > len(r.fills)
                THEN list_append(r.fills, s.n_tokens)
                ELSE list_transform(range(1, len(r.fills) + 1),
                     i -> CASE WHEN i = {pos}
                          THEN r.fills[i] + s.n_tokens
                          ELSE r.fills[i] END)
           END AS fills
    FROM r JOIN s ON s.b = r.b AND s.rn = r.rn + 1
)
SELECT doc_id, n_tokens,
       CAST(b AS BIGINT) * 4294967296 + (placed - 1) AS bin_id,
       n_tokens > {cap} AS oversize
FROM r
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checked since round 5: the "data-dependent greedy loop" is
    # replayed exactly by a DuckDB recursive CTE over distinct words —
    # each round picks the min-rank merge present in the word and
    # applies the same greedy-rewrite fold as the training oracle,
    # recursing until no merge matches (_bpe_encode_sql). Merges come
    # from the deterministic trainer; no RNG anywhere.
    docs = _t(spark, sf_dir, "documents")
    merges = llm.bpe_train(docs, n_merges=8)
    return llm.bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens")


def q_minhash_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Oracle-backed recall floor for the approximate near-dup pipeline:
    # byte-identical documents have identical MinHash signatures, agree
    # in every LSH band, and verify at Jaccard 1.0 — so the pipeline's
    # output restricted to sha-identical pairs must equal ALL
    # sha-identical pairs (which plain SQL can enumerate). Any missed
    # pair = row-count mismatch = recall bug surfaced by the oracle.
    # The sf0.01 corpus happens to contain no natural byte-identical
    # texts, so the wrapper plants copies of every 50th doc under
    # offset ids — non-vacuous at every scale factor.
    base = _t(spark, sf_dir, "documents")
    planted = base.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    docs = base.unionByName(planted)
    found = llm.minhash_neardup_pairs(docs, threshold=0.9, num_perm=64, bands=32)
    hashed = docs.select(
        F.col("doc_id"), F.sha2(F.col("text"), 256).alias("_sha")
    )
    exact_pairs = (
        hashed.alias("a")
        .join(hashed.alias("b"), "_sha")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    return found.join(exact_pairs, ["id_a", "id_b"], "inner").select(
        "id_a", "id_b", F.col("jaccard").cast("float").alias("jaccard")
    )


_MINHASH_RECALL_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
    WHERE doc_id % 50 = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS FLOAT) AS jaccard
FROM corpus a JOIN corpus b
  ON a.text = b.text AND a.doc_id < b.doc_id
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DoReMi-style mixture rebalancing: three domains, targets 2:1:1.
    # Each side derives the same rates (N = min(count/target), rate =
    # target*N/count) with the same IEEE-double expression order, so
    # thresholds agree bit-exactly; the md5 draw is engine-portable.
    out = llm.mixture_sample(
        _t(spark, sf_dir, "documents"),
        targets={"src0": 0.5, "src1": 0.25, "src2": 0.25},
        strata_col="source",
    )
    return out.select("doc_id", "source")


_MIXTURE_SQL = """
WITH t(source, tgt) AS (VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)),
c AS (
    SELECT d.source, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN t ON d.source = t.source GROUP BY d.source
),
j AS (SELECT c.source, c.n, t.tgt FROM c JOIN t ON c.source = t.source),
nt AS (SELECT min(n / tgt) AS n_total FROM j),
r AS (
    SELECT source,
           least(tgt * (SELECT n_total FROM nt) / n, 1.0) AS rate
    FROM j
)
SELECT d.doc_id, d.source
FROM documents d JOIN r ON d.source = r.source
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < least(CAST(floor(rate * 4294967296.0) AS BIGINT), 4294967295)
"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # alpha = 0.5 on purpose: c^0.5 is IEEE sqrt (correctly rounded in
    # every engine), so the target shares — and hence the md5
    # thresholds — are bit-identical between the Python driver
    # derivation and the SQL twin. The SQL sums sqrt weights with a
    # fixed-order list_reduce matching Python's sorted-key iteration.
    out = llm.temperature_sample(
        _t(spark, sf_dir, "documents"), alpha=0.5, strata_col="lang"
    )
    return out.select("doc_id", "lang")


_TEMPERATURE_SQL = """
WITH c AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
tw AS (
    SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
                       (a, b) -> a + b) AS total_w
    FROM c
),
tgt AS (
    SELECT lang, n,
           sqrt(CAST(n AS DOUBLE)) / (SELECT total_w FROM tw) AS t
    FROM c
),
nt AS (SELECT min(n / t) AS n_total FROM tgt),
r AS (
    SELECT lang,
           least(t * (SELECT n_total FROM nt) / n, 1.0) AS rate
    FROM tgt
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < least(CAST(floor(rate * 4294967296.0) AS BIGINT), 4294967295)
"""



def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only: Datasketches HLL estimates have no DuckDB twin; the
    # pytest harness bounds the error and asserts the union property.
    from big_data_in_agriculture_spark.operators.profile import hll_rollup

    return hll_rollup(_t(spark, sf_dir, "events"), "event_type", "user_id")



def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return llm.textrank_keywords(_t(spark, sf_dir, "documents"), top_k=20)


_TEXTRANK_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
pairs AS (
    SELECT t[i+1] AS w1, t[i+2] AS w2
    FROM toks, unnest(range(len(t) - 1)) u(i)
),
bg AS (
    SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c
    FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3
),
edges AS (
    SELECT src, dst, sum(w) AS w FROM (
        SELECT w1 AS src, w2 AS dst, c AS w FROM bg
        UNION ALL
        SELECT w2 AS src, w1 AS dst, c AS w FROM bg
    ) GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS word FROM edges),
-- rank mass travels as INTEGER units of 1e-12 (see textrank_keywords:
-- per-edge floor makes each per-target sum exact int64 addition, so
-- three iterations of fold-order float jitter can't compound past the
-- output grid; every float op left is one correctly-rounded step on
-- bit-identical inputs)
n AS (SELECT count(*) AS nn,
             -- both constants cast to DOUBLE so DuckDB performs the
             -- same IEEE subtraction as Python's 1.0 - damping
             -- (DECIMAL 0.15 vs double 0.15000000000000002 floors to a
             -- different integer on .5-tie node counts, e.g. n=6144)
             CAST(floor((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                        / count(*) * 1e12 + 0.5) AS BIGINT)
                 AS base_u,
             CAST(floor(1.0 / count(*) * 1e12 + 0.5) AS BIGINT) AS init_u
      FROM nodes),
r0 AS (SELECT word, init_u AS rank_u FROM nodes, n),
r1 AS (
    SELECT e.dst AS word,
           n.base_u + CAST(floor(CAST(0.85 AS DOUBLE) * sum(CAST(floor(
               e.w / o.wout * CAST(r.rank_u AS DOUBLE)
           ) AS BIGINT))) AS BIGINT) AS rank_u
    FROM edges e JOIN outw o ON e.src = o.src
                 JOIN r0 r ON e.src = r.word, n
    GROUP BY e.dst, n.base_u
),
r2 AS (
    SELECT e.dst AS word,
           n.base_u + CAST(floor(CAST(0.85 AS DOUBLE) * sum(CAST(floor(
               e.w / o.wout * CAST(r.rank_u AS DOUBLE)
           ) AS BIGINT))) AS BIGINT) AS rank_u
    FROM edges e JOIN outw o ON e.src = o.src
                 JOIN r1 r ON e.src = r.word, n
    GROUP BY e.dst, n.base_u
),
r3 AS (
    SELECT e.dst AS word,
           n.base_u + CAST(floor(CAST(0.85 AS DOUBLE) * sum(CAST(floor(
               e.w / o.wout * CAST(r.rank_u AS DOUBLE)
           ) AS BIGINT))) AS BIGINT) AS rank_u
    FROM edges e JOIN outw o ON e.src = o.src
                 JOIN r2 r ON e.src = r.word, n
    GROUP BY e.dst, n.base_u
)
SELECT word,
       CAST(CAST((rank_u + 5000) // 10000 AS DOUBLE) / 1e8 AS FLOAT) AS rank
FROM r3
ORDER BY (rank_u + 5000) // 10000 DESC, word
LIMIT 20
"""



def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # entity resolution on the product-name vocabulary: which catalog
    # names are near-variants of each other (shared char trigrams)
    names = _t(spark, sf_dir, "part").select(
        F.col("p_name").alias("name")
    ).distinct()
    out = relational.fuzzy_join(
        names, names, "name", "name", "name", "name", threshold=0.35
    )
    return out.filter(F.col("id_a") < F.col("id_b"))


_FUZZY_JOIN_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
g AS (
    SELECT name,
           list_distinct(
               CASE WHEN length(name) >= 3
                    THEN list_transform(range(length(name) - 2),
                                        i -> substring(name, i + 1, 3))
                    ELSE [name] END
           ) AS grams
    FROM names
)
SELECT a.name AS id_a, b.name AS id_b,
       CAST(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / (len(a.grams) + len(b.grams)
               - len(list_intersect(a.grams, b.grams))) AS FLOAT) AS jaccard
FROM g a JOIN g b ON a.name < b.name
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
      >= 0.35
ORDER BY id_a, id_b
"""



def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.profile import k_anonymity

    return k_anonymity(
        _t(spark, sf_dir, "documents"), ["lang", "source"], k=3
    )


_K_ANON_SQL = """
SELECT lang, source, count(*) AS group_size
FROM documents GROUP BY 1, 2 HAVING count(*) < 3
ORDER BY lang, source
"""


def q_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plant orphans: drop every 7th order, then audit lineitem's FK
    from big_data_in_agriculture_spark.operators.profile import (
        referential_check,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 != 0
    )
    return referential_check(li, orders, "l_orderkey", "o_orderkey")


_REF_CHECK_SQL = """
WITH parent AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0),
counts AS (
    SELECT l_orderkey AS orphan_key, count(*) AS n_child_rows
    FROM lineitem GROUP BY 1
)
SELECT c.orphan_key, c.n_child_rows
FROM counts c ANTI JOIN parent p ON c.orphan_key = p.o_orderkey
ORDER BY c.orphan_key
"""



def q_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic docs carry no punctuation — plant sentence boundaries
    # (text. text! …) so the UDTF emits real multi-sentence output
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(". "), F.col("text"), F.lit("!")
        ).alias("text"),
    )
    return llm.split_sentences(docs)


_SPLIT_SENT_SQL = """
WITH sents AS (
    SELECT doc_id,
           list_filter(
               list_transform(
                   regexp_extract_all(text || '. ' || text || '!',
                                      '[^.!?]+[.!?]?'),
                   x -> trim(x)),
               x -> x <> ''
           ) AS l
    FROM documents
)
SELECT doc_id, CAST(i AS INTEGER) AS sent_idx, l[i + 1] AS sentence
FROM sents, unnest(range(len(l))) u(i)
"""



def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroid_similarity(
        _t(spark, sf_dir, "embeddings")
    )


_LABEL_CENTROID_SQL = f"""
WITH dims AS (
    -- invalid embeddings excluded (vec_is_valid convention)
    SELECT label, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS val
    FROM embeddings, unnest(range(len(embedding))) u(i)
    WHERE {_VALID_VEC}
),
cent AS (
    SELECT label, dim, avg(val) AS mean FROM dims GROUP BY 1, 2
),
vecs AS (
    SELECT label, list(mean ORDER BY dim) AS centroid FROM cent GROUP BY 1
),
pairs AS (
    SELECT a.label AS label_a, b.label AS label_b,
           a.centroid AS ca, b.centroid AS cb
    FROM vecs a JOIN vecs b ON a.label < b.label
)
SELECT label_a, label_b,
       CAST(round(
           CASE WHEN (sqrt(list_reduce(list_transform(ca, v -> v * v),
                                       (x, y) -> x + y))
                      * sqrt(list_reduce(list_transform(cb, v -> v * v),
                                         (x, y) -> x + y))) > 0
                THEN list_reduce(list_transform(range(len(ca)),
                                                i -> ca[i + 1] * cb[i + 1]),
                                 (x, y) -> x + y)
                     / (sqrt(list_reduce(list_transform(ca, v -> v * v),
                                         (x, y) -> x + y))
                        * sqrt(list_reduce(list_transform(cb, v -> v * v),
                                           (x, y) -> x + y)))
                ELSE 0.0 END, 6) AS FLOAT)
           AS centroid_cosine
FROM pairs
ORDER BY label_a, label_b
"""



def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checked since round 4: tol=0.0 + quantize=6 make the
    # 4-iteration k-means bit-replayable as unrolled CTEs
    # (_semantic_dedup_sql), and the in-cluster cosine filter uses the
    # identical left-to-right float64 fold on both engines. Copies of
    # every 40th vector are planted under offset ids; the pytest twin
    # asserts every planted copy is dropped.
    from big_data_in_agriculture_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 40 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    return semantic_dedup(
        emb.unionByName(planted),
        k=8,
        threshold=0.999,
        max_iter=4,
        tol=0.0,
        quantize=6,
    )


def _semantic_dedup_sql(
    iters: int = 4,
    k: int = 8,
    dim: int = 64,
    q: int = 6,
    threshold: float = 0.999,
) -> str:
    """DuckDB replay of q_semantic_dedup: plant the same copies,
    unroll the Lloyd iterations, assign, then drop every vector with a
    cosine-similar (>= threshold) lower-id neighbor in its cluster.

    The cosine is the exact Spark formula — sequential float64 folds
    for dot and both norms — so the unrounded >= threshold comparison
    sees bit-identical values (the only pairs near the 0.999 line are
    planted exact copies, whose arithmetic is symmetric anyway).
    """
    dot = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "j -> x.v[j]*y.v[j]))"
    )
    nx = (
        f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
        "j -> x.v[j]*x.v[j])))"
    )
    ny = (
        f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
        "j -> y.v[j]*y.v[j])))"
    )
    return f"""
WITH e AS (
    -- invalid embeddings excluded at entry (vec_is_valid convention)
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
    UNION ALL
    SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings
    WHERE vec_id % 40 = 0 AND {_VALID_VEC}
),
{_kmeans_cte_chain(iters, k, dim, q)},
df AS (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(range(1, {dim + 1}),
                    j -> (e.v[j]-c.cv[j])*(e.v[j]-c.cv[j]))) AS d
    FROM e, c{iters} c
),
af AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM df
    ) WHERE rn = 1
),
withv AS (
    SELECT a.vec_id, a.cluster, e.v FROM af a JOIN e USING (vec_id)
),
dup AS (
    SELECT DISTINCT y.vec_id
    FROM withv x JOIN withv y
      ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    WHERE CASE WHEN ({nx} * {ny}) > 0
               THEN {dot} / ({nx} * {ny})
               ELSE 0.0 END >= {threshold}
)
SELECT a.vec_id, a.cluster FROM af a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dup)
"""


def q_preprocess_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-2 composition over the NEW operators (the curation_pipeline
    # twin covers sample→quality→dedup→contamination→split): planted
    # boilerplate stripped by line-level dedup → source blocklist →
    # mixture rebalance to target domain weights → concat-and-chunk
    # packing offsets → per-source summary. One declarative plan; the
    # oracle replays every stage in SQL, including re-deriving the
    # mixture rates from the post-filter counts.
    base = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    boiled = base.select(
        "doc_id",
        F.concat(
            F.lit("subscribe to our newsletter\n"),
            F.col("text"),
            F.lit("\n(c) example corp - all rights reserved"),
        ).alias("text"),
    )
    cleaned = llm.line_dedup(boiled, min_docs=2).join(
        base.select("doc_id", "source"), "doc_id"
    )
    bl = spark.createDataFrame([("src3",), ("src7",), ("src15",)], ["source"])
    # Cut the lineage here: two downstream stages derive driver-side
    # scalars (mixture counts, pack's max-id) and would otherwise each
    # re-execute the whole dedup chain. At warehouse scale this is the
    # natural "cleaned corpus" materialization point.
    allowed = llm.blocklist_filter(cleaned, bl).localCheckpoint(eager=False)
    mixed = llm.mixture_sample(
        allowed,
        targets={"src1": 0.5, "src2": 0.25, "src4": 0.25},
        strata_col="source",
    )
    packed = llm.pack_chunks(mixed, chunk_len=256)
    return (
        packed.join(mixed.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("last_chunk").alias("max_chunk"),
        )
        .orderBy("source")
    )


_PREPROCESS_SQL = """
WITH boiled AS (
    SELECT doc_id,
           'subscribe to our newsletter' || chr(10) || text || chr(10) ||
           '(c) example corp - all rights reserved' AS text
    FROM documents
),
lines AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, chr(10)), 1) AS pos,
           unnest(string_split(text, chr(10))) AS line
    FROM boiled
),
freq AS (
    SELECT line
    FROM (SELECT line, count(DISTINCT doc_id) AS n FROM lines GROUP BY 1)
    WHERE n >= 2
),
kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq)),
rebuilt AS (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
    FROM kept GROUP BY doc_id
),
allowed AS (
    SELECT r.doc_id, d.source, r.text
    FROM rebuilt r JOIN documents d ON r.doc_id = d.doc_id
    WHERE d.source NOT IN ('src3', 'src7', 'src15')
),
t(source, tgt) AS (VALUES ('src1', 0.5), ('src2', 0.25), ('src4', 0.25)),
c AS (
    SELECT a.source, CAST(count(*) AS BIGINT) AS n
    FROM allowed a JOIN t ON a.source = t.source GROUP BY a.source
),
j AS (SELECT c.source, c.n, t.tgt FROM c JOIN t ON c.source = t.source),
nt AS (SELECT min(n / tgt) AS n_total FROM j),
r AS (
    SELECT source,
           least(tgt * (SELECT n_total FROM nt) / n, 1.0) AS rate
    FROM j
),
mixed AS (
    SELECT a.doc_id, a.source, a.text
    FROM allowed a JOIN r ON a.source = r.source
    WHERE ('0x' || substring(md5(CAST(a.doc_id AS VARCHAR)), 1, 8))::BIGINT
          < least(CAST(floor(rate * 4294967296.0) AS BIGINT), 4294967295)
),
toks AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM mixed
),
o AS (
    SELECT doc_id, source, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS off
    FROM toks
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(floor((off + greatest(n_tokens, 1) - 1) / 256.0)) AS BIGINT)
           AS max_chunk
FROM o GROUP BY 1 ORDER BY 1
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RAG-style overlapping windows: 64-token chunks, 16-token overlap
    # (stride 48). Map-only array math — the oracle replays the same
    # start-offset arithmetic with DuckDB list comprehensions.
    return llm.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


_CHUNK_DOCS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
st AS (
    SELECT doc_id, tk,
           [s FOR s IN range(0, greatest(len(tk), 1), 48)
              IF s < greatest(len(tk) - 16, 1)] AS starts
    FROM t
),
e AS (
    SELECT doc_id, tk,
           generate_subscripts(starts, 1) - 1 AS chunk_idx,
           unnest(starts) AS s
    FROM st
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(tk[s + 1 : s + 64], ' ') AS chunk_text,
       CAST(len(tk[s + 1 : s + 64]) AS BIGINT) AS n_chunk_tokens
FROM e
"""


def q_crosscorpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup against "previously released" data: every 3rd doc plays the
    # reference corpus; survivors are docs whose normalized fingerprint
    # never appears there.
    docs = _t(spark, sf_dir, "documents")
    reference = docs.filter(F.col("doc_id") % 3 == 0)
    return llm.crosscorpus_dedup(docs, reference).select("doc_id", "source")


_CROSSCORPUS_SQL = """
WITH fp AS (
    SELECT doc_id, source,
           sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS f
    FROM documents
    WHERE text IS NOT NULL  -- no fingerprint; Spark side filters too
)
SELECT doc_id, source FROM fp
WHERE f NOT IN (SELECT f FROM fp WHERE doc_id % 3 = 0)
"""


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the memory-bounded sibling of crosscorpus_dedup: history (every
    # 3rd doc) is compressed to a 4032-bit Bloom filter; the WHOLE
    # corpus is screened against it, so history members exercise the
    # guaranteed-hit path (maybe_dup=true — a Bloom filter has no
    # false negatives, in either direction of that guarantee) and the
    # rest the proof-of-novelty path. Positions derive from two slices
    # of the sha256 fingerprint, so DuckDB replays every bit.
    from big_data_in_agriculture_spark.operators.profile import bloom_dedup

    docs = _t(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 3 == 0)
    return bloom_dedup(docs, history).select("doc_id", "maybe_dup")


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # leakage-free train/test split: the split key is the near-dup
    # COMPONENT (jaccard graph, threshold 0.5 — same edges as
    # neardup_clusters), so a whole duplicate family lands on one side.
    pairs = llm.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, k=3)
    return llm.leakage_safe_split(
        _t(spark, sf_dir, "documents"), pairs, n_buckets=10, test_buckets=2
    )


_LEAKAGE_SPLIT_SQL = f"""
WITH RECURSIVE edges AS (
    SELECT id_a AS src, id_b AS dst FROM ({_JACCARD_SQL}) jp
    UNION
    SELECT id_b, id_a FROM ({_JACCARD_SQL}) jp2
),
reach(id, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, min(lab) AS component_id FROM reach GROUP BY id)
SELECT d.doc_id,
       coalesce(c.component_id, d.doc_id) AS split_key,
       CASE WHEN ('0x' || substr(md5(CAST(coalesce(c.component_id, d.doc_id)
                                          AS VARCHAR)), 1, 15))::BIGINT
                 % 10 < 2
            THEN 'test' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-Min sketch vs exact truth on the corpus's top-20 tokens:
    # with the fixed md5 double-hash family the whole sketch is
    # deterministic, so unlike the HLL queries this sketch needs no
    # bounded oracle — DuckDB replays build AND probe bit-exactly.
    # width=16 against the corpus's ~31-token vocabulary FORCES cell
    # collisions so the min-over-rows estimation (and its never-
    # underestimate guarantee) is actually exercised — at a production
    # width the tiny vocab would be collision-free and the estimate
    # degenerate-exact.
    from big_data_in_agriculture_spark.functions import text as TX
    from big_data_in_agriculture_spark.operators.profile import (
        cms_build,
        cms_estimate,
    )

    toks = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(TX.tokens("text")).alias("token"))
    )
    sketch = cms_build(toks, "token", depth=4, width=16)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), "token").limit(20)
    est = cms_estimate(top.select("token"), sketch, "token", 4, 16)
    return (
        top.join(est, "token")
        .select("token", "exact_count", "cms_estimate")
        .orderBy(F.col("exact_count").desc(), "token")
    )


_CMS_SQL = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS token
    FROM documents WHERE text IS NOT NULL
),
cells AS (
    SELECT i.i AS row_idx,
           ((('0x' || substr(md5(token), 1, 15))::BIGINT
             + i.i * (('0x' || substr(md5(token), 17, 8))::BIGINT * 2 + 1))
            % 16) AS col_idx
    FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) i
),
sketch AS (
    SELECT row_idx, col_idx, count(*) AS cnt FROM cells GROUP BY 1, 2
),
top AS (
    SELECT token, count(*) AS exact_count FROM toks
    GROUP BY 1 ORDER BY exact_count DESC, token LIMIT 20
),
qpos AS (
    SELECT t.token, t.exact_count, i.i AS row_idx,
           ((('0x' || substr(md5(t.token), 1, 15))::BIGINT
             + i.i * (('0x' || substr(md5(t.token), 17, 8))::BIGINT * 2 + 1))
            % 16) AS col_idx
    FROM top t CROSS JOIN (SELECT unnest(range(4)) AS i) i
)
SELECT q.token,
       q.exact_count,
       min(coalesce(s.cnt, 0)) AS cms_estimate
FROM qpos q
LEFT JOIN sketch s ON s.row_idx = q.row_idx AND s.col_idx = q.col_idx
GROUP BY q.token, q.exact_count
ORDER BY q.exact_count DESC, q.token
"""


def q_bloom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # filter-health diagnostics over the same history filter
    # bloom_dedup builds: exact popcounts, one float div + pow at the
    # end (cast to float on both sides per the determinism contract).
    from big_data_in_agriculture_spark.functions import text as TX
    from big_data_in_agriculture_spark.operators.profile import (
        bloom_build,
        bloom_stats,
    )

    hist = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 3 == 0) & F.col("text").isNotNull())
        .select(TX.fingerprint("text").alias("fp"))
    )
    return bloom_stats(bloom_build(hist, "fp"))


_BLOOM_STATS_SQL = """
WITH fp AS (
    SELECT sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
    FROM documents
    WHERE doc_id % 3 = 0 AND text IS NOT NULL
),
pos AS (
    SELECT ((('0x' || substr(fp, 1, 15))::BIGINT
             + i.i * (('0x' || substr(fp, 17, 8))::BIGINT * 2 + 1))
            % 4032) AS pos
    FROM fp CROSS JOIN (SELECT unnest(range(5)) AS i) i
),
words AS (
    SELECT pos // 63 AS word_idx,
           bit_or(1::BIGINT << (pos % 63)::INT) AS bits
    FROM pos GROUP BY 1
)
SELECT count(*)::BIGINT AS n_words,
       coalesce(sum(bit_count(bits)), 0)::BIGINT AS n_set_bits,
       CAST(coalesce(sum(bit_count(bits)), 0)::DOUBLE / 4032.0 AS FLOAT)
           AS fill_frac,
       CAST(pow(coalesce(sum(bit_count(bits)), 0)::DOUBLE / 4032.0, 5.0)
            AS FLOAT) AS expected_fpr
FROM words
"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pre-release PII scrub: the synthetic corpus carries no real
    # PII, so every 7th doc gets a deterministic contact block planted
    # (one match per class, derived from doc_id — both engines build
    # the identical bytes) and the scanner must count and mask exactly
    # those; the other docs prove the no-false-positive side.
    from big_data_in_agriculture_spark.operators.llm import pii_scan

    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull(),
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com ip 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(" tel 555-123-4567 acct 123456789"
                      " card 4012 8888 8888 1881 or 4111111111111111"
                      " bad 1234567812345678"
                      " iban DE89370400440532013000"
                      " not DE00123456781234567890"),
            ),
        ).otherwise(F.col("text")),
    )
    out = pii_scan(planted)
    # two Luhn-valid cards (grouped + bare) and one valid IBAN per
    # planted doc; the Luhn-failing bare run and the bad-check IBAN
    # prove the checksum gates reject (the bad run still counts as a
    # digit run and masks as <NUM>; the bad IBAN stays untouched)
    return out.select(
        "doc_id",
        *[F.col(c).cast("long").alias(c)
          for c in ("n_emails", "n_ipv4", "n_phones", "n_digit_runs",
                    "n_cards", "n_ibans")],
        F.sha2(F.col("masked"), 256).alias("masked_fp"),
    )


# PII replay: patterns are the Java∩RE2 shared subset (explicit ASCII
# classes, \b, non-backtracking) and are read STRAIGHT from
# TX.PII_PATTERNS — one source of truth for the Spark scanner and
# every oracle that masks (pii_scan, text_cleaning, llm_pipeline).
# DuckDB regexp_extract_all counts and chained regexp_replace('g')
# masks byte-identically, fingerprinted via sha256. DuckDB standard
# strings don't process backslashes, so '\b' reaches RE2 verbatim.

def _luhn_sql(digits: str) -> str:
    """Luhn mod-10 over a pure-digit string — TX.luhn_valid's twin.

    Same parity-packed fold (acc = sum*2 + position_parity) so a
    plain (acc, element) list_reduce needs no index; list_prepend
    supplies the initial accumulator (DuckDB's list_reduce otherwise
    seeds from the first element)."""
    return (
        "((list_reduce(list_prepend(0, list_transform(string_split("
        f"reverse({digits}), ''), c -> ascii(c) - 48)), "
        "(acc, d) -> ((acc >> 1) + CASE WHEN (acc & 1) = 0 THEN d "
        "WHEN d > 4 THEN 2*d - 9 ELSE 2*d END) * 2 + (1 - (acc & 1))"
        ") >> 1) % 10 = 0)"
    )


def _iban_sql(e: str) -> str:
    """ISO 7064 mod-97 — TX.iban_valid's twin (rotate first four
    chars to the end, letters map to 10..35, fold mod 97 == 1)."""
    r = f"(substr({e}, 5) || substr({e}, 1, 4))"
    return (
        "(list_reduce(list_prepend(0, list_transform(string_split("
        f"{r}, ''), c -> ascii(c))), "
        "(acc, v) -> CASE WHEN v >= 65 THEN (acc*100 + v - 55) % 97 "
        "ELSE (acc*10 + v - 48) % 97 END) = 1)"
    )


def _card_cands_sql(e: str) -> str:
    from big_data_in_agriculture_spark.functions.text import CARD_PATTERN

    stripped = "replace(replace(x, '-', ''), ' ', '')"
    return (
        f"list_filter(regexp_extract_all({e}, '{CARD_PATTERN}'), "
        f"x -> {_luhn_sql(stripped)})"
    )


def _iban_cands_sql(e: str) -> str:
    from big_data_in_agriculture_spark.functions.text import IBAN_PATTERN

    return (
        f"list_filter(regexp_extract_all({e}, '{IBAN_PATTERN}'), "
        f"x -> {_iban_sql('x')})"
    )


def _pii_mask_sql(expr: str) -> str:
    """Replay of TX.mask_pii over expr, in its exact pass order:
    emails, ipv4, then the checksum classes (IBANs, cards) folded
    over the text with a \\b-anchored regexp_replace per candidate
    (round 8 — same boundaries the extraction saw; a candidate
    embedded in a longer digit run is left for digit_runs) in
    positional match order — identical in Java regex and RE2, so the
    fold is deterministic cross-engine — then phones and digit runs."""
    from big_data_in_agriculture_spark.functions.text import PII_PATTERNS

    out = expr
    for _, pat, rep in PII_PATTERNS[:2]:  # emails, ipv4
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = (
        f"list_reduce(list_prepend({out}, {_iban_cands_sql(out)}), "
        "(acc, x) -> regexp_replace(acc, '\\b' || x || '\\b', "
        "'<IBAN>', 'g'))"
    )
    out = (
        f"list_reduce(list_prepend({out}, {_card_cands_sql(out)}), "
        "(acc, x) -> regexp_replace(acc, '\\b' || x || '\\b', "
        "'<CARD>', 'g'))"
    )
    for _, pat, rep in PII_PATTERNS[2:]:  # phones, digit_runs
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def _pii_scan_sql() -> str:
    from big_data_in_agriculture_spark.functions.text import PII_PATTERNS

    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    checksum_counts = (
        f"len({_card_cands_sql('text')}) AS n_cards,\n       "
        f"len({_iban_cands_sql('text')}) AS n_ibans"
    )
    return f"""
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 AND text IS NOT NULL
                THEN text || ' contact user' || doc_id
                     || '@example.com ip 10.0.0.' || (doc_id % 256)
                     || ' tel 555-123-4567 acct 123456789'
                     || ' card 4012 8888 8888 1881 or 4111111111111111'
                     || ' bad 1234567812345678'
                     || ' iban DE89370400440532013000'
                     || ' not DE00123456781234567890'
                ELSE text END AS text
    FROM documents
)
SELECT doc_id,
       {counts},
       {checksum_counts},
       sha256({_pii_mask_sql("text")}) AS masked_fp
FROM planted
"""


_PII_SCAN_SQL = _pii_scan_sql()


# Bloom-filter replay: h1/h2 are the engines' shared md5/sha-substring
# fixed point (conv(substr(fp,...),16,10) == ('0x'||substr(fp,...))::
# BIGINT); positions are Kirsch-Mitzenmacher (h1 + i*h2) mod m with 63
# usable bits per BIGINT word — bit 63 never set, so `1 << bit` is
# in-range on both engines (DuckDB raises on 1::BIGINT << 63).
_BLOOM_DEDUP_SQL = """
WITH fp AS (
    SELECT doc_id,
           sha256(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
    FROM documents
    WHERE text IS NOT NULL  -- no fingerprint; Spark side filters too
),
pos AS (
    SELECT doc_id,
           ((('0x' || substr(fp, 1, 15))::BIGINT
             + i.i * (('0x' || substr(fp, 17, 8))::BIGINT * 2 + 1))
            % 4032) AS pos
    FROM fp CROSS JOIN (SELECT unnest(range(5)) AS i) i
),
words AS (
    SELECT pos // 63 AS word_idx,
           bit_or(1::BIGINT << (pos % 63)::INT) AS bits
    FROM pos WHERE doc_id % 3 = 0
    GROUP BY 1
)
SELECT p.doc_id,
       bool_and(coalesce(
           (w.bits & (1::BIGINT << (p.pos % 63)::INT)) <> 0, FALSE
       )) AS maybe_dup
FROM pos p
LEFT JOIN words w ON p.pos // 63 = w.word_idx
GROUP BY p.doc_id
"""


def q_quality_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drop the worst 20% by score; both engines compute the identical
    # linear-interpolation percentile over the identical double scores
    # (percentile ≡ quantile_cont — parity already proven by the
    # `percentiles` query), so the cutoff and the kept set agree.
    out = llm.quality_floor_filter(_t(spark, sf_dir, "documents"), drop_frac=0.2)
    return out.select("doc_id", "n_chars")


_QUALITY_FLOOR_SQL = """
WITH scored AS (
    SELECT doc_id, n_chars,
           ((CAST(length(text) AS DOUBLE)
             - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
           * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS q
    FROM documents
)
SELECT doc_id, n_chars FROM scored
WHERE q >= (SELECT quantile_cont(q, 0.2) FROM scored)
"""


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collocation detection: top-20 bigrams by PMI (min count 5);
    # per-row ln over identical doubles, float cast before ranking,
    # lexicographic tie-break — engine-deterministic top-k.
    return llm.bigram_pmi(_t(spark, sf_dir, "documents"), min_count=5, k=20)


_BIGRAM_PMI_SQL = """
WITH t AS (
    SELECT doc_id, ['<s>'] || string_split(text, ' ') AS tk FROM documents
),
big AS (
    SELECT unnest([{'w1': tk[i], 'w2': tk[i+1]}
                   FOR i IN range(1, greatest(len(tk), 1))]) AS p
    FROM t
),
bg AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM big),
bc0 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
cc AS (SELECT w1, sum(c12) AS c1 FROM bc0 GROUP BY 1),
bc AS (
    SELECT bc0.w1, bc0.w2, bc0.c12, cc.c1
    FROM bc0 JOIN cc ON bc0.w1 = cc.w1
    WHERE bc0.w1 <> '<s>'
),
c2t AS (SELECT w2, sum(c12) AS c2 FROM bc GROUP BY 1),
tt AS (SELECT sum(c12) AS tot FROM bc)
SELECT bc.w1, bc.w2, bc.c12,
       CAST(ln(CAST(bc.c12 AS DOUBLE) * CAST(tot AS DOUBLE)
               / (CAST(bc.c1 AS DOUBLE) * CAST(c2t.c2 AS DOUBLE))) AS FLOAT)
           AS pmi
FROM bc JOIN c2t ON bc.w2 = c2t.w2 CROSS JOIN tt
WHERE bc.c12 >= 5
ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT 20
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dataset-card rollup: by-lang / by-source / cross / overall in one
    # scan (grouping sets). gid disambiguates set membership so NULL
    # group labels are unambiguous on both engines.
    return llm.corpus_report(_t(spark, sf_dir, "documents"))


_CORPUS_REPORT_SQL = """
SELECT lang, source,
       GROUPING(lang, source) AS gid,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
HAVING count(*) > 0  -- see _ROLLUP_SQL: Spark emits no rows on empty input
ORDER BY gid, lang, source
"""


#: Fixed deterministic demo weights for the oracle-checked classifier
#: score: dyadic rationals (31-bit denominator) so the SQL literal
#: round-trips to the identical double on every engine.
_CLS_DIM = 256
_CLS_BIAS = 0.0625
_CLS_W = [
    float(((j + 1) * 2654435761 % (1 << 32)) / (1 << 31) - 1.0)
    for j in range(_CLS_DIM)
]


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashing-trick linear scorer under a FIXED model: w ships as one
    # array literal, the margin folds out of a single aggregate over
    # the token list — map-only at any corpus size. Engine-portable
    # md5 buckets; float32 cast at the end absorbs summation-order and
    # libm exp() last-ulp differences.
    scored = llm.classifier_score(
        _t(spark, sf_dir, "documents"), _CLS_W, _CLS_BIAS, dim=_CLS_DIM
    )
    return scored.withColumn("score", F.col("score").cast("float"))


_CLASSIFIER_SCORE_SQL = f"""
WITH w AS (SELECT [{", ".join(repr(x) for x in _CLS_W)}] AS wv)
SELECT doc_id,
       CAST(1.0 / (1.0 + exp(-(
           list_sum(list_transform(string_split(text, ' '),
               t -> wv[CAST(('0x' || substring(md5(lower(t)), 1, 8))::BIGINT
                            % {_CLS_DIM} AS INT) + 1]))
           / CAST(len(string_split(text, ' ')) AS DOUBLE)
           + {_CLS_BIAS!r}))) AS FLOAT) AS score
FROM documents CROSS JOIN w
"""


def q_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the full train→deploy loop: weak labels from the quality
    # heuristic supervise a distributed logistic regression (one
    # scan + one partial-agg shuffle per iteration, model on the
    # driver), then the learned model scores every doc map-side.
    # Hash-checked since round 4: quantize=6 rounds every weight/bias
    # update far above gradient fold-order and libm-exp ulp jitter, so
    # the 8 descent steps unroll into exact DuckDB CTEs
    # (_classifier_quality_sql) — same trick as kmeans_clusters.
    # NULL-text docs can be neither weakly labeled nor featurized —
    # excluded on both engines (classifier_train filters too)
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from big_data_in_agriculture_spark.functions import text as TXF

    weak = TXF.quality_score("text") > 4.0
    w, b = llm.classifier_train(
        docs, weak, dim=64, iters=8, lr=1.0, l2=1e-4, quantize=6
    )
    # r12: weak label and score are BOTH map-side expressions over the
    # same docs row (classifier_score is one projection; doc_id is the
    # PK), so the old "docs ⋈ scored by doc_id" was the identity
    # re-attachment of each row's own score — a full node-keyed
    # shuffle for nothing (the semantic_dedup r12 pattern, guide §2.4).
    # One projection computes both; values and hash unchanged.
    margin = llm.classifier_margin(F.col("text"), w, b, dim=64)
    return docs.select(
        "doc_id",
        weak.cast("int").alias("weak_label"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 4
        ).cast("float").alias("score"),
    )


def _classifier_quality_sql(
    dim: int = 64, iters: int = 8, lr: float = 1.0, l2: float = 1e-4, q: int = 6
) -> str:
    """DuckDB replay of q_classifier_quality: unrolled gradient descent.

    Bit-parity contract with ``llm.classifier_train(quantize=q)``:
    identical featurization (space split, md5 hashing-trick buckets,
    quality-score weak labels), margin = the same left-to-right fold
    of w[bucket] over the token list / n + b, residual σ(margin)−y,
    per-bucket gradient Σ r/n (fold-order jitter absorbed by the
    ``_quantize_sql`` half-away grid), L2 shrink then step then
    quantize on every weight and the bias — the exact op sequence of
    ``quantize_half_away`` on the Python side.
    Buckets with no occurrences only shrink (LEFT JOIN + COALESCE),
    mirroring the driver loop's untouched entries.

    Every per-iteration CTE is AS MATERIALIZED: each ``w{{i}}`` is
    referenced more than once downstream, and DuckDB's default CTE
    inlining would otherwise re-evaluate the whole prefix per
    reference — exponential (2^iters) work. Materialization makes the
    unroll linear in ``iters`` (measured: 8 iters in well under a
    second vs minutes-and-climbing inlined).
    """
    shrink = repr(1.0 - lr * l2)
    bucket = (
        f"CAST(('0x' || substring(md5(lower(t)), 1, 8))::BIGINT "
        f"% {dim} AS INT)"
    )
    parts = [
        f"""f AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN ((CAST(length(text) AS DOUBLE)
                       - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE))
                     * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE)) > 4.0
                THEN 1.0 ELSE 0.0 END AS y,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
           list_transform(string_split(text, ' '), t -> {bucket}) AS bk
    FROM documents
    WHERE text IS NOT NULL  -- Spark side filters too
),
nd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM f),
w0 AS MATERIALIZED (SELECT CAST(t.j AS INT) AS j, 0.0 AS wj FROM range(0, {dim}) t(j)),
b0 AS MATERIALIZED (SELECT 0.0 AS bv)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""m{i} AS MATERIALIZED (
    SELECT f.doc_id, f.y, f.n, f.bk,
           1.0 / (1.0 + exp(-(
               list_sum(list_transform(f.bk, j -> wl.wv[j + 1])) / f.n
               + b{i - 1}.bv))) - f.y AS r
    FROM f
    CROSS JOIN (SELECT array_agg(wj ORDER BY j) AS wv FROM w{i - 1}) wl
    CROSS JOIN b{i - 1}
),
g{i} AS MATERIALIZED (
    SELECT u.j AS j, sum(m.r / m.n) AS g
    FROM m{i} m, unnest(m.bk) u(j)
    GROUP BY u.j
),
w{i} AS MATERIALIZED (
    SELECT w.j,
           {_quantize_sql(f'(w.wj * {shrink} - {lr!r} * COALESCE(g.g, 0.0) / nd.n_docs)', q)} AS wj
    FROM w{i - 1} w LEFT JOIN g{i} g ON w.j = g.j CROSS JOIN nd
),
b{i} AS MATERIALIZED (
    SELECT {_quantize_sql(f'(b{i - 1}.bv - {lr!r} * (SELECT sum(r) FROM m{i}) / nd.n_docs)', q)} AS bv
    FROM b{i - 1} CROSS JOIN nd
)"""
        )
    chain = ",\n".join(parts)
    return f"""
WITH {chain}
SELECT f.doc_id, CAST(f.y AS INT) AS weak_label,
       CAST(round(1.0 / (1.0 + exp(-(
           list_sum(list_transform(f.bk, j -> wl.wv[j + 1])) / f.n
           + bf.bv))), 4) AS FLOAT) AS score
FROM f
CROSS JOIN (SELECT array_agg(wj ORDER BY j) AS wv FROM w{iters}) wl
CROSS JOIN b{iters} bf
"""


def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full Gopher rule stack in one codegen'd scan; min_words lowered
    # to 40 so the synthetic ~50-token docs split non-vacuously. All
    # signals are exact integer ratios / IEEE-identical divisions, so
    # threshold comparisons agree bit-for-bit across engines.
    return llm.gopher_filter(_t(spark, sf_dir, "documents"), min_words=40)


def _gopher_sql() -> str:
    from big_data_in_agriculture_spark.functions.text import LANG_MARKERS

    stops = ", ".join(
        f"'{w}'" for w in sorted({w for ws in LANG_MARKERS.values() for w in ws})
    )
    return f"""
WITH s AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mwl,
           (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
             + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sym,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS alpha,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> substring(l, 1, 2) IN ('- ', '* '))) AS DOUBLE)
               / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS bullets,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> l LIKE '%...')) AS DOUBLE)
               / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS ellipses,
           len(list_filter(string_split(text, ' '),
                           t -> lower(t) IN ({stops}))) AS stops
    FROM documents
), r AS (
    SELECT *,
           CASE WHEN nt < 40 THEN 'too_few_words'
                WHEN nt > 100000 THEN 'too_many_words'
                WHEN mwl < 3.0 THEN 'short_words'
                WHEN mwl > 10.0 THEN 'long_words'
                WHEN sym > 0.1 THEN 'symbol_spam'
                WHEN bullets > 0.9 THEN 'bullet_heavy'
                WHEN ellipses > 0.3 THEN 'ellipsis_heavy'
                WHEN alpha < 0.80 THEN 'non_alpha'
                WHEN stops < 2 THEN 'no_stopwords'
                ELSE 'ok' END AS reason
    FROM s
)
SELECT doc_id, nt AS n_words,
       CAST(mwl AS FLOAT) AS mean_word_len,
       CAST(sym AS FLOAT) AS symbol_ratio,
       CAST(alpha AS FLOAT) AS alpha_ratio,
       reason,
       CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM r
"""


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # training-shard assignment manifest: the two-level distributed
    # prefix sum cuts the id-ordered corpus at token boundaries; the
    # oracle recomputes shards with the naive OVER (ORDER BY) cumsum —
    # equal manifests prove the bucketed decomposition exact at a
    # second chunk size (pack_chunks oracles 512).
    from big_data_in_agriculture_spark.sources import shards as SH

    sharded = SH.assign_shards(
        _t(spark, sf_dir, "documents"), tokens_per_shard=2000
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("shard")
    )


_SHARD_MANIFEST_SQL = """
WITH o AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
           COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                        OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS off
    FROM documents
    WHERE text IS NOT NULL  -- nothing to shard; Spark side filters too
)
SELECT CAST(floor(off / 2000) AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_id,
       max(doc_id) AS last_id
FROM o
GROUP BY 1
ORDER BY 1
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher repetition family: duplicate-line char mass + top-n-gram
    # coverage, all per-row array math in one scan. Fractions are
    # exact-integer divisions, so threshold comparisons agree
    # bit-for-bit across engines.
    return llm.repetition_filter(_t(spark, sf_dir, "documents"))


def _repetition_sql() -> str:
    def grams(n: int) -> str:
        # element access (tk[i]), NOT list_slice, inside the lambda:
        # DuckDB copies the sliced prefix per lambda invocation, so a
        # list_slice over the full token list per position is O(n²)
        # in document length (24 s per gram size on the --longdoc
        # corpus's 20k-token docs; 0.01 s with element access).
        # concat_ws skips the NULL out-of-bounds tail elements exactly
        # as array_to_string dropped them from the short slice.
        parts = ", ".join(f"tk[i + {j}]" if j else "tk[i]" for j in range(n))
        return (
            f"[concat_ws(' ', {parts}) "
            f"FOR i IN range(1, greatest(len(tk) - {n - 1}, 1) + 1)]"
        )

    def top(n: int) -> str:
        return f"""
        CAST(list_max(list_transform(list_distinct(g{n}),
            g -> CASE WHEN len(list_filter(g{n}, x -> x = g)) >= 2
                      THEN len(list_filter(g{n}, x -> x = g)) * length(g)
                      ELSE 0 END)) AS DOUBLE) / nc AS f{n}"""

    return f"""
WITH s AS (
    SELECT doc_id,
           string_split(text, chr(10)) AS ls,
           string_split(text, ' ') AS tk,
           CAST(greatest(length(text), 1) AS DOUBLE) AS nc
    FROM documents
    WHERE text IS NOT NULL  -- no content to gate; Spark side filters too
), g AS (
    SELECT doc_id, ls, nc,
           {grams(2)} AS g2, {grams(3)} AS g3, {grams(4)} AS g4
    FROM s
), f AS (
    SELECT doc_id,
        CAST(list_sum(list_transform(list_distinct(ls),
            l -> CASE WHEN len(list_filter(ls, x -> x = l)) >= 2
                      THEN len(list_filter(ls, x -> x = l)) * length(l)
                      ELSE 0 END)) AS DOUBLE) / nc AS fdup,
        {top(2)}, {top(3)}, {top(4)}
    FROM g
), r AS (
    SELECT *,
           CASE WHEN fdup > 0.30 THEN 'dup_lines'
                WHEN f2 > 0.20 THEN 'top_2gram'
                WHEN f3 > 0.18 THEN 'top_3gram'
                WHEN f4 > 0.16 THEN 'top_4gram'
                ELSE 'ok' END AS reason
    FROM f
)
SELECT doc_id,
       CAST(fdup AS FLOAT) AS dup_line_frac,
       CAST(f2 AS FLOAT) AS top_2gram_frac,
       CAST(f3 AS FLOAT) AS top_3gram_frac,
       CAST(f4 AS FLOAT) AS top_4gram_frac,
       reason,
       CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM r
"""


def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the whole ranking family on ONE window spec (one shuffle+sort);
    # unique-id tie-break makes ntile boundaries engine-deterministic
    return relational.customer_rank_suite(_t(spark, sf_dir, "customer"))


_WINDOW_RANKS_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       CAST(percent_rank() OVER w AS FLOAT) AS prnk,
       CAST(cume_dist()    OVER w AS FLOAT) AS cdist,
       ntile(4)       OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey)
"""


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shuffle-key skew diagnostic on the natural join key: one scan,
    # per-key partial agg, totals ride back as a broadcast 1-row
    # cross join (AQE reuses the groupBy exchange across branches)
    from big_data_in_agriculture_spark.operators.profile import key_skew

    return key_skew(_t(spark, sf_dir, "events"), ["user_id"], top=10)


_KEY_SKEW_SQL = """
WITH c AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
s AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS tot,
             CAST(count(*) AS DOUBLE) AS nk FROM c)
SELECT c.user_id, c.n_rows,
       CAST(c.n_rows / s.tot AS FLOAT) AS share,
       CAST(c.n_rows * s.nk / s.tot AS FLOAT) AS skew_ratio
FROM c CROSS JOIN s
ORDER BY c.n_rows DESC, c.user_id
LIMIT 10
"""


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval×interval overlap as a binned equi-join (both sides
    # explode to bins; each pair survives only in its overlap-start
    # bin — exactly once, no distinct). Oracle uses the naive
    # inequality join, proving the decomposition exact.
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    half_hour = 1_800_000_000
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("t").alias("c_lo"),
        (F.col("t") + half_hour).alias("c_hi"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("t").alias("p_lo"),
        (F.col("t") + half_hour).alias("p_hi"),
    )
    return relational.interval_overlap_join(
        clicks,
        purchases,
        ["user_id"],
        "c_lo",
        "c_hi",
        "p_lo",
        "p_hi",
        bin_width=half_hour,
    ).select("user_id", "click_id", "purchase_id")


_INTERVAL_OVERLAP_SQL = """
WITH b AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
),
c AS (
    SELECT user_id, event_id AS click_id, t AS c_lo,
           t + 1800000000 AS c_hi
    FROM b WHERE event_type = 'click'
),
p AS (
    SELECT user_id, event_id AS purchase_id, t AS p_lo,
           t + 1800000000 AS p_hi
    FROM b WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, p.purchase_id
FROM c JOIN p
  ON c.user_id = p.user_id
 AND c.c_lo <= p.p_hi AND p.p_lo <= c.c_hi
"""


def q_gopher_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the two Gopher rule families composed: survivors of BOTH gates,
    # rolled up per language — one oracle checking the gates compose
    # (join semantics + keep flags) end-to-end, not just row-by-row.
    docs = _t(spark, sf_dir, "documents")
    ok_struct = (
        llm.gopher_filter(docs, min_words=40)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    ok_rep = (
        llm.repetition_filter(docs)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    from big_data_in_agriculture_spark.functions import text as TXF

    return (
        docs.join(ok_struct, "doc_id")
        .join(ok_rep, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TXF.n_tokens("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def _gopher_pipeline_sql() -> str:
    return f"""
WITH gop AS ({_gopher_sql()}),
rep AS ({_repetition_sql()})
SELECT d.lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens
FROM documents d
JOIN gop ON d.doc_id = gop.doc_id AND gop.keep = 1
JOIN rep ON d.doc_id = rep.doc_id AND rep.keep = 1
GROUP BY d.lang
ORDER BY d.lang
"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.timeseries import (
        cusum_changepoint,
    )

    return cusum_changepoint(_t(spark, sf_dir, "events"))


_DENSE_DAILY_SQL = """
    sparse AS (
        SELECT event_type AS key, date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT key, unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS day
        FROM sparse GROUP BY key
    ),
    daily AS (
        SELECT spine.key, spine.day, coalesce(sparse.n, 0) AS n
        FROM spine LEFT JOIN sparse
          ON spine.key = sparse.key AND spine.day = sparse.day
    )
"""

_CUSUM_SQL = f"""
WITH {_DENSE_DAILY_SQL},
stats AS (
    SELECT key, sum(n) AS tot, count(*) AS n_days FROM daily GROUP BY key
),
scored AS (
    SELECT d.key, d.day, s.n_days,
           sum(d.n - CAST(s.tot AS DOUBLE) / s.n_days)
               OVER (PARTITION BY d.key ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cusum
    FROM daily d JOIN stats s ON d.key = s.key
),
ranked AS (
    SELECT key, day, n_days, cusum,
           row_number() OVER (PARTITION BY key
                              ORDER BY abs(cusum) DESC, day) AS rn
    FROM scored
)
SELECT key,
       CAST(day AS TIMESTAMP) AS changepoint_day,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(abs(cusum) AS FLOAT) AS max_drift
FROM ranked WHERE rn = 1
ORDER BY key
"""


def q_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    return seasonal_naive_backtest(_t(spark, sf_dir, "events"))


_SEASONAL_BACKTEST_SQL = f"""
WITH {_DENSE_DAILY_SQL},
lagged AS (
    SELECT key, n,
           lag(n, 1) OVER w AS l1,
           lag(n, 7) OVER w AS ls
    FROM daily
    WINDOW w AS (PARTITION BY key ORDER BY day)
)
SELECT key,
       count(*) AS n_days_scored,
       CAST(CAST(sum(abs(n - l1)) AS DOUBLE) / count(*) AS FLOAT) AS mae_naive,
       CAST(CAST(sum(abs(n - ls)) AS DOUBLE) / count(*) AS FLOAT) AS mae_seasonal,
       CAST(CAST(sum(abs(n - ls)) AS DOUBLE) / sum(abs(n - l1)) AS FLOAT)
           AS seasonal_error_ratio
FROM lagged
WHERE l1 IS NOT NULL AND ls IS NOT NULL
GROUP BY key
ORDER BY key
"""


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # target slice = English docs; score every doc's target-likeness
    docs = _t(spark, sf_dir, "documents")
    return llm.dsir_scores(docs, F.col("lang") == "en", buckets=4096)


def _dsir_sql(buckets: int = 4096) -> str:
    """DuckDB replay of the DSIR pipeline (llm.dsir_scores).

    Same md5 fixed-point buckets (feature_bucket), exact-integer
    counts, add-one smoothing; the per-doc Σ log-ratio is fold-order
    dependent across engines — absorbed by the float32 cast like every
    order-dependent aggregate in the suite.
    """
    return f"""
WITH toks AS (
    SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, tgt,
           unnest(list_concat(
               [('0x' || substr(md5(lower(x)), 1, 8))::BIGINT % {buckets}
                FOR x IN t],
               [('0x' || substr(md5(lower(t[i] || ' ' || t[i+1])), 1, 8))::BIGINT
                % {buckets}
                FOR i IN range(1, greatest(len(t), 1))]
           )) AS bucket
    FROM toks
),
per_bucket AS (
    SELECT bucket,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_t,
           sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS n_r
    FROM grams GROUP BY bucket
),
totals AS (
    SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM per_bucket
),
model AS (
    SELECT bucket,
           ln((n_t + 1)::DOUBLE / (tot_t + {buckets})::DOUBLE)
           - ln((n_r + 1)::DOUBLE / (tot_r + {buckets})::DOUBLE) AS log_ratio
    FROM per_bucket, totals
)
SELECT g.doc_id,
       count(*) AS n_grams,
       CAST(sum(m.log_ratio) AS FLOAT) AS dsir_score
FROM grams g JOIN model m ON g.bucket = m.bucket
GROUP BY g.doc_id
"""


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: state built from 80% of events,
    the other 20% folded in incrementally — output must equal the
    full-history rollup (which is exactly what the oracle computes)."""
    from big_data_in_agriculture_spark.operators import materialized as mv

    ev = _t(spark, sf_dir, "events")
    history = ev.filter(F.col("event_id") % 5 < 4)
    delta = ev.filter(F.col("event_id") % 5 == 4)
    state = mv.rollup_state(history, ["event_type"])
    updated = mv.incremental_rollup_update(state, delta, ["event_type"])
    return mv.serve_rollup(updated).withColumn(
        "day", F.col("day").cast("timestamp")
    )


_INCREMENTAL_ROLLUP_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       CAST(avg(value) AS FLOAT) AS value_mean,
       CAST(sum(value) AS FLOAT) AS value_sum,
       CAST(min(value) AS FLOAT) AS value_min,
       CAST(max(value) AS FLOAT) AS value_max
FROM events
GROUP BY 1, 2
"""


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG hybrid retrieval: BM25 lexical top-20 ∪ cosine-kNN semantic
    top-20 (query = embedding 0, ids aligned to doc ids in the
    synthetic tables), fused with reciprocal-rank fusion."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    from pyspark.sql import Window as W

    lexical = llm.bm25_search(docs, "hash join filter", top_k=20)
    # invalid embeddings excluded at entry (vec_is_valid convention)
    emb = emb.filter(similarity.vec_is_valid(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    sim = F.round(
        similarity.cosine(F.col("q_vec"), F.col("embedding")), 6
    )
    semantic = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("cos"))
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("cos").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("rank") <= 20)
    )
    return llm.hybrid_search_rrf(lexical, semantic, k=10)


_HYBRID_SQL = f"""
WITH lex AS (
    SELECT doc_id, rank AS rl FROM ({_BM25_SQL.replace("LIMIT 10", "LIMIT 20")})
),
qv AS (
    -- invalid embeddings excluded (vec_is_valid convention)
    SELECT embedding::DOUBLE[] AS q FROM embeddings
    WHERE vec_id = 0 AND {_VALID_VEC}
),
sem AS (
    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rs
    FROM (
        SELECT e.vec_id AS doc_id,
               round(CASE WHEN (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                      e.embedding::DOUBLE[]))
                                * sqrt(list_dot_product(qv.q, qv.q))) > 0
                          THEN list_dot_product(e.embedding::DOUBLE[], qv.q)
                               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                        e.embedding::DOUBLE[]))
                                  * sqrt(list_dot_product(qv.q, qv.q)))
                          ELSE 0.0 END, 6) AS cos
        FROM embeddings e, qv WHERE e.vec_id <> 0 AND {_VALID_VEC}
    )
    QUALIFY rs <= 20
),
fused AS (
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           lex.rl, sem.rs,
           coalesce(1.0 / (60 + lex.rl), 0.0)
           + coalesce(1.0 / (60 + sem.rs), 0.0) AS rrf
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id,
       CAST(rl AS BIGINT) AS lexical_rank,
       CAST(rs AS BIGINT) AS semantic_rank,
       CAST(rrf AS FLOAT) AS rrf_score,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
FROM fused
QUALIFY rank <= 10
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Round-7 widening: web-crawl curation (URL canonicalization + skew-safe
# per-domain caps) and random-projection (JL) similarity search.
# ---------------------------------------------------------------------------

def _synth_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL corpus derived from documents (the driver
    testdata has no URL column, same trick as the CDC/SCD2 streams
    synthesized from orders). Twelve templates exercise every
    canonicalization rule — mixed-case scheme/host, default (80/443)
    and explicit ports, tracking params, unsorted params, fragments,
    multi-label public suffixes (co.uk/ac.uk), sub-subdomains, a
    pathless URL, userinfo (user:pass@ and user@ — dropped from the
    canonical form, round-8 fix), and exact-duplicate URLs — and make
    registered domain example.com hot (~50% of rows) so the per-domain
    cap has real skew to cut. Round 9 widens 12 → 20 templates with
    the HOSTILE shapes the round-7/8 defects proved necessary in the
    standing two-engine sweep (not just unit tests): IPv6 bracket
    literals (distinct addresses sharing a first group — the round-8
    silent-merge shape), dotted-quad IPv4, punycode, double-@
    userinfo, a >1000-char path (the old regex-bound trap), and
    unparseable pass-through rows. SQL twin: _URL_SYNTH_SQL."""
    d = F.col("doc_id")

    def s(e) -> F.Column:
        return e.cast("string")

    m = d % 20
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTP://Crawl.Example.COM:80/p/"), s(d % 97),
            F.lit("?utm_source=rss&z=9&a=1")))
        .when(m == 1, F.concat(
            F.lit("https://news.example.co.uk/art-"), s(d),
            F.lit("?fbclid=abc123#top")))
        .when(m == 2, F.concat(
            F.lit("https://Blog.Example.com:443/post/"), s(d % 31)))
        .when(m == 3, F.concat(
            F.lit("http://shop.example.com:8080/item?b=2&a=1&utm_campaign=x&i="),
            s(d % 53)))
        .when(m == 4, F.concat(
            F.lit("https://crawl.example.com/q/"), s(d % 13), F.lit("#frag")))
        .when(m == 5, F.concat(
            F.lit("http://www.site"), s(d % 37), F.lit(".org/m/"), s(d)))
        .when(m == 6, F.concat(
            F.lit("https://docs.uni"), s(d % 11), F.lit(".ac.uk/d/"),
            s(d % 7), F.lit("?q="), s(d % 5)))
        .when(m == 7, F.concat(
            F.lit("https://crawl.example.com/c?utm_medium=feed&gclid=1&x="),
            s(d % 3)))
        .when(m == 8, F.lit("http://example.io?ref=home"))
        .when(m == 9, F.concat(
            F.lit("https://a.b.example.com/deep/"), s(d % 11)))
        .when(m == 10, F.concat(
            F.lit("http://user:pw@auth.example.com/s/"), s(d % 9)))
        .when(m == 11, F.concat(
            F.lit("https://alice@mirror.example.co.uk/m/"), s(d % 6),
            F.lit("?b=2&a=1")))
        .when(m == 12, F.concat(
            F.lit("http://[2001:db8::"), s(d % 9 + 1),
            F.lit("]:8080/v6/"), s(d % 7)))
        .when(m == 13, F.concat(
            F.lit("https://[2001:DB8::1]/x/"), s(d % 5)))
        .when(m == 14, F.concat(
            F.lit("http://10."), s(d % 256), F.lit(".3.4/a/"), s(d % 3)))
        .when(m == 15, F.concat(
            F.lit("http://xn--bcher-kva.example/x?b="), s(d % 4),
            F.lit("&a=1&utm_term=z")))
        .when(m == 16, F.concat(
            F.lit("http://u@h@trap.example.com/x/"), s(d % 6)))
        .when(m == 17, F.concat(
            F.lit("http://long.example.org/"), F.repeat(F.lit("p"), 1100),
            F.lit("/"), s(d % 5)))
        .when(m == 18, F.concat(F.lit("not a url "), s(d % 3)))
        .otherwise(F.concat(F.lit("#frag-"), s(d % 4)))
    )
    return docs.select("doc_id", url.alias("url"))


_URL_SYNTH_SQL = """
    SELECT doc_id,
           CASE doc_id % 20
             WHEN 0 THEN 'HTTP://Crawl.Example.COM:80/p/'
                         || (doc_id % 97)::VARCHAR || '?utm_source=rss&z=9&a=1'
             WHEN 1 THEN 'https://news.example.co.uk/art-'
                         || doc_id::VARCHAR || '?fbclid=abc123#top'
             WHEN 2 THEN 'https://Blog.Example.com:443/post/'
                         || (doc_id % 31)::VARCHAR
             WHEN 3 THEN 'http://shop.example.com:8080/item?b=2&a=1&utm_campaign=x&i='
                         || (doc_id % 53)::VARCHAR
             WHEN 4 THEN 'https://crawl.example.com/q/'
                         || (doc_id % 13)::VARCHAR || '#frag'
             WHEN 5 THEN 'http://www.site' || (doc_id % 37)::VARCHAR
                         || '.org/m/' || doc_id::VARCHAR
             WHEN 6 THEN 'https://docs.uni' || (doc_id % 11)::VARCHAR
                         || '.ac.uk/d/' || (doc_id % 7)::VARCHAR
                         || '?q=' || (doc_id % 5)::VARCHAR
             WHEN 7 THEN 'https://crawl.example.com/c?utm_medium=feed&gclid=1&x='
                         || (doc_id % 3)::VARCHAR
             WHEN 8 THEN 'http://example.io?ref=home'
             WHEN 9 THEN 'https://a.b.example.com/deep/'
                         || (doc_id % 11)::VARCHAR
             WHEN 10 THEN 'http://user:pw@auth.example.com/s/'
                          || (doc_id % 9)::VARCHAR
             WHEN 11 THEN 'https://alice@mirror.example.co.uk/m/'
                          || (doc_id % 6)::VARCHAR || '?b=2&a=1'
             WHEN 12 THEN 'http://[2001:db8::' || (doc_id % 9 + 1)::VARCHAR
                          || ']:8080/v6/' || (doc_id % 7)::VARCHAR
             WHEN 13 THEN 'https://[2001:DB8::1]/x/'
                          || (doc_id % 5)::VARCHAR
             WHEN 14 THEN 'http://10.' || (doc_id % 256)::VARCHAR
                          || '.3.4/a/' || (doc_id % 3)::VARCHAR
             WHEN 15 THEN 'http://xn--bcher-kva.example/x?b='
                          || (doc_id % 4)::VARCHAR || '&a=1&utm_term=z'
             WHEN 16 THEN 'http://u@h@trap.example.com/x/'
                          || (doc_id % 6)::VARCHAR
             WHEN 17 THEN 'http://long.example.org/' || repeat('p', 1100)
                          || '/' || (doc_id % 5)::VARCHAR
             WHEN 18 THEN 'not a url ' || (doc_id % 3)::VARCHAR
             ELSE '#frag-' || (doc_id % 4)::VARCHAR
           END AS url
    FROM documents
"""


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical dedup key + registered domain for every synthesized URL;
    # map-only (operators/web.py:with_url_keys).
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = web_ops.with_url_keys(_synth_urls(docs))
    return out.select("doc_id", "url", "canon_url", "domain").orderBy("doc_id")


def _host_of_canon_sql(canon_expr: str) -> str:
    return WEB.url_host_sql(canon_expr)


def _url_canonical_sql() -> str:
    canon = WEB.canonicalize_url_sql("url")
    dom = WEB.registered_domain_sql(_host_of_canon_sql("canon_url"))
    return f"""
WITH urls AS ({_URL_SYNTH_SQL}),
c AS (SELECT doc_id, url, {canon} AS canon_url FROM urls)
SELECT doc_id, url, canon_url, {dom} AS domain
FROM c ORDER BY doc_id
"""


def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keep 5 docs per registered domain, selected by the deterministic
    # (md5(canon_url), doc_id) priority; Catalyst's WindowGroupLimit
    # bounds the hot domain map-side (plan pinned in tests/test_web.py).
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = web_ops.domain_cap(_synth_urls(docs), cap=5)
    return out.select("doc_id", "domain", "domain_rank").orderBy(
        "domain", "domain_rank"
    )


def _domain_cap_sql(cap: int = 5) -> str:
    canon = WEB.canonicalize_url_sql("url")
    dom = WEB.registered_domain_sql(_host_of_canon_sql("canon_url"))
    return f"""
WITH urls AS ({_URL_SYNTH_SQL}),
c AS (SELECT doc_id, url, {canon} AS canon_url FROM urls),
k AS (SELECT doc_id, canon_url, {dom} AS domain, md5(canon_url) AS prio FROM c),
r AS (
    SELECT doc_id, domain,
           CAST(row_number() OVER (PARTITION BY domain
                                   ORDER BY prio, doc_id) AS INTEGER)
               AS domain_rank
    FROM k
)
SELECT doc_id, domain, domain_rank FROM r
WHERE domain_rank <= {cap}
ORDER BY domain, domain_rank
"""


def q_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JL random projection 64 -> 16, long form (vec_id, j, comp); the
    # literal sign matrix is similarity._rp_signs — both engines
    # multiply the identical constants. comp re-quantized to 6 for the
    # value hash (the operator keeps 9 internally for downstream use).
    # BOTH roundings are the explicit half-away op sequence
    # (_quantize_col / _quantize_sql), NOT engine round: re-rounding a
    # 9dp-grid double to 6dp hits decimal ties where Spark (shortest
    # decimal repr, HALF_UP) and DuckDB (binary) disagree — the
    # round-8 fuzz corpus caught exactly one such component.
    emb = _t(spark, sf_dir, "embeddings")
    p = similarity.random_project(emb, in_dim=64, out_dim=16)
    return (
        p.select("vec_id", F.posexplode("proj").alias("j", "comp"))
        .select(
            "vec_id", "j",
            similarity._quantize_col(F.col("comp"), 6).alias("comp"),
        )
        .orderBy("vec_id", "j")
    )


def _rp_proj_list_sql(seed: int, out_dim: int, in_dim: int,
                      round_digits: int = 9) -> str:
    """DuckDB list expression: the JL projection of DOUBLE[] column v
    (mirrors similarity.random_project: per-row dots against the same
    literal matrix, each component QUANTIZED — the explicit half-away
    op sequence, bit-identical to _quantize_col — before downstream
    use)."""
    rows = similarity._rp_signs(seed, out_dim, in_dim)
    entries = ",\n      ".join(
        _quantize_sql(
            "list_dot_product(v, ["
            + ", ".join(repr(x) for x in row)
            + "]::DOUBLE[])",
            round_digits,
        )
        for row in rows
    )
    return "[\n      " + entries + "\n    ]"


def _rp_project_sql(out_dim: int = 16) -> str:
    proj = _rp_proj_list_sql(42, out_dim, 64)
    return f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
p AS (SELECT vec_id, {proj} AS proj FROM e)
SELECT vec_id, j::INTEGER AS j, {_quantize_sql("proj[j + 1]", 6)} AS comp
FROM p, range({out_dim}) t(j)
ORDER BY vec_id, j
"""


def q_knn_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # third ANN path (beside sign-LSH and IVF): project 64 -> 32,
    # screen to 50 candidates per query in projected space, exact
    # re-rank to top 3. Same output schema as knn_bruteforce.
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_rp(
        emb, queries, dim=64, k=3, out_dim=32, n_candidates=50
    )


def _knn_rp_sql(k: int = 3, out_dim: int = 32, n_candidates: int = 50) -> str:
    proj = _rp_proj_list_sql(42, out_dim, 64)
    cos = (
        "round(CASE WHEN (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))) > 0"
        " THEN list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
        " ELSE 0.0 END, 6)"
    )
    return f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
p AS (SELECT vec_id, v, {proj} AS pv FROM e),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           q.v AS qv, c.v AS cv,
           {cos.format(a="q.pv", b="c.pv")} AS proj_sim
    FROM p q, p c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
),
cand AS (
    SELECT query_id, neighbor_id, qv, cv
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY proj_sim DESC, neighbor_id)
            <= {n_candidates}
),
exact AS (
    SELECT query_id, neighbor_id,
           {cos.format(a="qv", b="cv")} AS cosine_sim
    FROM cand
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id)
            AS INTEGER) AS rank
FROM exact
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# Product quantization (round 7, second block): pq_codes + knn_pq.
# ---------------------------------------------------------------------------

_PQ_SUB = 8          # subspaces (64 dims -> 8 blocks of 8)
_PQ_CODES = 16       # centroids per subspace codebook
_PQ_ITERS = 2        # quantized-kmeans iterations per codebook
_PQ_Q = 6            # centroid quantization decimals (kmeans contract)


_IVF_ITERS = 2       # coarse-quantizer kmeans iterations (ivf / ivfpq)


def _corpus_sig(sf_dir: str) -> tuple:
    """Cheap immutability signature for per-corpus model memoization:
    (abspath, mtime_ns, size) of embeddings.parquet. Keying caches on
    this instead of the bare path means a corpus REWRITTEN at the same
    path gets freshly trained models instead of stale ones (the round-7
    `_PQ_BOOK_CACHE` watch item)."""
    import os

    p = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(p)
        return (os.path.abspath(sf_dir), st.st_mtime_ns, st.st_size)
    except OSError:
        return (os.path.abspath(sf_dir), -1, -1)


#: trained codebooks per corpus signature — pq_train is
#: bit-deterministic (quantized kmeans, tested), so memoizing is
#: semantics-free for an unchanged corpus and mirrors production
#: (train once, reuse across query batches); the bench's knn_pq
#: otherwise re-pays 8 kmeans fits per run.
_PQ_BOOK_CACHE: dict[tuple, list[list[list[float]]]] = {}


def _pq_books(spark: SparkSession, sf_dir: str):
    emb = _t(spark, sf_dir, "embeddings")
    key = _corpus_sig(sf_dir)
    books = _PQ_BOOK_CACHE.get(key)
    if books is None:
        books = similarity.pq_train(
            emb, dim=64, n_subspaces=_PQ_SUB, n_codes=_PQ_CODES,
            max_iter=_PQ_ITERS, quantize=_PQ_Q,
        )
        _PQ_BOOK_CACHE[key] = books
    return emb, books


#: (coarse centroids, residual codebooks) per corpus signature — the
#: IVF-PQ model pair is trained together (residual codebooks are only
#: meaningful against the centroids they were fit with).
_IVFPQ_MODEL_CACHE: dict[tuple, tuple] = {}


def _ivfpq_model(spark: SparkSession, sf_dir: str):
    emb = _t(spark, sf_dir, "embeddings")
    key = _corpus_sig(sf_dir)
    model = _IVFPQ_MODEL_CACHE.get(key)
    if model is None:
        model = similarity.ivfpq_train(
            emb, dim=64, n_centroids=16, coarse_iters=_IVF_ITERS,
            n_subspaces=_PQ_SUB, n_codes=_PQ_CODES, max_iter=_PQ_ITERS,
            quantize=_PQ_Q,
        )
        _IVFPQ_MODEL_CACHE[key] = model
    return emb, model


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PQ encode stage in the open: (vec_id, subspace, code) long form.
    # Codebooks are the bit-replayable quantized k-means per 8-dim
    # slice, so the SQL twin re-derives them and the codes hash-match.
    emb, books = _pq_books(spark, sf_dir)
    if not books or not books[0]:
        return emb.select(
            "vec_id",
            F.lit(0).alias("s"),
            F.lit(0).alias("code"),
        ).filter(F.lit(False))
    return (
        similarity.pq_encode(emb, books, dim=64)
        .select("vec_id", F.posexplode("pq_codes").alias("s", "code"))
        .orderBy("vec_id", "s")
    )


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fourth ANN path: PQ/ADC screen (8 LUT lookups per pair on 8-byte
    # codes) + exact re-rank of 50 survivors per query.
    emb, books = _pq_books(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_pq(
        emb, queries, dim=64, k=3, n_subspaces=_PQ_SUB,
        n_codes=_PQ_CODES, n_candidates=50, max_iter=_PQ_ITERS,
        quantize=_PQ_Q, codebooks=books,
    )


def _pq_with_clause() -> str:
    """Shared WITH-clause body: valid vectors, per-subspace slices,
    one namespaced kmeans CTE chain per subspace, the encode table
    (vec_id, s, code), and the per-query LUT rows (vec_id, s, cid, d).

    Distances use the kmeans chain's exact fold
    (list_sum(list_transform(...))); codebooks are the chains' final
    CTEs, so the whole PQ model is re-derived inside DuckDB."""
    sub_dim = 64 // _PQ_SUB
    parts = [
        f"""e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
)"""
    ]
    enc_blocks, lut_blocks = [], []
    for s in range(_PQ_SUB):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        parts.append(
            f"sub{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e)"
        )
        parts.append(
            _kmeans_cte_chain(
                _PQ_ITERS, _PQ_CODES, sub_dim, _PQ_Q,
                source=f"sub{s}", prefix=f"s{s}",
            )
        )
        dist = (
            f"list_sum(list_transform(range(1, {sub_dim + 1}), "
            f"j -> (e.v[j]-c.cv[j])*(e.v[j]-c.cv[j])))"
        )
        enc_blocks.append(
            f"""    SELECT vec_id, {s} AS s, cid AS code FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM sub{s} e, s{s}c{_PQ_ITERS} c
    ) WHERE rn = 1"""
        )
        lut_blocks.append(
            f"""    SELECT e.vec_id, {s} AS s, c.cid, {dist} AS d
    FROM sub{s} e, s{s}c{_PQ_ITERS} c
    WHERE e.vec_id < 10"""
        )
    parts.append(
        "enc AS (\n" + "\n    UNION ALL\n".join(enc_blocks) + "\n)"
    )
    parts.append(
        "lutrows AS (\n" + "\n    UNION ALL\n".join(lut_blocks) + "\n)"
    )
    return ",\n".join(parts)


def _pq_codes_sql() -> str:
    return f"""
WITH {_pq_with_clause()}
SELECT vec_id, s, code FROM enc
ORDER BY vec_id, s
"""


def _knn_pq_sql(k: int = 3, n_candidates: int = 50) -> str:
    cos = (
        "round(CASE WHEN (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))) > 0"
        " THEN list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
        " ELSE 0.0 END, 6)"
    )
    return f"""
WITH {_pq_with_clause()},
codes AS (
    SELECT vec_id, array_agg(code ORDER BY s) AS codes FROM enc
    GROUP BY vec_id
),
qlut AS (
    SELECT vec_id, array_agg(larr ORDER BY s) AS lut FROM (
        SELECT vec_id, s, array_agg(d ORDER BY cid) AS larr
        FROM lutrows GROUP BY vec_id, s
    ) GROUP BY vec_id
),
scored AS (
    -- ADC: same left-to-right list_sum fold as Spark's
    -- aggregate(zip_with(lut, codes)) — 1-based: lut[s], codes[s]+1
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_sum(list_transform(range(1, {_PQ_SUB + 1}),
                 s -> q.lut[s][c.codes[s] + 1])), 6) AS approx_d
    FROM qlut q, codes c
    WHERE c.vec_id <> q.vec_id
),
cand AS (
    SELECT query_id, neighbor_id FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id)
            <= {n_candidates}
),
exact AS (
    SELECT cand.query_id, cand.neighbor_id,
           {cos.format(a="eq.v", b="ec.v")} AS cosine_sim
    FROM cand
    JOIN e eq ON eq.vec_id = cand.query_id
    JOIN e ec ON ec.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id)
            AS INTEGER) AS rank
FROM exact
QUALIFY rank <= {k}
"""


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the composed index: TRAINED IVF cells prune WHICH vectors score,
    # RESIDUAL PQ codes shrink WHAT the scoring reads (round 8 — the
    # Jégou-standard composition; the raw-vector variant is gone).
    emb, (cents, books) = _ivfpq_model(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_ivfpq(
        emb, queries, dim=64, k=3, n_centroids=16, n_probe=4,
        n_subspaces=_PQ_SUB, n_codes=_PQ_CODES, n_candidates=50,
        max_iter=_PQ_ITERS, quantize=_PQ_Q, codebooks=books,
        centroids=cents, coarse_iters=_IVF_ITERS,
    )


def _knn_ivfpq_sql(
    k: int = 3, n_centroids: int = 16, n_probe: int = 4,
    n_candidates: int = 50, dim: int = 64,
) -> str:
    """DuckDB replay of the ROUND-8 residual IVF-PQ pipeline: trained
    coarse chain (prefix g) → assignment → residual vectors → one
    namespaced kmeans chain PER SUBSPACE over residual slices (prefix
    r{s}) → residual codes + per-(query, probed-cell) residual LUTs →
    ADC screen → exact re-rank. Every stage is the op-for-op twin of
    similarity.ivfpq_train / knn_ivfpq (same folds, same argmin
    tie-breaks, float64 residual subtraction exact on both engines)."""
    cos = (
        "round(CASE WHEN (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))) > 0"
        " THEN list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
        " ELSE 0.0 END, 6)"
    )
    sub_dim = dim // _PQ_SUB
    # MATERIALIZED (DuckDB-only syntax; oracles never run on Spark):
    # without it DuckDB INLINES each CTE per reference, and the 8
    # subspace chains each re-expand resid -> assigned -> the whole
    # coarse chain -> e, an exponential blowup that exhausted file
    # handles re-opening the parquet before it exhausted time.
    parts = [
        f"""e AS MATERIALIZED (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
)""",
        _kmeans_cte_chain(
            _IVF_ITERS, n_centroids, dim, _PQ_Q, source="e", prefix="g"
        ),
        f"cent AS MATERIALIZED (SELECT cid, cv FROM gc{_IVF_ITERS})",
        f"""cdists AS MATERIALIZED (
    SELECT e.vec_id, cent.cid,
           list_sum(list_transform(range(1, {dim + 1}),
                    i -> (e.v[i]-cent.cv[i])*(e.v[i]-cent.cv[i]))) AS d
    FROM e, cent
)""",
        """assigned AS MATERIALIZED (
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM cdists
    ) WHERE rn = 1
)""",
        f"""probed AS MATERIALIZED (
    SELECT vec_id AS query_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM cdists WHERE vec_id < 10
    ) WHERE rn <= {n_probe}
)""",
        f"""resid AS MATERIALIZED (
    SELECT e.vec_id, a.cluster,
           list_transform(range(1, {dim + 1}), i -> e.v[i] - c.cv[i]) AS v
    FROM e
    JOIN assigned a ON a.vec_id = e.vec_id
    JOIN cent c ON c.cid = a.cluster
)""",
        f"""qresid AS MATERIALIZED (
    SELECT p.query_id, p.cluster,
           list_transform(range(1, {dim + 1}), i -> e.v[i] - c.cv[i]) AS v
    FROM probed p
    JOIN e ON e.vec_id = p.query_id
    JOIN cent c ON c.cid = p.cluster
)""",
    ]
    enc_blocks, lut_blocks = [], []
    for s in range(_PQ_SUB):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        parts.append(
            f"rsub{s} AS MATERIALIZED "
            f"(SELECT vec_id, v[{lo}:{hi}] AS v FROM resid)"
        )
        parts.append(
            _kmeans_cte_chain(
                _PQ_ITERS, _PQ_CODES, sub_dim, _PQ_Q,
                source=f"rsub{s}", prefix=f"r{s}",
            )
        )
        dist = (
            f"list_sum(list_transform(range(1, {sub_dim + 1}), "
            f"j -> (e.v[j]-c.cv[j])*(e.v[j]-c.cv[j])))"
        )
        enc_blocks.append(
            f"""    SELECT vec_id, {s} AS s, cid AS code FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM rsub{s} e, r{s}c{_PQ_ITERS} c
    ) WHERE rn = 1"""
        )
        # per-(query, probed cell) LUT over the query's residual vs
        # THAT cell — direct element indexing (qr.v[off+j]), not a
        # slice inside the lambda (which DuckDB copies per position)
        lut_blocks.append(
            f"""    SELECT qr.query_id, qr.cluster, {s} AS s, c.cid,
           list_sum(list_transform(range(1, {sub_dim + 1}),
                    j -> (qr.v[{s * sub_dim} + j]-c.cv[j])
                         *(qr.v[{s * sub_dim} + j]-c.cv[j]))) AS d
    FROM qresid qr, r{s}c{_PQ_ITERS} c"""
        )
    parts.append(
        "enc AS (\n" + "\n    UNION ALL\n".join(enc_blocks) + "\n)"
    )
    parts.append(
        "lutrows AS (\n" + "\n    UNION ALL\n".join(lut_blocks) + "\n)"
    )
    parts.append(
        """codes AS (
    SELECT vec_id, array_agg(code ORDER BY s) AS codes FROM enc
    GROUP BY vec_id
)"""
    )
    parts.append(
        """qlut AS (
    SELECT query_id, cluster, array_agg(larr ORDER BY s) AS lut FROM (
        SELECT query_id, cluster, s, array_agg(d ORDER BY cid) AS larr
        FROM lutrows GROUP BY query_id, cluster, s
    ) GROUP BY query_id, cluster
)"""
    )
    with_body = ",\n".join(parts)
    return f"""
WITH {with_body},
scored AS (
    -- a neighbor lives in exactly ONE cell: no cross-probe dedup
    SELECT q.query_id, a.vec_id AS neighbor_id,
           round(list_sum(list_transform(range(1, {_PQ_SUB + 1}),
                 s -> q.lut[s][c.codes[s] + 1])), 6) AS approx_d
    FROM qlut q
    JOIN assigned a ON a.cluster = q.cluster
    JOIN codes c ON c.vec_id = a.vec_id
    WHERE a.vec_id <> q.query_id
),
cand AS (
    SELECT query_id, neighbor_id FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id)
            <= {n_candidates}
),
exact AS (
    SELECT cand.query_id, cand.neighbor_id,
           {cos.format(a="eq.v", b="ec.v")} AS cosine_sim
    FROM cand
    JOIN e eq ON eq.vec_id = cand.query_id
    JOIN e ec ON ec.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id)
            AS INTEGER) AS rank
FROM exact
QUALIFY rank <= {k}
"""


def q_lm_backoff_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet-style LM quality signal: stupid-backoff trigram model
    # trained on the doc_id % 5 != 0 slice, every >= 3-token doc
    # scored (held-out fifth exercises real backoff/OOV paths).
    # Per-token log10 scores are integer micros, so the per-doc sums
    # are bit-exact LONGs on both engines (operators/llm.py
    # lm_perplexity).
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    return llm.lm_stupid_backoff(docs, train=train).orderBy("doc_id")


def _lm_backoff_sql(alpha: str = "0.4") -> str:
    """DuckDB replay of the full LM pipeline: token lists, the three
    count tables, the five-way backoff join, the micro-log fold, the
    LONG sum, and the quantized perplexity. Every DECIMAL-looking
    constant is CAST to DOUBLE (DuckDB binds bare 0.4 as DECIMAL and
    0.4*0.4 would be an exact 0.16 instead of the IEEE product).
    MATERIALIZED keeps the shared token/count frames from being
    re-inlined per reference."""
    a = f"CAST({alpha} AS DOUBLE)"
    ppl = (
        "power(CAST(10.0 AS DOUBLE), CAST(-logprob_micro AS DOUBLE)"
        " / (CAST(n_scored AS DOUBLE) * CAST(1000000.0 AS DOUBLE)))"
    )
    return f"""
WITH tr AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
    FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 0
),
alldocs AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
    FROM documents WHERE text IS NOT NULL
),
uni AS MATERIALIZED (
    SELECT g AS w1, count(*) AS c
    FROM (SELECT unnest(tk) AS g FROM tr) GROUP BY 1
),
bi AS MATERIALIZED (
    SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c FROM (
        SELECT unnest(list_transform(range(2, len(tk) + 1),
               i -> struct_pack(w1 := tk[i - 1], w2 := tk[i]))) AS g
        FROM tr
    ) GROUP BY 1, 2
),
tri AS MATERIALIZED (
    SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, count(*) AS c FROM (
        SELECT unnest(list_transform(range(3, len(tk) + 1),
               i -> struct_pack(w1 := tk[i - 2], w2 := tk[i - 1],
                                w3 := tk[i]))) AS g
        FROM tr
    ) GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM uni),
sc AS MATERIALIZED (
    SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM (
        SELECT doc_id, unnest(list_transform(range(3, len(tk) + 1),
               i -> struct_pack(w1 := tk[i - 2], w2 := tk[i - 1],
                                w3 := tk[i]))) AS g
        FROM alldocs
    )
),
scored AS (
    SELECT sc.doc_id,
           CASE WHEN coalesce(t.c, 0) > 0 AND coalesce(b12.c, 0) > 0
                    THEN t.c::DOUBLE / b12.c::DOUBLE
                WHEN coalesce(b23.c, 0) > 0 AND coalesce(u2.c, 0) > 0
                    THEN {a} * (b23.c::DOUBLE / u2.c::DOUBLE)
                WHEN coalesce(u3.c, 0) > 0
                    THEN {a} * {a} * (u3.c::DOUBLE / CAST(tot.N AS DOUBLE))
                ELSE {a} * {a}
                     * (CAST(1.0 AS DOUBLE) / CAST(tot.N AS DOUBLE))
           END AS s
    FROM sc
    LEFT JOIN tri t  ON t.w1 = sc.w1 AND t.w2 = sc.w2 AND t.w3 = sc.w3
    LEFT JOIN bi b12 ON b12.w1 = sc.w1 AND b12.w2 = sc.w2
    LEFT JOIN bi b23 ON b23.w1 = sc.w2 AND b23.w2 = sc.w3
    LEFT JOIN uni u2 ON u2.w1 = sc.w2
    LEFT JOIN uni u3 ON u3.w1 = sc.w3
    CROSS JOIN tot
    WHERE tot.N IS NOT NULL AND tot.N > 0
),
micro AS (
    SELECT doc_id,
           -CAST(floor(abs(log10(s)) * CAST(1000000.0 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
    FROM scored
),
agg AS (
    SELECT doc_id, count(*) AS n_scored,
           CAST(sum(m) AS BIGINT) AS logprob_micro
    FROM micro GROUP BY doc_id
)
SELECT doc_id, n_scored, logprob_micro,
       CAST({{q4}} AS FLOAT) AS ppl
FROM agg ORDER BY doc_id
""".replace("{q4}", _quantize_sql(ppl, 4))



# ---------------------------------------------------------------------------
# Round-8 widening (2): edit-distance record linkage (PassJoin-style
# pigeonhole blocking — operators/relational.py:edit_join).
# ---------------------------------------------------------------------------

def _linkage_names(cust: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty) record-linkage tables derived from customer.

    The driver testdata has no dirty-entity column (TPC-H names are
    'Customer#...' — a degenerate near-constant namespace where every
    pair is within edit distance of every other), so linkage inputs
    are synthesized the same way as the URL/CDC streams: clean names
    'cust-' + 10 hex chars of md5(custkey) (high-entropy, like real
    normalized entity keys), and a dirty copy with a deterministic
    typo family — exact copy / one substitution / one deletion / two
    substitutions, positions varying with the key. SQL twin inline in
    _EDIT_LINKAGE_SQL; md5 hex is identical across engines.
    """
    key = F.col("c_custkey")
    name = F.concat(
        F.lit("cust-"), F.substring(F.md5(key.cast("string")), 1, 10)
    )
    clean = cust.select(key.alias("custkey"), name.alias("name"))
    _k = F.col("_k")
    q = (F.lit(6) + _k % 10).cast("int")
    q2 = (F.lit(6) + (_k * 3) % 10).cast("int")
    n = F.col("_n")
    sub1 = F.concat(
        n.substr(F.lit(1), q - 1), F.lit("Z"), n.substr(q + 1, F.lit(99))
    )
    deletion = F.concat(n.substr(F.lit(1), q - 1), n.substr(q + 1, F.lit(99)))
    sub2 = F.concat(
        sub1.substr(F.lit(1), q2 - 1), F.lit("q"), sub1.substr(q2 + 1, F.lit(99))
    )
    dirty = (
        cust.select(key.alias("_k"), name.alias("_n"))
        .select(
            (F.col("_k") + 1_000_000).alias("variant_id"),
            F.when(F.col("_k") % 4 == 0, n)
            .when(F.col("_k") % 4 == 1, sub1)
            .when(F.col("_k") % 4 == 2, deletion)
            .otherwise(sub2)
            .alias("name"),
        )
    )
    return clean, dirty


def q_edit_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PassJoin pigeonhole blocking + exact levenshtein verify; the
    # oracle is an INDEPENDENT brute-force cross join, so the hash
    # match verifies edit_join's exact-recall guarantee (every pair at
    # distance <= k generated), not a replay of the same blocking.
    clean, dirty = _linkage_names(_t(spark, sf_dir, "customer"))
    return relational.edit_join(
        clean, dirty, "custkey", "variant_id", "name", "name", k=2
    ).withColumnRenamed("id_a", "custkey").withColumnRenamed(
        "id_b", "variant_id"
    )


_EDIT_LINKAGE_SQL = """
WITH clean AS (
    SELECT c_custkey AS custkey,
           'cust-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 10) AS n
    FROM customer
),
seed AS (
    SELECT c_custkey AS k,
           'cust-' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 10) AS n,
           CAST(6 + c_custkey % 10 AS INT) AS q,
           CAST(6 + (c_custkey * 3) % 10 AS INT) AS q2
    FROM customer
),
dirty AS (
    SELECT k + 1000000 AS variant_id,
           CASE k % 4
             WHEN 0 THEN n
             WHEN 1 THEN substr(n, 1, q - 1) || 'Z' || substr(n, q + 1, 99)
             WHEN 2 THEN substr(n, 1, q - 1) || substr(n, q + 1, 99)
             ELSE substr(substr(n, 1, q - 1) || 'Z' || substr(n, q + 1, 99),
                         1, q2 - 1)
                  || 'q'
                  || substr(substr(n, 1, q - 1) || 'Z' || substr(n, q + 1, 99),
                            q2 + 1, 99)
           END AS n
    FROM seed
)
SELECT a.custkey, b.variant_id,
       CAST(levenshtein(a.n, b.n) AS INT) AS dist
FROM clean a, dirty b
WHERE levenshtein(a.n, b.n) <= 2
ORDER BY custkey, variant_id
"""



# ---------------------------------------------------------------------------
# Round-8 widening (3): PageRank over the customer -> supplier trade
# graph (operators/graph.py:pagerank — fixed-iteration power method,
# LONG integer mass so both engines replay the iteration bit-exactly).
# ---------------------------------------------------------------------------

#: supplier-node id offset — customers and suppliers share the rank
#: table, so supplier keys move to a disjoint id range.
#:
#: SF CEILING (documented, round-9): TPC-H custkeys reach 150_000×SF,
#: so this literal is collision-free below SF ≈ 66; past that,
#: customer and supplier nodes would silently merge ON BOTH ENGINES
#: (the oracle embeds the same literal, so no hash would catch it).
#: It must stay a static literal because oracle_sql() strings cannot
#: depend on data; tests/test_graph.py pins max(o_custkey) at every
#: shipped SF against it. Deployments at larger SFs must raise it.
_PR_SUPP_OFFSET = 10_000_000
_PR_ITERS = 4
_PR_DAMPING = 85


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Directed bipartite trade graph: customer -> supplier whenever an
    # order of that customer has a lineitem from that supplier. Every
    # supplier node is dangling (no out-edges), so the query exercises
    # the dangling-mass redistribution path, not just the join+agg.
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _PR_SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    pr = graph.pagerank(
        edges, iterations=_PR_ITERS, damping_pct=_PR_DAMPING
    )
    return pr.orderBy(F.desc("rank_e12"), "node")


def _pagerank_sql(
    iterations: int = _PR_ITERS,
    damping: int = _PR_DAMPING,
    mass: int = graph.MASS,
) -> str:
    """Iterated-CTE twin of q_pagerank: each power-iteration round is
    unrolled into (dangling, inflow, rank) CTEs, all arithmetic LONG
    (DuckDB ``//`` == Spark ``div`` on the non-negative operands used
    here), so the hash match replays the full iteration bit-for-bit."""
    tele = 100 - damping
    parts = [
        f"""WITH edges AS (
    SELECT DISTINCT o.o_custkey AS src,
           l.l_suppkey + {_PR_SUPP_OFFSET} AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS c FROM nodes),
deg AS (
    SELECT n.node, count(e.src) AS od
    FROM nodes n LEFT JOIN edges e ON n.node = e.src
    GROUP BY 1
),
r0 AS (
    SELECT node, (SELECT {mass} // c FROM nn) AS r FROM nodes
)"""
    ]
    for i in range(iterations):
        parts.append(f""",
d{i} AS (
    SELECT coalesce(sum(r.r), 0) AS dm
    FROM r{i} r JOIN deg ON r.node = deg.node WHERE deg.od = 0
),
inf{i} AS (
    SELECT e.dst AS node, sum(r.r // deg.od) AS s
    FROM edges e JOIN r{i} r ON e.src = r.node
    JOIN deg ON e.src = deg.node
    GROUP BY 1
),
r{i + 1} AS (
    SELECT n.node,
           (SELECT ({tele} * ({mass} // c)) // 100 FROM nn)
           + ({damping} * (coalesce(i.s, 0)
              + ((SELECT dm FROM d{i}) // (SELECT c FROM nn)))) // 100 AS r
    FROM nodes n LEFT JOIN inf{i} i ON n.node = i.node
)""")
    parts.append(f"""
SELECT node, CAST(r AS BIGINT) AS rank_e12
FROM r{iterations}
ORDER BY rank_e12 DESC, node
""")
    return "".join(parts)



# ---------------------------------------------------------------------------
# Round-8 widening (4): scalar quantization (SQ8) — the fifth ANN path
# (operators/similarity.py:sq_train/sq_encode/knn_sq). The model is
# per-dimension min/max bounds, derivable EXACTLY on any engine (no
# quantized-kmeans protocol needed), so the oracle re-derives the
# whole model in one aggregation CTE.
# ---------------------------------------------------------------------------

_SQ_DIM = 64

#: trained SQ bounds per corpus signature — min/max aggregation is
#: deterministic by definition; memoized like the PQ codebooks.
_SQ_BOUNDS_CACHE: dict[tuple, list[tuple[float, float]]] = {}


def _sq_bounds(spark: SparkSession, sf_dir: str):
    emb = _t(spark, sf_dir, "embeddings")
    key = _corpus_sig(sf_dir)
    bounds = _SQ_BOUNDS_CACHE.get(key)
    if bounds is None:
        bounds = similarity.sq_train(emb, dim=_SQ_DIM)
        _SQ_BOUNDS_CACHE[key] = bounds
    return emb, bounds


def q_sq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQ8 encode stage in the open: (vec_id, d, code) long form —
    # per-dimension 256-level quantization against corpus min/max.
    emb, bounds = _sq_bounds(spark, sf_dir)
    if not bounds:
        return emb.select(
            "vec_id", F.lit(0).alias("d"), F.lit(0).alias("code")
        ).filter(F.lit(False))
    return (
        similarity.sq_encode(emb, bounds)
        .select("vec_id", F.posexplode("sq_codes").alias("d", "code"))
        .orderBy("vec_id", "d")
    )


def q_knn_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fifth ANN path: SQ8 asymmetric-distance screen (1-byte codes,
    # query stays exact) + exact re-rank of 50 survivors per query.
    emb, bounds = _sq_bounds(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_sq(
        emb, queries, dim=_SQ_DIM, k=3, n_candidates=50, bounds=bounds
    )


def _sq_with_clause() -> str:
    """Shared WITH body: valid vectors, per-dim bounds (min/max — the
    whole SQ model, re-derived exactly), the (mins, invs, steps)
    constant arrays, and the encode table. Scale factors use the same
    IEEE divides Spark's driver ran; floor(x + 0.5) is the shared
    half-away rounding; constant dims (mx = mn) get inv = step = 0."""
    return f"""e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {_VALID_VEC}
),
bounds AS (
    SELECT j AS d, min(v[j]) AS mn, max(v[j]) AS mx
    FROM e, range(1, {_SQ_DIM + 1}) t(j)
    GROUP BY j
),
consts AS (
    SELECT array_agg(mn ORDER BY d) AS mins,
           array_agg(CASE WHEN mx = mn THEN 0.0
                          ELSE 255.0 / (mx - mn) END ORDER BY d) AS invs,
           array_agg(CASE WHEN mx = mn THEN 0.0
                          ELSE (mx - mn) / 255.0 END ORDER BY d) AS steps
    FROM bounds
),
enc AS (
    SELECT e.vec_id,
           list_transform(range(1, {_SQ_DIM + 1}),
               j -> CAST(least(greatest(
                        floor((e.v[j] - c.mins[j]) * c.invs[j] + 0.5),
                        0), 255) AS INT)) AS codes
    FROM e, consts c
)"""


def _sq_codes_sql() -> str:
    return f"""
WITH {_sq_with_clause()}
SELECT vec_id, CAST(j - 1 AS INT) AS d, codes[j] AS code
FROM enc, range(1, {_SQ_DIM + 1}) t(j)
ORDER BY vec_id, d
"""


def _knn_sq_sql(k: int = 3, n_candidates: int = 50) -> str:
    cos = (
        "round(CASE WHEN (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))) > 0"
        " THEN list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
        " ELSE 0.0 END, 6)"
    )
    return f"""
WITH {_sq_with_clause()},
scored AS (
    -- asymmetric distance: exact query vs candidate RECONSTRUCTION
    -- mins[j] + codes[j] * steps[j]; same left-to-right list_sum fold
    -- as Spark's aggregate(zip_with(...)) with identical per-element
    -- op order (code*step, min+scaled, q-recon, square)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_sum(list_transform(range(1, {_SQ_DIM + 1}),
                 j -> (q.v[j] - (k.mins[j] + k.steps[j] * c.codes[j]))
                    * (q.v[j] - (k.mins[j] + k.steps[j] * c.codes[j]))
                 )), 6) AS approx_d
    FROM e q, enc c, consts k
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
),
cand AS (
    SELECT query_id, neighbor_id FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_d, neighbor_id)
            <= {n_candidates}
),
exact AS (
    SELECT cand.query_id, cand.neighbor_id,
           {cos.format(a="eq.v", b="ec.v")} AS cosine_sim
    FROM cand
    JOIN e eq ON eq.vec_id = cand.query_id
    JOIN e ec ON ec.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id)
            AS INTEGER) AS rank
FROM exact
QUALIFY rank <= {k}
"""



# ---------------------------------------------------------------------------
# Round-8 widening (5): multinomial Naive Bayes language classifier
# (operators/llm.py:nb_train/nb_classify — the aggregation-only
# training paradigm beside classifier_train's gradient descent).
# ---------------------------------------------------------------------------

def q_nb_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    # supervised language ID: train on the held-out-excluding slice
    # (doc_id % 5 <> 0, the LM convention), predict every doc, report
    # prediction vs the actual label. Scores are integer-micros log10
    # sums, so the argmax replays exactly in SQL.
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    token_model, class_model = llm.nb_train(train, label_col="lang")
    pred = llm.nb_classify(docs, token_model, class_model)
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("actual")),
                  "doc_id")
        .select(
            "doc_id",
            "actual",
            "pred_cls",
            (F.col("pred_cls") == F.col("actual")).alias("correct"),
            "logprob_micro",
            "n_tokens",
        )
        .orderBy("doc_id")
    )


_NB_LANGUAGE_SQL = """
WITH tr AS MATERIALIZED (
    SELECT doc_id, lang AS cls,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
    FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL AND doc_id % 5 <> 0
),
alld AS MATERIALIZED (
    SELECT doc_id, lang,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
    FROM documents WHERE text IS NOT NULL
),
cnt AS MATERIALIZED (
    SELECT cls, w, count(*) AS c
    FROM (SELECT cls, unnest(tk) AS w FROM tr) GROUP BY 1, 2
),
totc AS (SELECT cls, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT count(DISTINCT w) AS v FROM cnt),
ndocs AS (SELECT count(*) AS nd FROM tr),
ndcls AS (SELECT cls, count(*) AS ndc FROM tr GROUP BY 1),
model AS MATERIALIZED (
    SELECT c.cls, c.w,
           -CAST(floor(abs(log10(
                CAST(c.c + 1 AS DOUBLE) / CAST(t.t + vb.v AS DOUBLE)))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS lp_micro
    FROM cnt c JOIN totc t USING (cls) CROSS JOIN vocab vb
),
classes AS (
    SELECT t.cls,
           -CAST(floor(abs(log10(
                CAST(p.ndc AS DOUBLE) / CAST(n.nd AS DOUBLE)))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS prior_micro,
           -CAST(floor(abs(log10(
                CAST(1.0 AS DOUBLE) / CAST(t.t + vb.v AS DOUBLE)))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
             AS BIGINT) AS oov_micro
    FROM totc t JOIN ndcls p USING (cls)
    CROSS JOIN vocab vb CROSS JOIN ndocs n
),
dtok AS (SELECT doc_id, unnest(tk) AS w FROM alld),
per_class AS (
    SELECT d.doc_id, cl.cls, cl.prior_micro,
           CAST(sum(coalesce(m.lp_micro, cl.oov_micro)) AS BIGINT) AS s,
           count(*) AS n_tok
    FROM dtok d
    CROSS JOIN classes cl
    LEFT JOIN model m ON m.cls = cl.cls AND m.w = d.w
    GROUP BY 1, 2, 3
),
winner AS (
    SELECT doc_id, cls AS pred_cls,
           prior_micro + s AS logprob_micro,
           CAST(n_tok AS INT) AS n_tokens
    FROM per_class
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY prior_micro + s DESC, cls) = 1
)
SELECT w.doc_id, a.lang AS actual, w.pred_cls,
       w.pred_cls = a.lang AS correct,
       w.logprob_micro, w.n_tokens
FROM winner w JOIN alld a USING (doc_id)
ORDER BY w.doc_id
"""



# ---------------------------------------------------------------------------
# Round-8 widening (6): multi-round BFS hop levels over the symmetrized
# trade graph (operators/graph.py:bfs_levels — frontier expansion, the
# second message-passing workload; exact integer levels, no
# quantization contract needed).
# ---------------------------------------------------------------------------

_BFS_DEPTH = 6


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hop distance from customer 1 through the SYMMETRIZED trade graph
    # (customer <-> supplier edges in both directions): level 1 = its
    # suppliers, level 2 = customers sharing a supplier, and so on —
    # the "collaborative distance" walk.
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    fwd = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _PR_SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = orders.select(F.col("o_custkey").alias("node")).filter(
        F.col("node") == 1
    ).distinct()
    return graph.bfs_levels(
        edges, sources, max_depth=_BFS_DEPTH
    ).orderBy("level", "node")


_BFS_HOPS_SQL = f"""
WITH RECURSIVE fwd AS (
    SELECT DISTINCT o.o_custkey AS src,
           l.l_suppkey + {_PR_SUPP_OFFSET} AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
    SELECT src, dst FROM fwd
    UNION ALL
    SELECT dst AS src, src AS dst FROM fwd
),
srcs AS (
    SELECT DISTINCT o_custkey AS node FROM orders WHERE o_custkey = 1
),
walk(node, lvl) AS (
    SELECT node, 0 FROM srcs
    UNION
    SELECT e.dst, w.lvl + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.lvl < {_BFS_DEPTH}
)
SELECT node, CAST(min(lvl) AS BIGINT) AS level
FROM walk GROUP BY node
ORDER BY level, node
"""



# ---------------------------------------------------------------------------
# Round-8 widening (7): the stream-stream interval join, externally
# verified — streaming/events.py:click_purchase_join_stream has been
# tests-only since round 5; this runs it as a REAL availableNow
# micro-batch (file source → dual-watermark join → append parquet
# sink) whose sink equals the batch interval join, so the oracle is
# plain SQL (the q_stream_daily_rollup trick).
# ---------------------------------------------------------------------------

def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from big_data_in_agriculture_spark.streaming.events import (
        start_click_attribution_to_parquet,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tmp = tempfile.mkdtemp(prefix="streamj-")
    landing = f"{tmp}/landing"
    os.makedirs(landing)
    shutil.copy(f"{sf_dir}/events.parquet", f"{landing}/batch-000.parquet")
    q = start_click_attribution_to_parquet(
        spark, landing, f"{tmp}/sink", f"{tmp}/chk",
        attribution_window="1 hour", available_now=True,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream-stream join did not finish within 300s")
    return (
        spark.read.parquet(f"{tmp}/sink")
        .select("click_id", "user_id", "click_ts", "purchase_ts",
                F.col("purchase_value").cast("double").alias("purchase_value"))
        .orderBy("click_id", "purchase_ts")
    )


_STREAM_CLICK_ATTRIBUTION_SQL = """
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       CAST(p.value AS DOUBLE) AS purchase_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND p.ts <= c.ts
 AND p.ts >= c.ts - INTERVAL 1 HOUR
WHERE c.event_type = 'click'
ORDER BY click_id, purchase_ts
"""



# ---------------------------------------------------------------------------
# Round-8 widening (8): distributed dense-id assignment
# (operators/relational.py:assign_dense_ids — the `_range_ntile`
# decomposition with the global rank itself as the product; no
# single-partition window at any volume).
# ---------------------------------------------------------------------------

def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stable contiguous ids over orders in (o_orderdate, o_orderkey)
    # order — the ingest-time id-assignment primitive. The oracle is a
    # plain global row_number, so the hash match proves the
    # range-exchange decomposition equals the single-window semantics.
    orders = _t(spark, sf_dir, "orders")
    return (
        relational.assign_dense_ids(
            orders.select("o_orderkey", "o_orderdate"),
            [F.col("o_orderdate"), F.col("o_orderkey")],
        )
        .select("o_orderkey", "dense_id")
        .orderBy("dense_id")
    )


_DENSE_IDS_SQL = """
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS dense_id
FROM orders
ORDER BY dense_id
"""



# ---------------------------------------------------------------------------
# Round-8 widening (9): mergeable histogram quantile sketch — the
# fourth mergeable sketch beside HLL / Bloom / CMS
# (operators/profile.py:histogram_sketch/merge_histograms/
# sketch_quantiles). The registered query builds TWO shard sketches
# and merges them, so the hash match verifies the mergeability
# contract itself, not just one build.
# ---------------------------------------------------------------------------

_QSK_LO, _QSK_HI, _QSK_BINS = 0.0, 600_000.0, 128
_QSK_QS = [0.25, 0.5, 0.75, 0.9]


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import profile as prof

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    halves = [
        prof.histogram_sketch(
            orders.filter(F.col("o_orderkey") % 2 == i), "v",
            _QSK_LO, _QSK_HI, _QSK_BINS,
        )
        for i in (0, 1)
    ]
    merged = prof.merge_histograms(*halves)
    return prof.sketch_quantiles(
        merged, _QSK_LO, _QSK_HI, _QSK_BINS, _QSK_QS
    )


def _quantile_sketch_sql(
    lo: float = _QSK_LO, hi: float = _QSK_HI, bins: int = _QSK_BINS,
    qs: list[float] = _QSK_QS,
) -> str:
    """Twin of the two-shard build + merge + interpolation. q literals
    are CAST to DOUBLE (DuckDB binds 0.9 as DECIMAL, whose exact
    multiply would round ceil targets differently than IEEE); the bin
    width is the Python-computed double constant, identical to the
    one Spark's driver embedded."""
    w = (hi - lo) / float(bins)
    q_list = ", ".join(repr(float(q)) for q in qs)
    half = (
        "SELECT CAST(least(greatest(floor((v - {lo}) / {w}), 0), {top}) "
        "AS BIGINT) AS bin_id, count(*) AS n FROM vals "
        "WHERE o_orderkey % 2 = {par} GROUP BY 1"
    )
    return f"""
WITH vals AS (
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v FROM orders
    WHERE o_totalprice IS NOT NULL
      AND NOT isnan(CAST(o_totalprice AS DOUBLE))
),
h0 AS ({half.format(lo=repr(lo), w=repr(w), top=bins - 1, par=0)}),
h1 AS ({half.format(lo=repr(lo), w=repr(w), top=bins - 1, par=1)}),
m AS (
    SELECT bin_id, CAST(sum(n) AS BIGINT) AS n
    FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) GROUP BY 1
),
cum AS (
    SELECT bin_id, n,
           CAST(sum(n) OVER (ORDER BY bin_id) AS BIGINT) AS cum,
           CAST(sum(n) OVER () AS BIGINT) AS total
    FROM m
),
qs AS (SELECT CAST(unnest([{q_list}]) AS DOUBLE) AS q),
hit AS (
    SELECT q, bin_id, n, cum, total,
           row_number() OVER (PARTITION BY q ORDER BY bin_id) AS rn
    FROM qs, cum
    WHERE cum >= greatest(CAST(ceil(q * total) AS BIGINT), 1)
)
SELECT q,
       round({repr(lo)} + (CAST(bin_id AS DOUBLE)
             + CAST(CAST(ceil(q * total) AS BIGINT) - (cum - n) AS DOUBLE)
               / CAST(n AS DOUBLE)) * {repr(w)}, 6) AS estimate,
       CAST({repr(w)} AS DOUBLE) AS err_bound
FROM hit WHERE rn = 1
ORDER BY q
"""



# ---------------------------------------------------------------------------
# Round-8 widening (10): Holt double-exponential-smoothing forecast
# (operators/timeseries.py:holt_forecast — the sequential recurrence
# as a JVM-side aggregate fold; recursive-CTE oracle carries (l, b)).
# ---------------------------------------------------------------------------

_HOLT_A, _HOLT_B, _HOLT_H = 0.5, 0.3, 7


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # quantize the per-day sum BEFORE the fold: F.sum over DOUBLE is
    # partition-fold-order-dependent, and the Holt recurrence amplifies
    # a last-ulp difference through every step — the final round(,6) on
    # yhat only absorbs what survives, which is a hash-gate hazard on
    # near-ties (round-8 ADVICE). round(,6) here is the same cross-
    # engine contract the output already relies on.
    daily = timeseries.daily_series(ev, "event_type", "ts", "value")
    daily = daily.withColumn("value", F.round("value", 6))
    out = timeseries.holt_forecast(
        daily, alpha=_HOLT_A, beta=_HOLT_B, horizon=_HOLT_H
    )
    return out.orderBy("key", "h")


def _holt_sql(
    alpha: float = _HOLT_A, beta: float = _HOLT_B, horizon: int = _HOLT_H
) -> str:
    """Recursive-CTE twin: state (l, b) advances one observation per
    recursion step, consuming ys[t] for t = 2..n (t starts at 2 with
    l = ys[1], b = ys[2] − ys[1]); final state is the unique t = n+1
    row (= 2 for single-observation keys). Every smoothing constant is
    CAST to DOUBLE (DuckDB binds bare decimals as DECIMAL, whose exact
    arithmetic diverges from Spark's IEEE fold)."""
    a, om_a = repr(float(alpha)), repr(1.0 - float(alpha))
    b, om_b = repr(float(beta)), repr(1.0 - float(beta))
    lnew = (
        f"CAST({a} AS DOUBLE) * ys[t] "
        f"+ CAST({om_a} AS DOUBLE) * (l + b)"
    )
    return f"""
WITH RECURSIVE daily AS (
    -- round(,6) mirrors the Spark side's pre-fold quantization
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS v
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
ser AS (
    SELECT key, list(v ORDER BY day) AS ys, max(day) AS last_day
    FROM daily GROUP BY key
),
fit(key, t, l, b) AS (
    SELECT key, 2, ys[1],
           CASE WHEN len(ys) >= 2 THEN ys[2] - ys[1] ELSE 0.0 END
    FROM ser
    UNION ALL
    SELECT f.key, f.t + 1,
           {lnew},
           CAST({b} AS DOUBLE) * (({lnew}) - l)
           + CAST({om_b} AS DOUBLE) * b
    FROM fit f JOIN ser USING (key)
    WHERE f.t <= len(ys)
),
final AS (
    SELECT f.key, f.l, f.b, s.last_day
    FROM fit f JOIN ser s USING (key)
    WHERE f.t = len(s.ys) + 1
)
SELECT key, CAST(h AS INT) AS h,
       last_day + h * INTERVAL 1 DAY AS forecast_day,
       round(l + CAST(h AS DOUBLE) * b, 6) AS yhat
FROM final, range(1, {horizon + 1}) r(h)
ORDER BY key, h
"""



# ---------------------------------------------------------------------------
# Round-8 widening (11): DBSCAN — density-based clustering
# (operators/similarity.py:dbscan_2d; grid-blocked exact neighbor
# generation, verified against a BRUTE-FORCE quadratic oracle).
# ---------------------------------------------------------------------------

_DBSCAN_EPS, _DBSCAN_MINPTS = 0.02, 4


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # density clustering over the embedding table's first two
    # components (real data columns; the planted-blob semantics live
    # in the unit tests). The oracle generates neighbor pairs with a
    # brute-force quadratic join, so the hash match PROVES the 3x3
    # grid blocking loses no pair (the edit_linkage pattern).
    emb = _t(spark, sf_dir, "embeddings").filter(
        similarity.vec_is_valid(F.col("embedding"))
    )
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.element_at(F.col("embedding"), 1).cast("double").alias("x"),
        F.element_at(F.col("embedding"), 2).cast("double").alias("y"),
    )
    return similarity.dbscan_2d(
        pts, eps=_DBSCAN_EPS, min_pts=_DBSCAN_MINPTS
    ).orderBy("id")


def _dbscan_sql(
    eps: float = _DBSCAN_EPS, min_pts: int = _DBSCAN_MINPTS
) -> str:
    eps2 = repr(float(eps) * float(eps))
    return f"""
WITH RECURSIVE pts AS (
    SELECT vec_id AS id, embedding[1]::DOUBLE AS x,
           embedding[2]::DOUBLE AS y
    FROM embeddings WHERE {_VALID_VEC}
),
pairs AS MATERIALIZED (
    -- brute force: INDEPENDENT of the engine's grid blocking
    SELECT a.id AS ia, b.id AS ib FROM pts a, pts b
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= CAST({eps2} AS DOUBLE)
),
cnt AS (SELECT ia AS id, count(*) AS n FROM pairs GROUP BY 1),
core AS MATERIALIZED (SELECT id FROM cnt WHERE n >= {min_pts}),
cedges AS MATERIALIZED (
    SELECT ia, ib FROM pairs
    JOIN core c1 ON pairs.ia = c1.id
    JOIN core c2 ON pairs.ib = c2.id
),
reach(id, lab) AS (
    SELECT ia, ia FROM cedges
    UNION
    SELECT e.ib, r.lab FROM reach r JOIN cedges e ON e.ia = r.id
),
comp AS MATERIALIZED (SELECT id, min(lab) AS cid FROM reach GROUP BY id),
core_out AS (
    SELECT c.id, 'core' AS role, m.cid AS cluster_id
    FROM core c JOIN comp m USING (id)
),
border_out AS (
    SELECT p.ia AS id, 'border' AS role, min(m.cid) AS cluster_id
    FROM pairs p
    JOIN core k ON p.ib = k.id
    JOIN comp m ON m.id = p.ib
    WHERE p.ia NOT IN (SELECT id FROM core)
    GROUP BY 1
),
assigned AS (
    SELECT * FROM core_out UNION ALL SELECT * FROM border_out
)
SELECT id, role, CAST(cluster_id AS BIGINT) AS cluster_id FROM assigned
UNION ALL
SELECT p.id, 'noise', NULL
FROM pts p WHERE p.id NOT IN (SELECT id FROM assigned)
ORDER BY id
"""



# ---------------------------------------------------------------------------
# Round-9 widening: graph-analytics depth (personalized PageRank,
# k-core, weighted SSSP, clustering coefficient — operators/graph.py)
# and additive Holt-Winters seasonal forecasting
# (operators/timeseries.py:holt_winters_forecast).
# ---------------------------------------------------------------------------

_PPR_ITERS = 4
_PPR_SRC_MOD = 100  # PPR sources: customers with custkey ≡ 1 (mod 100)


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # personalized PageRank on the trade graph: teleport + dangling
    # mass return to a deterministic customer seed set — proximity-to-
    # sources ranking (seed-expanded corpus selection). Same LONG
    # integer-mass contract as q_pagerank.
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _PR_SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    sources = (
        orders.filter(F.col("o_custkey") % _PPR_SRC_MOD == 1)
        .select(F.col("o_custkey").alias("node"))
        .distinct()
    )
    out = graph.personalized_pagerank(
        edges, sources, iterations=_PPR_ITERS, damping_pct=_PR_DAMPING
    )
    return out.orderBy("node")


def _ppr_sql(
    iterations: int = _PPR_ITERS,
    damping: int = _PR_DAMPING,
    mass: int = graph.MASS,
) -> str:
    """Iterated-CTE twin of q_ppr — the _pagerank_sql pattern with an
    is_src flag: teleport and dangling terms apply to sources only."""
    tele = 100 - damping
    parts = [
        f"""WITH edges AS MATERIALIZED (
    SELECT DISTINCT o.o_custkey AS src,
           l.l_suppkey + {_PR_SUPP_OFFSET} AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
srcs AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS node FROM orders
    WHERE o_custkey % {_PPR_SRC_MOD} = 1
),
nodes AS (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
    UNION SELECT node FROM srcs
),
sn AS (SELECT count(*) AS c FROM srcs),
deg AS MATERIALIZED (
    SELECT n.node, count(e.src) AS od,
           CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_src
    FROM nodes n
    LEFT JOIN edges e ON n.node = e.src
    LEFT JOIN srcs s ON n.node = s.node
    GROUP BY 1, 3
),
r0 AS (
    SELECT node,
           CASE WHEN is_src = 1 THEN (SELECT {mass} // c FROM sn)
                ELSE 0 END AS r
    FROM deg
)"""
    ]
    for i in range(iterations):
        parts.append(f""",
d{i} AS MATERIALIZED (
    SELECT coalesce(sum(r.r), 0) AS dm
    FROM r{i} r JOIN deg ON r.node = deg.node WHERE deg.od = 0
),
inf{i} AS MATERIALIZED (
    SELECT e.dst AS node, sum(r.r // deg.od) AS s
    FROM edges e JOIN r{i} r ON e.src = r.node
    JOIN deg ON e.src = deg.node
    GROUP BY 1
),
r{i + 1} AS MATERIALIZED (
    SELECT dg.node,
           CASE WHEN dg.is_src = 1
                THEN (SELECT ({tele} * ({mass} // c)) // 100 FROM sn)
                ELSE 0 END
           + ({damping} * (coalesce(i.s, 0)
              + CASE WHEN dg.is_src = 1
                     THEN (SELECT dm FROM d{i}) // (SELECT c FROM sn)
                     ELSE 0 END)) // 100 AS r
    FROM deg dg LEFT JOIN inf{i} i ON dg.node = i.node
)""")
    parts.append(f"""
SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r{iterations}
ORDER BY node
""")
    return "".join(parts)


#: co-purchase graph: part pairs sharing >= 2 orders (the q_triangles
#: graph), with the shared-order count kept as an edge weight.
_COPURCHASE_EDGES_SQL = """
parts AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
    SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS w
    FROM parts a JOIN parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11: the per-order pair expansion is an in-bucket array
    # combinator over the order's sorted distinct part set, not a
    # self-JOIN on l_orderkey — one exchange fewer (the join's) and no
    # join at all; the i<j slice walk emits exactly the src<dst pairs
    # the old join+filter produced (collect_set dedups, array_sort
    # orders, so (ps[i], ps[j]) with i<j IS src<dst over distinct
    # parts). Bucket width is the order's part count — bounded tiny by
    # construction, the same argument jaccard_pairs makes for shingle
    # buckets. Measured at sf0.1: 2.14 s -> 1.67 s per evaluation,
    # identical rows — and EVERY graph query pays this builder once.
    li = _t(spark, sf_dir, "lineitem")
    sets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    n = F.size("ps")
    pair_arrays = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice("ps", i + 2, n),  # elements strictly after i
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        sets.select(F.explode(pair_arrays).alias("p"))
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )


# ROUNDS is proven sufficient by tests/test_graph.py::
# test_kcore_rounds_reach_fixpoint_on_testdata (sf0.001 needs <=6,
# sf0.01 needs 10, sf0.1's 3-core is empty); 12 carries headroom.
_KCORE_K, _KCORE_ROUNDS = 3, 12


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-core of the co-purchase graph, FIXED 12 peeling rounds (the
    # SQL-replayable mode; tests assert the fixed rounds reach the
    # TRUE fixpoint on every shipped testdata graph — round 9 caught
    # 6 rounds leaving 19 unpeeled rows at sf0.01, a deterministic
    # but partial result both engines replayed identically)
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.kcore(
        edges, k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).orderBy("node")


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [
        f"""WITH {_COPURCHASE_EDGES_SQL},
alive0 AS MATERIALIZED (
    SELECT a AS u, b AS v FROM edges
    UNION ALL SELECT b, a FROM edges
)"""
    ]
    for i in range(rounds):
        parts.append(f""",
deg{i} AS (SELECT u, count(*) AS d FROM alive{i} GROUP BY 1),
keep{i} AS MATERIALIZED (SELECT u FROM deg{i} WHERE d >= {k}),
alive{i + 1} AS MATERIALIZED (
    SELECT e.u, e.v FROM alive{i} e
    JOIN keep{i} k1 ON e.u = k1.u
    JOIN keep{i} k2 ON e.v = k2.u
)""")
    parts.append(f"""
SELECT u AS node, count(*) AS core_degree
FROM alive{rounds} GROUP BY 1 ORDER BY node
""")
    return "".join(parts)


# ROUNDS proven sufficient by tests/test_graph.py::
# test_core_numbers_rounds_reach_fixpoint_on_testdata at every
# shipped sf. Measured convergence: sf0.001 needs 17-20 rounds,
# sf0.01 needs <=12, sf0.1 needs <=8 — the h-index tail length tracks
# local structure (long induced paths), not graph size, so the
# SMALLEST graph needs the most rounds here; 24 carries headroom.
_CORE_ROUNDS = 24


def q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full coreness decomposition of the co-purchase graph, FIXED
    # h-index rounds (the SQL-replayable mode, the kcore_trade
    # contract: tests assert the fixed rounds reach the TRUE fixpoint
    # on every shipped testdata graph)
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.core_numbers(edges, rounds=_CORE_ROUNDS).orderBy("node")


def _core_numbers_sql(rounds: int = _CORE_ROUNDS) -> str:
    parts = [
        f"""WITH {_COPURCHASE_EDGES_SQL},
und AS MATERIALIZED (
    SELECT a AS u, b AS v FROM edges
    UNION ALL SELECT b, a FROM edges
),
c0 AS MATERIALIZED (
    SELECT u AS node, CAST(count(*) AS BIGINT) AS c FROM und GROUP BY 1
)"""
    ]
    for i in range(rounds):
        # h-index of neighbor values: max(least(rank-desc, value)) —
        # invariant to tie order among equal values, all integers
        parts.append(f""",
c{i + 1} AS MATERIALIZED (
    SELECT u AS node, max(least(rn, cv)) AS c FROM (
        SELECT e.u, c.c AS cv,
               CAST(row_number() OVER (
                   PARTITION BY e.u ORDER BY c.c DESC) AS BIGINT) AS rn
        FROM und e JOIN c{i} c ON e.v = c.node
    ) GROUP BY u
)""")
    parts.append(f"""
SELECT node, c AS core FROM c{rounds} ORDER BY node
""")
    return "".join(parts)


#: fixed LPA rounds (the SQL-replayable mode). Measured fixpoint of
#: the self-vote form: sf0.001 settles in 4 rounds, sf0.01 in 6;
#: tests/test_graph.py::test_lpa_rounds_settled_on_testdata proves the
#: pinned count HAS settled (fixed == fixpoint) on every shipped sf.
_LPA_ROUNDS = 8


def q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # community detection on the co-purchase graph: deterministic
    # synchronous label propagation, smallest-label tie-break
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.label_propagation(
        edges, rounds=_LPA_ROUNDS
    ).orderBy("node")


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    parts = [
        f"""WITH {_COPURCHASE_EDGES_SQL},
und AS MATERIALIZED (
    SELECT a AS u, b AS v FROM edges
    UNION ALL SELECT b, a FROM edges
),
l0 AS MATERIALIZED (
    SELECT DISTINCT u AS node, u AS community FROM und
)"""
    ]
    for i in range(rounds):
        # adopt the label held by the most voters in the CLOSED
        # neighborhood (neighbors + own label — the self-vote form);
        # ties -> smallest label (integer counts + total-order
        # tie-break = replayable)
        parts.append(f""",
l{i + 1} AS MATERIALIZED (
    SELECT node, community FROM (
        SELECT node, community,
               row_number() OVER (
                   PARTITION BY node
                   ORDER BY count(*) DESC, community ASC) AS rn
        FROM (
            SELECT e.u AS node, l.community
            FROM und e JOIN l{i} l ON e.v = l.node
            UNION ALL SELECT node, community FROM l{i}
        )
        GROUP BY node, community
    ) WHERE rn = 1
)""")
    parts.append(f"""
SELECT node, community FROM l{rounds} ORDER BY node
""")
    return "".join(parts)


_SSSP_HOPS, _SSSP_SRC_MOD = 4, 97


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weighted shortest paths on the co-purchase graph: edge cost =
    # 1_000_000 div shared-order-count (popular links are "shorter"),
    # sources = parts with partkey ≡ 1 (mod 97), 4-hop bound. LONG
    # arithmetic throughout, so the unrolled Bellman-Ford oracle
    # replays it exactly.
    cop = _copurchase_edges(spark, sf_dir)
    und = cop.select("src", "dst", "w").unionByName(
        cop.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    weighted = und.select(
        "src", "dst", F.expr("1000000 div w").cast("long").alias("w")
    )
    li = _t(spark, sf_dir, "lineitem")
    sources = (
        li.filter(F.col("l_partkey") % _SSSP_SRC_MOD == 1)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    return graph.sssp(
        weighted, sources, max_hops=_SSSP_HOPS
    ).orderBy("node")


def _sssp_sql(hops: int = _SSSP_HOPS) -> str:
    parts = [
        f"""WITH {_COPURCHASE_EDGES_SQL},
und AS MATERIALIZED (
    SELECT a AS u, b AS v, 1000000 // w AS w FROM edges
    UNION ALL SELECT b, a, 1000000 // w FROM edges
),
d0 AS MATERIALIZED (
    SELECT DISTINCT l_partkey AS node, CAST(0 AS BIGINT) AS dist
    FROM lineitem WHERE l_partkey % {_SSSP_SRC_MOD} = 1
)"""
    ]
    for i in range(hops):
        parts.append(f""",
r{i + 1} AS (
    SELECT e.v AS node, min(d.dist + e.w) AS dist
    FROM d{i} d JOIN und e ON e.u = d.node
    GROUP BY 1
),
d{i + 1} AS MATERIALIZED (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL SELECT node, dist FROM r{i + 1}
    ) GROUP BY node
)""")
    parts.append(f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{hops} ORDER BY node
""")
    return "".join(parts)


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # local clustering coefficient per node of the co-purchase graph
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.clustering_coefficient(edges).orderBy("node")


_CLUSTERING_COEFF_SQL = f"""
WITH {_COPURCHASE_EDGES_SQL},
und AS (SELECT a AS u, b AS v FROM edges UNION ALL SELECT b, a FROM edges),
deg AS (SELECT u AS node, count(*) AS degree FROM und GROUP BY 1),
tris AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
),
tcount AS (SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1)
SELECT d.node, d.degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN round(CAST(2 AS DOUBLE) * coalesce(t.n_triangles, 0)
                       / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
            ELSE CAST(0 AS DOUBLE) END AS coeff
FROM deg d LEFT JOIN tcount t USING (node)
ORDER BY d.node
"""


_HW_PERIOD, _HW_A, _HW_B, _HW_G, _HW_H = 7, 0.5, 0.3, 0.3, 7


def q_hw_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # same pre-fold quantization contract as q_holt_forecast
    daily = timeseries.daily_series(ev, "event_type", "ts", "value")
    daily = daily.withColumn("value", F.round("value", 6))
    out = timeseries.holt_winters_forecast(
        daily,
        period=_HW_PERIOD,
        alpha=_HW_A,
        beta=_HW_B,
        gamma=_HW_G,
        horizon=_HW_H,
    )
    return out.orderBy("key", "h")


def _hw_sql(
    m: int = _HW_PERIOD,
    alpha: float = _HW_A,
    beta: float = _HW_B,
    gamma: float = _HW_G,
    horizon: int = _HW_H,
) -> str:
    """Recursive-CTE twin of q_hw_forecast: state (l, b, s[m]) advances
    one observation per step from t = m+1; init means use list_reduce
    (fold from the first element — the Spark side folds identically);
    the season list updates via DuckDB's 1-based indexed lambda. Every
    constant CAST to DOUBLE (bare decimals bind DECIMAL)."""
    a, om_a = repr(float(alpha)), repr(1.0 - float(alpha))
    be, om_b = repr(float(beta)), repr(1.0 - float(beta))
    g, om_g = repr(float(gamma)), repr(1.0 - float(gamma))
    md = repr(float(m))
    sprev = f"f.s[((f.t - 1) % {m}) + 1]"
    lnew = (
        f"CAST({a} AS DOUBLE) * (ys[f.t] - {sprev}) "
        f"+ CAST({om_a} AS DOUBLE) * (f.l + f.b)"
    )
    return f"""
WITH RECURSIVE daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS v
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
ser AS (
    SELECT key, list(v ORDER BY day) AS ys, max(day) AS last_day
    FROM daily GROUP BY key HAVING count(*) >= {m}
),
init AS (
    SELECT key,
           list_reduce(list_slice(ys, 1, {m}), (x, y) -> x + y)
             / CAST({md} AS DOUBLE) AS l0,
           CASE WHEN len(ys) >= {2 * m} THEN
             (list_reduce(list_slice(ys, {m + 1}, {2 * m}), (x, y) -> x + y)
               / CAST({md} AS DOUBLE) - l0) / CAST({md} AS DOUBLE)
           ELSE CAST(0 AS DOUBLE) END AS b0,
           list_transform(list_slice(ys, 1, {m}), x -> x - l0) AS s0
    FROM ser
),
fit(key, t, l, b, s) AS (
    SELECT key, {m + 1}, l0, b0, s0 FROM init
    UNION ALL
    SELECT f.key, f.t + 1,
           {lnew},
           CAST({be} AS DOUBLE) * (({lnew}) - f.l)
             + CAST({om_b} AS DOUBLE) * f.b,
           list_transform(f.s, (x, i) ->
             CASE WHEN i = ((f.t - 1) % {m}) + 1
                  THEN CAST({g} AS DOUBLE) * (ys[f.t] - ({lnew}))
                       + CAST({om_g} AS DOUBLE) * x
                  ELSE x END)
    FROM fit f JOIN ser USING (key)
    WHERE f.t <= len(ys)
),
final AS (
    SELECT f.key, f.l, f.b, f.s, s2.last_day, len(s2.ys) AS n
    FROM fit f JOIN ser s2 USING (key)
    WHERE f.t = len(s2.ys) + 1
)
SELECT key, CAST(h AS INT) AS h,
       last_day + h * INTERVAL 1 DAY AS forecast_day,
       round(l + CAST(h AS DOUBLE) * b
             + s[((n + h - 1) % {m}) + 1], 6) AS yhat
FROM final, range(1, {horizon + 1}) t(h)
ORDER BY key, h
"""


def q_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    # neighborhood-overlap link prediction (common neighbors / Jaccard
    # / Adamic-Adar) for non-edge part pairs of the co-purchase graph
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.link_prediction(edges, min_common=2).orderBy(
        "node_a", "node_b"
    )


_LINKPRED_SQL = f"""
WITH {_COPURCHASE_EDGES_SQL},
und AS MATERIALIZED (
    SELECT a AS x, b AS y FROM edges UNION ALL SELECT b, a FROM edges
),
deg AS MATERIALIZED (SELECT x AS node, count(*) AS deg FROM und GROUP BY 1),
mid AS (
    SELECT node AS u,
           CASE WHEN deg >= 2 THEN CAST(floor(
               1000000.0 / ln(CAST(deg AS DOUBLE)) + 0.5) AS BIGINT)
           END AS aa
    FROM deg
),
wedges AS (
    SELECT w1.x AS x, w2.y AS y, m.aa
    FROM und w1
    JOIN und w2 ON w1.y = w2.x AND w1.x < w2.y
    JOIN mid m ON m.u = w1.y
),
cand AS MATERIALIZED (
    SELECT x AS node_a, y AS node_b,
           count(*) AS cn, sum(aa) AS aasum
    FROM wedges GROUP BY 1, 2 HAVING count(*) >= 2
),
noedge AS (
    SELECT c.* FROM cand c
    LEFT JOIN edges e ON e.a = c.node_a AND e.b = c.node_b
    WHERE e.a IS NULL
)
SELECT n.node_a, n.node_b, n.cn AS common_neighbors,
       round(CAST(n.cn AS DOUBLE)
             / CAST(da.deg + db.deg - n.cn AS DOUBLE), 6) AS jaccard,
       round(CAST(n.aasum AS DOUBLE) / 1000000.0, 6) AS adamic_adar
FROM noedge n
JOIN deg da ON da.node = n.node_a
JOIN deg db ON db.node = n.node_b
ORDER BY n.node_a, n.node_b
"""


_ACF_MAX_LAG = 14


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-event-type autocorrelation of the daily value series, lags
    # 1..14 — the seasonality evidence that precedes picking a period
    # for seasonal_decompose / holt_winters (exact-integer sums, one
    # fixed double op sequence at the end)
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = timeseries.daily_series(ev, "event_type", "ts", "value")
    daily = daily.withColumn("value", F.round("value", 6))
    return timeseries.autocorrelation(
        daily, max_lag=_ACF_MAX_LAG
    ).orderBy("key", "lag")


_ACF_SQL_TMPL = """
WITH daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
v AS (
    -- NULL observations excluded before indexing (mirror of the
    -- operator: engines disagree on NULL sort order)
    SELECT key,
           CAST(CASE WHEN value >= 0
                     THEN floor(value * CAST(1000000 AS DOUBLE) + 0.5)
                     ELSE -floor(-value * CAST(1000000 AS DOUBLE) + 0.5)
                END AS BIGINT) AS vm,
           row_number() OVER (PARTITION BY key ORDER BY day) AS idx
    FROM daily WHERE value IS NOT NULL
),
p AS (
    SELECT a.key, l.lag, a.vm AS x, b.vm AS y
    FROM v a
    CROSS JOIN (SELECT unnest(generate_series(1, {max_lag})) AS lag) l
    JOIN v b ON b.key = a.key AND b.idx = a.idx + l.lag
),
s AS (
    -- all five correlation sums EXACT (HUGEINT; the Spark side uses
    -- DECIMAL(36,0) — both arbitrary-precision-exact, both order-free)
    SELECT key, lag, count(*) AS n_pairs,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
    FROM p GROUP BY 1, 2
)
SELECT key, lag, n_pairs,
       CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN {q_acf}
       END AS acf
FROM s ORDER BY key, lag
"""


def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust per-event-type outlier days: |x - median| > 3.5 * MAD on
    # the daily value series — the sensor-QC primitive (all-integer
    # median/MAD selection, one float division in the reported score)
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = timeseries.daily_series(ev, "event_type", "ts", "value")
    daily = daily.withColumn("value", F.round("value", 6))
    return timeseries.mad_outliers(daily).orderBy("key", "day")


_MAD_SQL_TMPL = """
WITH daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
v AS (
    -- NULL observations excluded (mirror of the operator: a NULL in
    -- the median rank window splits the engines on NULL sort order)
    SELECT key, day, value,
           CAST(CASE WHEN value >= 0
                     THEN floor(value * CAST(1000000 AS DOUBLE) + 0.5)
                     ELSE -floor(-value * CAST(1000000 AS DOUBLE) + 0.5)
                END AS BIGINT) AS vm
    FROM daily WHERE value IS NOT NULL
),
r1 AS (
    SELECT key, vm,
           row_number() OVER (PARTITION BY key ORDER BY vm) AS rn,
           count(*) OVER (PARTITION BY key) AS n
    FROM v
),
med AS (
    -- 2x the median by exact selection (odd n: the single central row
    -- counts twice); tie order among equal values cannot change the
    -- selected VALUES
    SELECT key,
           sum(vm * CASE WHEN (n + 1) // 2 = (n + 2) // 2
                         THEN 2 ELSE 1 END) AS med2
    FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY key
),
d AS (
    SELECT v.key, v.day, v.value, abs(2 * v.vm - m.med2) AS dev2
    FROM v JOIN med m ON v.key = m.key
),
r2 AS (
    SELECT key, dev2,
           row_number() OVER (PARTITION BY key ORDER BY dev2) AS rn,
           count(*) OVER (PARTITION BY key) AS n
    FROM d
),
mad AS (
    SELECT key,
           sum(dev2 * CASE WHEN (n + 1) // 2 = (n + 2) // 2
                           THEN 2 ELSE 1 END) AS mad4
    FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY key
)
SELECT d.key, d.day, d.value,
       CASE WHEN m.mad4 > 0 THEN {q_score} END AS score
FROM d JOIN mad m ON d.key = m.key
WHERE 2 * {k_den} * d.dev2 > {k_num} * m.mad4
ORDER BY d.key, d.day
"""


def q_seasonal_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = timeseries.daily_series(ev, "event_type", "ts", "value")
    daily = daily.withColumn("value", F.round("value", 6))
    return timeseries.seasonal_decompose(daily, period=7).orderBy(
        "key", "day"
    )


_SEASONAL_DECOMP_SQL_TMPL = """
WITH daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
v AS (
    SELECT key, day, value,
           -- ((x % 7) + 7) % 7 = Spark's pmod: sign-safe for pre-1970
           -- days, identical to plain % on the non-negative range
           CAST((((epoch(day)::BIGINT // 86400) % 7) + 7) % 7 AS INT) AS slot,
           CAST(CASE WHEN value >= 0
                     THEN floor(value * CAST(1000000 AS DOUBLE) + 0.5)
                     ELSE -floor(-value * CAST(1000000 AS DOUBLE) + 0.5)
                END AS BIGINT) AS vmic
    FROM daily
),
t AS (
    -- trend from an EXACT LONG micro window sum: a DOUBLE window-avg
    -- diverges in the last ulp between the engines' moving-frame
    -- strategies (incremental vs recompute)
    SELECT key, day, value, slot,
           CASE WHEN count(vmic) OVER w = 7
                THEN CAST(sum(vmic) OVER w AS DOUBLE)
                     / CAST(7000000 AS DOUBLE) END AS trend
    FROM v
    WINDOW w AS (PARTITION BY key ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
d AS (
    SELECT *,
           CASE WHEN trend IS NOT NULL THEN CAST(
               CASE WHEN value - trend >= 0
                    THEN floor((value - trend)
                               * CAST(1000000 AS DOUBLE) + 0.5)
                    ELSE -floor(-(value - trend)
                                * CAST(1000000 AS DOUBLE) + 0.5)
               END AS BIGINT)
           END AS dmic
    FROM t
),
s AS (
    SELECT key, slot,
           CAST(sum(dmic) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE)
                * CAST(1000000 AS DOUBLE)) AS sraw
    FROM d WHERE dmic IS NOT NULL GROUP BY 1, 2
),
sc AS (
    SELECT key, slot,
           {q_seasonal} AS seasonal
    FROM s
    WINDOW ws AS (PARTITION BY key ORDER BY slot
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING)
)
SELECT d.key, d.day, d.value,
       {q_trend} AS trend,
       sc.seasonal,
       CASE WHEN d.trend IS NOT NULL
            THEN {q_resid}
       END AS residual
FROM d LEFT JOIN sc ON d.key = sc.key AND d.slot = sc.slot
ORDER BY d.key, d.day
"""

#: half-away quantize (the _quantize_sql contract) instead of engine
#: round(): centered seasonal effects land on decimal ties where the
#: engines' rounds disagree (observed live on this operator).
_SEASONAL_DECOMP_SQL = _SEASONAL_DECOMP_SQL_TMPL.format(
    q_seasonal=_quantize_sql(
        "sraw - sum(sraw) OVER ws / count(sraw) OVER ws", 6
    ),
    q_trend=_quantize_sql("d.trend", 6),
    q_resid=_quantize_sql(
        f"d.value - {_quantize_sql('d.trend', 6)} - sc.seasonal", 6
    ),
)


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary on sf0.001."""
    return q_tpch_q1(spark, "/root/testdata/sf0.001")




_CCF_MAX_LAG = 7


def q_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-event-type cross-correlation between daily VALUE (sum) and
    # daily VOLUME (count): does activity lead or lag revenue, per
    # type, at lags -7..+7 (exact-integer sums, one fixed double op
    # sequence at the end — the ACF contract, two series)
    from big_data_in_agriculture_spark.operators import timeseries

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type").alias("key"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        F.round(F.sum("value"), 6).alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    return timeseries.cross_correlation(
        daily, max_lag=_CCF_MAX_LAG
    ).orderBy("key", "lag")


_CCF_SQL_TMPL = """
WITH daily AS (
    SELECT event_type AS key, date_trunc('day', ts) AS day,
           round(sum(value), 6) AS x,
           CAST(count(*) AS DOUBLE) AS y
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
v AS (
    -- complete-case days, indexed once (mirror of the operator); the
    -- daily aggregate never yields NULLs here but the filter pins the
    -- contract
    SELECT key,
           CAST(CASE WHEN x >= 0
                     THEN floor(x * CAST(1000000 AS DOUBLE) + 0.5)
                     ELSE -floor(-x * CAST(1000000 AS DOUBLE) + 0.5)
                END AS BIGINT) AS xm,
           CAST(CASE WHEN y >= 0
                     THEN floor(y * CAST(1000000 AS DOUBLE) + 0.5)
                     ELSE -floor(-y * CAST(1000000 AS DOUBLE) + 0.5)
                END AS BIGINT) AS ym,
           row_number() OVER (PARTITION BY key ORDER BY day) AS idx
    FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
),
p AS (
    SELECT a.key, l.lag, a.xm AS x, b.ym AS y
    FROM v a
    CROSS JOIN (SELECT unnest(generate_series(-{max_lag}, {max_lag})) AS lag) l
    JOIN v b ON b.key = a.key AND b.idx = a.idx + l.lag
),
s AS (
    SELECT key, CAST(lag AS INTEGER) AS lag, count(*) AS n_pairs,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
    FROM p GROUP BY 1, 2
)
SELECT key, lag, n_pairs,
       CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN {q_ccf}
       END AS ccf
FROM s ORDER BY key, lag
"""


def q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global clustering coefficient (3T/W) of the co-purchase graph —
    # the one-number graph-health KPI; inherits clustering_coeff's
    # oriented wedge enumeration + breaker
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    return graph.transitivity(edges)


_TRANSITIVITY_SQL = f"""
WITH {_COPURCHASE_EDGES_SQL},
und AS (SELECT a AS u, b AS v FROM edges UNION ALL SELECT b, a FROM edges),
deg AS (SELECT u AS node, count(*) AS degree FROM und GROUP BY 1),
tris AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
),
tcount AS (SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1),
per_node AS (
    SELECT d.node, d.degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM deg d LEFT JOIN tcount t USING (node)
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(n_triangles) // 3 AS BIGINT) AS n_triangles,
       CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges,
       CASE WHEN sum(degree * (degree - 1) // 2) > 0
            THEN round(CAST(sum(n_triangles) AS DOUBLE)
                       / CAST(sum(degree * (degree - 1) // 2) AS DOUBLE), 6)
       END AS transitivity
FROM per_node
"""


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-digit screen on order totals — the one-scan
    # fabricated-data detector (expected propensities are PYTHON
    # literals on both engines: no libm log10 in either plan)
    from big_data_in_agriculture_spark.operators import profile as prof

    return prof.benford_deviation(
        _t(spark, sf_dir, "orders"), "o_totalprice"
    ).orderBy("digit")


def _benford_sql() -> str:
    from big_data_in_agriculture_spark.operators.profile import (
        _BENFORD_EXPECTED,
    )

    exp_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_EXPECTED[d]!r} AS DOUBLE)"
        for d in range(1, 10)
    ) + " END"
    share = (
        "CASE WHEN tot > 0 THEN "
        + _quantize_sql("CAST(n_obs AS DOUBLE) / CAST(tot AS DOUBLE)", 6)
        + " ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
WITH vals AS (
    SELECT CAST(floor(abs(CAST(o_totalprice AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT) AS vm
    FROM orders
    WHERE o_totalprice IS NOT NULL
      AND NOT isnan(CAST(o_totalprice AS DOUBLE))
),
counts AS (
    SELECT CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           count(*) AS n_obs
    FROM vals WHERE vm > 0 GROUP BY 1
),
digits AS (SELECT unnest(generate_series(1, 9)) AS digit),
j AS (
    SELECT CAST(d.digit AS INTEGER) AS digit,
           CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
           (SELECT coalesce(sum(n_obs), 0) FROM counts) AS tot
    FROM digits d LEFT JOIN counts c ON c.digit = d.digit
),
shr AS (
    SELECT digit, n_obs, {share} AS share, {exp_case} AS expected
    FROM j
)
SELECT digit, n_obs, share, expected,
       {_quantize_sql('abs(share - expected)', 6)} AS deviation
FROM shr ORDER BY digit
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "era5_hourly_spatial_mean": q_era5_hourly_spatial_mean,
        "pagerank_trade": q_pagerank,
        "era5_daily_rollup": q_era5_daily_rollup,
        "nb_language": q_nb_language,
        "era5_serve_filter_daily": q_era5_serve_filter_daily,
        "era5_pivot": q_era5_pivot,
        "era5_kpis": q_era5_kpis,
        "era5_verification": q_era5_verification,
        "bpe_train": q_bpe_train,
        "era5_convert_units": q_era5_convert_units,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "cdc_apply": q_cdc_apply,
        "bm25_search": q_bm25_search,
        "join_semi": q_join_semi,
        "seasonal_decomp": q_seasonal_decomp,
        "scd2_history": q_scd2_history,
        "interval_join": q_interval_join,
        "knn_sq": q_knn_sq,
        "semantic_dedup": q_semantic_dedup,
        "sessionize": q_sessionize,
        "set_intersect": q_set_intersect,
        "classifier_quality": q_classifier_quality,
        "rollup_acctbal": q_rollup,
        "top10_orders": q_top10_orders,
        "quantile_sketch": q_quantile_sketch,
        "incremental_rollup": q_incremental_rollup,
        "dedup_exact_docs": q_dedup_exact_docs,
        "pii_scan": q_pii_scan,
        "pack_firstfit": q_pack_firstfit,
        "corpus_profile": q_corpus_profile,
        "edit_linkage": q_edit_linkage,
        "dense_ids_orders": q_dense_ids,
        "lm_backoff_ppl": q_lm_backoff_ppl,
        "mad_events": q_mad,
        "retention_cohorts": q_retention_cohorts,
        "multimodal_meta": q_multimodal_meta,
        "minhash_neardup": q_minhash_neardup,
        "acf_events": q_acf,
        # --- registry-order note: the driver's correctness gate checks
        # a PREFIX of this dict (50 entries). The first 50 are PINNED
        # (tests/test_registry.py::test_driver_prefix_is_pinned) — new
        # queries append AFTER the prefix, never inside it, so gate
        # visibility can't drift by accident. Rounds 5, 6 and 7 each
        # DELIBERATELY rotated five slots so never-externally-verified
        # queries gain CORRECTNESS rows (r5: kmeans_clusters,
        # semantic_dedup, classifier_quality, pack_firstfit, bpe_train;
        # r6: cdc_apply, scd2_history, interval_join, hybrid_search,
        # incremental_rollup; r7: bm25_search, cms_frequencies,
        # line_dedup, bpe_encode, retention_cohorts; r8:
        # pagerank_trade, nb_language, knn_sq, edit_linkage,
        # lm_backoff_ppl; r9: dbscan_embed, quantile_sketch,
        # dense_ids_orders, holt_forecast, bfs_trade_hops; r10:
        # ppr_trade, kcore_trade, sssp_trade, hw_forecast,
        # clustering_coeff; r11: core_numbers_trade, lpa_communities,
        # acf_events, mad_events, seasonal_decomp — displacing
        # ppr_trade, kcore_trade, bfs_trade_hops, holt_forecast,
        # dbscan_embed, each with a same-family prefix sibling:
        # pagerank_trade, core_numbers_trade itself (full coreness
        # subsumes k-core), sssp_trade, hw_forecast, lpa_communities).
        # Displaced queries (r10: hybrid_search,
        # substring_dedup, epoch_shuffle, sliding_window_rollup,
        # trending_items — each leaving a same-family sibling in the
        # prefix: bm25_search covers retrieval, dedup_exact_docs +
        # minhash_neardup cover dedup, pack_firstfit covers shard
        # export, stream_daily_rollup covers streaming; r9:
        # kmeans_clusters, cms_frequencies, line_dedup,
        # bpe_encode, knn_lsh; r8: era5_weighted_mean,
        # era5_chain, window_topn, jaccard_pairs, simhash; r7: tpch_q5,
        # dedup_exact_groups, containment_pairs,
        # knn_bruteforce, embedding_norms) join the DISPLACED set in
        # test_registry.py::test_displaced_query_oracle_parity with
        # full Spark-vs-DuckDB hash parity in pytest, and their
        # two-engine hashes are recorded in the committed
        # DISPLACED_VERIFY.json artifact (scripts/displaced_verify.py).
        "core_numbers_trade": q_core_numbers,
        "lpa_communities": q_lpa,
        "leakage_split": q_leakage_split,
        "gopher_pipeline": q_gopher_pipeline,
        "sssp_trade": q_sssp,
        "textrank_keywords": q_textrank,
        "bloom_dedup": q_bloom_dedup,
        "stream_daily_rollup": q_stream_daily_rollup,
        "hw_forecast": q_hw_forecast,
        "clustering_coeff": q_clustering_coeff,
        "asof_attribution": q_asof_attribution,
        # --- end of the 50-slot driver-gate prefix ---
        "hybrid_search": q_hybrid_search,
        "substring_dedup": q_substring_dedup,
        "epoch_shuffle": q_epoch_shuffle,
        "sliding_window_rollup": q_sliding_window_rollup,
        "trending_items": q_trending,
        "minhash_neardup_collapsed": q_minhash_neardup_collapsed,
        "tpch_q4": q_tpch_q4,
        "join_broadcast": q_join_broadcast,
        "window_running_total": q_window_running_total,
        "dup_cluster_histogram": q_dup_cluster_histogram,
        "knn_ivf": q_knn_ivf,
        "era5_distinct_regions": q_era5_distinct_regions,
        "join_anti": q_join_anti,
        "window_lag": q_window_lag,
        "set_except": q_set_except,
        "readability": q_readability,
        "era5_filter_hourly": q_era5_filter_hourly,
        "era5_water_balance": q_era5_water_balance,
        "window_rolling_7d": q_window_rolling_7d,
        "tpch_q6": q_tpch_q6,
        "cube_orders": q_cube_orders,
        "union_all_segments": q_union_all_segments,
        "doc_fingerprints": q_doc_fingerprints,
        "multimodal_features": q_multimodal_features,
        "tpch_q5": q_tpch_q5,
        "dedup_exact_groups": q_dedup_exact_groups,
        "containment_pairs": q_containment,
        "knn_bruteforce": q_knn_bruteforce,
        "embedding_norms": q_embedding_norms,
        "salted_join": q_salted_join,
        "copurchase_pairs": q_copurchase,
        "triangle_participation": q_triangles,
        "association_rules": q_association_rules,
        "rfm_segments": q_rfm_segments,
        "revenue_gini": q_revenue_gini,
        "qoq_growth": q_qoq_growth,
        "pareto_contribution": q_pareto,
        "bpe_token_stats": q_bpe_token_stats,
        "embedding_neardup": q_embedding_neardup,
        "session_window_rollup": q_session_window_rollup,
        "tpch_q10": q_tpch_q10,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q7": q_tpch_q7,
        "tpch_q22": q_tpch_q22,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q17": q_tpch_q17,
        "tpch_q21": q_tpch_q21,
        "tpch_q2": q_tpch_q2,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "grouping_sets": q_grouping_sets,
        "unpivot_summary": q_unpivot_summary,
        "percentiles": q_percentiles,
        "gapfill_locf": q_gapfill_locf,
        "range_join_binned": q_range_join_binned,
        "point_in_bbox": q_point_in_bbox,
        "quality_filter": q_quality_filter,
        "robust_outliers": q_robust_outliers,
        "top_tokens": q_top_tokens,
        "zipf_slope": q_zipf_slope,
        "hapax_rate": q_hapax_rate,
        "dedup_keep_best": q_dedup_keep_best,
        "json_props": q_json_props,
        "llm_pipeline": q_llm_pipeline,
        "value_histogram": q_value_histogram,
        "hash_split": q_hash_split,
        "ema": q_ema,
        "funnel": q_funnel,
        "neardup_clusters": q_neardup_clusters,
        "mart_roundtrip": q_mart_roundtrip,
        "profile_lineitem": q_profile_lineitem,
        "approx_profile_events": q_approx_profile_events,
        "hll_rollup": q_hll_rollup,
        "text_cleaning": q_text_cleaning,
        "sql_interface": q_sql_interface,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bm25_indexed": q_bm25_indexed,
        "stratified_sample": q_stratified_sample,
        "group_sample": q_group_sample,
        "check_constraints": q_check_constraints,
        "k_anonymity": q_k_anonymity,
        "referential_check": q_referential_check,
        "event_transitions": q_event_transitions,
        "contamination": q_contamination,
        "vocab_coverage": q_vocab_coverage,
        "rolling_zscore": q_rolling_zscore,
        "grouped_trend": q_grouped_trend,
        "diurnal_anomaly": q_diurnal_anomaly,
        "seasonal_envelope": q_seasonal_envelope,
        "ship_sla": q_ship_sla,
        "correlation_matrix": q_correlation_matrix,
        "quantile_bins": q_quantile_bins,
        "lang_confusion": q_lang_confusion,
        "weighted_sample": q_weighted_sample,
        "weighted_topk_sample": q_weighted_topk,
        "embedding_dim_stats": q_embedding_dim_stats,
        "label_centroids": q_label_centroids,
        "cumulative_users": q_cumulative_users,
        "debounce": q_debounce,
        "curation_pipeline": q_curation_pipeline,
        "winsorize": q_winsorize,
        "impute_group_mean": q_impute_group_mean,
        "snapshot_diff": q_snapshot_diff,
        "ab_test": q_ab_test,
        "token_entropy": q_token_entropy,
        "bpe_merge_step": q_bpe_merge_step,
        "lm_perplexity": q_lm_perplexity,
        "blocklist_filter": q_blocklist_filter,
        "minhash_recall_floor": q_minhash_recall_floor,
        "mixture_sample": q_mixture_sample,
        "temperature_sample": q_temperature_sample,
        "preprocess_pipeline": q_preprocess_pipeline,
        "chunk_documents": q_chunk_documents,
        "split_sentences": q_split_sentences,
        "quality_floor": q_quality_floor,
        "bigram_pmi": q_bigram_pmi,
        "corpus_report": q_corpus_report,
        "classifier_score": q_classifier_score,
        "gopher_filter": q_gopher_filter,
        "shard_manifest": q_shard_manifest,
        "repetition_filter": q_repetition_filter,
        "window_ranks": q_window_ranks,
        "key_skew": q_key_skew,
        "interval_overlap": q_interval_overlap,
        "fuzzy_join": q_fuzzy_join,
        "cusum_changepoint": q_cusum_changepoint,
        "seasonal_backtest": q_seasonal_backtest,
        "dsir_scores": q_dsir_scores,
        "text_stats": q_text_stats,
        "pack_chunks": q_pack_chunks,
        "crosscorpus_dedup": q_crosscorpus_dedup,
        "bloom_stats": q_bloom_stats,
        "url_canonical": q_url_canonical,
        "domain_cap_sample": q_domain_cap_sample,
        "rp_project": q_rp_project,
        "knn_rp": q_knn_rp,
        "pq_codes": q_pq_codes,
        "knn_pq": q_knn_pq,
        "knn_ivfpq": q_knn_ivfpq,
        "sq_codes": q_sq_codes,
        "knn_lsh": q_knn_lsh,
        "stream_click_attribution": q_stream_click_attribution,
        "line_dedup": q_line_dedup,
        "cms_frequencies": q_cms_frequencies,
        "bpe_encode": q_bpe_encode,
        "kmeans_clusters": q_kmeans_clusters,
        "era5_weighted_mean": q_era5_weighted_mean,
        "era5_chain": q_era5_chain,
        "window_topn": q_window_topn,
        "jaccard_pairs": q_jaccard_pairs,
        "simhash": q_simhash,
        # round-9 widening: graph-analytics depth + seasonal forecast
        # (ppr/kcore/sssp/hw/clustering rotated INTO the prefix in r10)
        "linkpred_parts": q_linkpred,
        # round-11 rotation: the five displaced prefix queries stay
        # registered (oracle parity in test_registry.py + the committed
        # DISPLACED_VERIFY.json) — each left a same-family sibling in
        # the prefix: pagerank_trade covers ppr_trade, core_numbers
        # subsumes kcore_trade, sssp_trade covers bfs_trade_hops,
        # hw_forecast covers holt_forecast, lpa_communities +
        # semantic_dedup/knn_sq cover dbscan_embed.
        "ppr_trade": q_ppr,
        "kcore_trade": q_kcore,
        "bfs_trade_hops": q_bfs_hops,
        "holt_forecast": q_holt_forecast,
        "dbscan_embed": q_dbscan,
        # round-11 widening: CCF (lead/lag between two aligned series),
        # global transitivity, Benford first-digit screen
        "ccf_events": q_ccf,
        "transitivity_trade": q_transitivity,
        "benford_prices": q_benford,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "era5_hourly_spatial_mean": _ERA5_HOURLY_SQL,
        "era5_weighted_mean": _ERA5_WEIGHTED_SQL,
        "era5_daily_rollup": _ERA5_DAILY_SQL,
        "era5_chain": _ERA5_CHAIN_SQL,
        "era5_serve_filter_daily": _ERA5_FILTER_SQL,
        "era5_pivot": _ERA5_PIVOT_SQL,
        "era5_kpis": _ERA5_KPIS_SQL,
        "era5_verification": _ERA5_VERIF_SQL,
        "era5_distinct_regions": _ERA5_DISTINCT_SQL,
        "era5_convert_units": _ERA5_CONVERT_SQL,
        "tpch_q1": _Q1_SQL,
        "tpch_q3": _Q3_SQL,
        "tpch_q4": _Q4_SQL,
        "tpch_q5": _Q5_SQL,
        "join_semi": _SEMI_SQL,
        "join_anti": _ANTI_SQL,
        "join_broadcast": _BROADCAST_SQL,
        "window_running_total": _RUNNING_SQL,
        "window_topn": _TOPN_SQL,
        "window_lag": _LAG_SQL,
        "sessionize": _SESSION_SQL,
        "set_intersect": _INTERSECT_SQL,
        "set_except": _EXCEPT_SQL,
        "rollup_acctbal": _ROLLUP_SQL,
        "top10_orders": _TOP10_SQL,
        "dedup_exact_groups": _DEDUP_GROUPS_SQL,
        "dup_cluster_histogram": _DUP_HIST_SQL,
        "dedup_exact_docs": _DEDUP_DOCS_SQL,
        "text_stats": _TEXT_STATS_SQL,
        "readability": _READABILITY_SQL,
        "corpus_profile": _CORPUS_PROFILE_SQL,
        "jaccard_pairs": _JACCARD_SQL,
        "containment_pairs": _CONTAINMENT_SQL,
        "simhash": _simhash_oracle(),
        "knn_bruteforce": _KNN_SQL,
        "embedding_norms": _NORMS_SQL,
        "multimodal_meta": _MULTIMODAL_SQL,
        "era5_filter_hourly": _ERA5_FILTER_HOURLY_SQL,
        "era5_water_balance": _ERA5_WATER_SQL,
        "window_rolling_7d": _ROLLING_SQL,
        "tpch_q6": _Q6_SQL,
        "cube_orders": _CUBE_SQL,
        "union_all_segments": _UNION_SQL,
        "doc_fingerprints": _lang_sql(),
        "stream_daily_rollup": _STREAM_SQL,
        "sliding_window_rollup": _SLIDING_SQL,
        "trending_items": _TRENDING_SQL,
        "multimodal_features": _MULTIMODAL_FEATURES_SQL,
        "asof_attribution": _ASOF_SQL,
        "salted_join": _SALTED_SQL,
        "copurchase_pairs": _COPURCHASE_SQL,
        "triangle_participation": _TRIANGLES_SQL,
        "association_rules": _ASSOC_SQL,
        "rfm_segments": _RFM_SQL,
        "revenue_gini": _GINI_SQL,
        "qoq_growth": _QOQ_SQL,
        "pareto_contribution": _PARETO_SQL,
        "bpe_token_stats": _bpe_sql(),
        # embedding_neardup IS oracle-checkable despite LSH: identical
        # vectors agree on every hyperplane sign, so recall on the
        # planted exact duplicates is 1.0 by construction, and nothing
        # else reaches the 0.9 threshold (max natural cosine ≈ 0.51).
        "embedding_neardup": _EMB_NEARDUP_SQL,
        "session_window_rollup": _SESSION_WINDOW_SQL,
        "tpch_q10": _Q10_SQL,
        "tpch_q14": _Q14_SQL,
        "tpch_q15": _Q15_SQL,
        "tpch_q18": _Q18_SQL,
        "tpch_q19": _Q19_SQL,
        "tpch_q7": _Q7_SQL,
        "tpch_q22": _Q22_SQL,
        "tpch_q8": _Q8_SQL,
        "tpch_q9": _Q9_SQL,
        "tpch_q11": _Q11_SQL,
        "tpch_q12": _Q12_SQL,
        "tpch_q13": _Q13_SQL,
        "tpch_q17": _Q17_SQL,
        "tpch_q21": _Q21_SQL,
        "tpch_q2": _Q2_SQL,
        "tpch_q16": _Q16_SQL,
        "tpch_q20": _Q20_SQL,
        "grouping_sets": _GROUPING_SETS_SQL,
        "unpivot_summary": _UNPIVOT_SQL,
        "percentiles": _PERCENTILES_SQL,
        "gapfill_locf": _GAPFILL_SQL,
        "range_join_binned": _RANGE_JOIN_SQL,
        "point_in_bbox": _POINT_BBOX_SQL,
        "quality_filter": _QUALITY_FILTER_SQL,
        "robust_outliers": _OUTLIERS_SQL,
        "top_tokens": _TOP_TOKENS_SQL,
        "zipf_slope": _ZIPF_SQL,
        "hapax_rate": _HAPAX_SQL,
        "dedup_keep_best": _KEEP_BEST_SQL,
        "json_props": _JSON_PROPS_SQL,
        "llm_pipeline": _llm_pipeline_sql(),
        "value_histogram": _HISTOGRAM_SQL,
        "hash_split": _HASH_SPLIT_SQL,
        "epoch_shuffle": _EPOCH_SHUFFLE_SQL,
        "ema": _EMA_SQL,
        "retention_cohorts": _RETENTION_SQL,
        "funnel": _FUNNEL_SQL,
        "neardup_clusters": _COMPONENTS_SQL,
        "mart_roundtrip": _MART_ROUNDTRIP_SQL,
        "profile_lineitem": _profile_sql(),
        "text_cleaning": _text_cleaning_sql(),
        "interval_join": _INTERVAL_JOIN_SQL,
        "sql_interface": _NATION_RANK_SQL,
        "tfidf_top_terms": _TFIDF_SQL,
        "bm25_search": _BM25_SQL,
        "bm25_indexed": _BM25_SQL,
        "substring_dedup": _SUBSTR_DEDUP_SQL,
        "stratified_sample": _stratified_sql(),
        "group_sample": _GROUP_SAMPLE_SQL,
        "check_constraints": _CHECK_CONSTRAINTS_SQL,
        "k_anonymity": _K_ANON_SQL,
        "referential_check": _REF_CHECK_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "contamination": _CONTAMINATION_SQL,
        "vocab_coverage": _VOCAB_COVERAGE_SQL,
        "rolling_zscore": _ROLLING_ZSCORE_SQL,
        "grouped_trend": _GROUPED_TREND_SQL,
        "diurnal_anomaly": _DIURNAL_SQL,
        "seasonal_envelope": _SEASONAL_SQL,
        "ship_sla": _SHIP_SLA_SQL,
        "correlation_matrix": _CORRELATION_SQL,
        "quantile_bins": _QUANTILE_BINS_SQL,
        "lang_confusion": _lang_confusion_sql(),
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "weighted_topk_sample": _WEIGHTED_TOPK_SQL,
        "embedding_dim_stats": _EMBEDDING_DIM_STATS_SQL,
        "label_centroids": _LABEL_CENTROID_SQL,
        "cdc_apply": _CDC_APPLY_SQL,
        "scd2_history": _SCD2_SQL,
        "cumulative_users": _CUMULATIVE_USERS_SQL,
        "debounce": _DEBOUNCE_SQL,
        "curation_pipeline": _curation_sql(),
        "winsorize": _WINSORIZE_SQL,
        "impute_group_mean": _IMPUTE_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "ab_test": _AB_TEST_SQL,
        "token_entropy": _TOKEN_ENTROPY_SQL,
        "bpe_merge_step": _BPE_MERGE_SQL,
        "lm_perplexity": _LM_PERPLEXITY_SQL,
        "line_dedup": _LINE_DEDUP_SQL,
        "blocklist_filter": _BLOCKLIST_SQL,
        "pack_chunks": _PACK_CHUNKS_SQL,
        "minhash_recall_floor": _MINHASH_RECALL_SQL,
        "mixture_sample": _MIXTURE_SQL,
        "temperature_sample": _TEMPERATURE_SQL,
        "preprocess_pipeline": _PREPROCESS_SQL,
        "chunk_documents": _CHUNK_DOCS_SQL,
        "split_sentences": _SPLIT_SENT_SQL,
        "crosscorpus_dedup": _CROSSCORPUS_SQL,
        "quality_floor": _QUALITY_FLOOR_SQL,
        "bigram_pmi": _BIGRAM_PMI_SQL,
        "textrank_keywords": _TEXTRANK_SQL,
        "corpus_report": _CORPUS_REPORT_SQL,
        "classifier_score": _CLASSIFIER_SCORE_SQL,
        "gopher_filter": _gopher_sql(),
        "shard_manifest": _SHARD_MANIFEST_SQL,
        "repetition_filter": _repetition_sql(),
        "window_ranks": _WINDOW_RANKS_SQL,
        "key_skew": _KEY_SKEW_SQL,
        "interval_overlap": _INTERVAL_OVERLAP_SQL,
        "fuzzy_join": _FUZZY_JOIN_SQL,
        "gopher_pipeline": _gopher_pipeline_sql(),
        "cusum_changepoint": _CUSUM_SQL,
        "seasonal_backtest": _SEASONAL_BACKTEST_SQL,
        "dsir_scores": _dsir_sql(),
        "bloom_dedup": _BLOOM_DEDUP_SQL,
        "pii_scan": _PII_SCAN_SQL,
        "bloom_stats": _BLOOM_STATS_SQL,
        "cms_frequencies": _CMS_SQL,
        "leakage_split": _LEAKAGE_SPLIT_SQL,
        "incremental_rollup": _INCREMENTAL_ROLLUP_SQL,
        "hybrid_search": _HYBRID_SQL,
        # Approximate ops with FULL pipeline twins (portable md5
        # hashing / deterministic constants — DuckDB replays the
        # whole candidate generation bit-identically):
        "minhash_neardup": _minhash_neardup_sql(),
        "minhash_neardup_collapsed": _minhash_collapsed_sql(),
        "knn_lsh": _knn_lsh_sql(),
        "knn_ivf": _knn_ivf_sql(),
        "knn_rp": _knn_rp_sql(),
        "knn_pq": _knn_pq_sql(),
        "knn_ivfpq": _knn_ivfpq_sql(),
        "lm_backoff_ppl": _lm_backoff_sql(),
        "edit_linkage": _EDIT_LINKAGE_SQL,
        "pagerank_trade": _pagerank_sql(),
        "sq_codes": _sq_codes_sql(),
        "knn_sq": _knn_sq_sql(),
        "nb_language": _NB_LANGUAGE_SQL,
        "bfs_trade_hops": _BFS_HOPS_SQL,
        "stream_click_attribution": _STREAM_CLICK_ATTRIBUTION_SQL,
        "dense_ids_orders": _DENSE_IDS_SQL,
        "quantile_sketch": _quantile_sketch_sql(),
        "holt_forecast": _holt_sql(),
        "dbscan_embed": _dbscan_sql(),
        # round-9 widening
        "ppr_trade": _ppr_sql(),
        "kcore_trade": _kcore_sql(),
        "sssp_trade": _sssp_sql(),
        "clustering_coeff": _CLUSTERING_COEFF_SQL,
        "hw_forecast": _hw_sql(),
        "linkpred_parts": _LINKPRED_SQL,
        "seasonal_decomp": _SEASONAL_DECOMP_SQL,
        "core_numbers_trade": _core_numbers_sql(),
        "lpa_communities": _lpa_sql(),
        "acf_events": _ACF_SQL_TMPL.format(
            max_lag=_ACF_MAX_LAG,
            q_acf=_quantize_sql(
                "(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                " / sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
                " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))",
                6,
            ),
        ),
        "mad_events": _MAD_SQL_TMPL.format(
            k_num=7,
            k_den=2,
            q_score=_quantize_sql(
                "CAST(2 AS DOUBLE) * CAST(d.dev2 AS DOUBLE)"
                " / CAST(m.mad4 AS DOUBLE)",
                6,
            ),
        ),
        "ccf_events": _CCF_SQL_TMPL.format(
            max_lag=_CCF_MAX_LAG,
            q_ccf=_quantize_sql(
                "(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                " / sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
                " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))",
                6,
            ),
        ),
        "transitivity_trade": _TRANSITIVITY_SQL,
        "benford_prices": _benford_sql(),
        "pq_codes": _pq_codes_sql(),
        "rp_project": _rp_project_sql(),
        "url_canonical": _url_canonical_sql(),
        "domain_cap_sample": _domain_cap_sql(),
        # Iterative k-means, replayable since round 4: tol=0.0 pins
        # the iteration count and quantize=6 rounds each centroid
        # update above fold-order jitter, so the Lloyd loop unrolls
        # into exact CTEs (_kmeans_cte_chain):
        "kmeans_clusters": _kmeans_clusters_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "classifier_quality": _classifier_quality_sql(),
        "pack_firstfit": _pack_firstfit_sql(),
        "bpe_train": _bpe_train_sql(),
        "bpe_encode": _bpe_encode_sql(),
        # ------------------------------------------------------------------
        # Deliberately rows-only — non-SQL-expressible for a stated
        # reason (the driver records a weaker rows-only check):
        # * approx_profile_events / hll_rollup: HyperLogLog sketches.
        #   Spark's HLL++ register layout and DuckDB's approx_count_
        #   distinct are different sketch implementations; their
        #   estimates differ by design, so no value-hash twin can
        #   exist. They are NOT unchecked, though: ``bounded_oracle()``
        #   gives each an exact-computation DuckDB twin with numeric
        #   tolerances (counts exact, sketch estimates within the
        #   published error bound, percentile values inside a ±2% rank
        #   window) which scripts/selfcheck.py enforces as PASS(bound).
        #   Exact twins (profile_events, ndv_rollup-style exact
        #   counts) are oracle-checked above.
        # (bpe_train / bpe_encode graduated to full hash oracles in
        # rounds 4-5 — the merge loop unrolls into CTEs and the encode
        # loop is a recursive CTE — so the sketches are the only
        # remaining rows-only entries.)
    }


def bounded_oracle() -> dict[str, dict]:
    """Numeric-tolerance twins for the sketch queries ``oracle_sql()``
    cannot hash-match (different HLL implementations across engines).

    Each spec: ``sql`` computes the EXACT quantities in DuckDB;
    ``keys`` joins Spark rows to oracle rows 1:1; ``exact`` pairs must
    be equal; ``rel`` triples (spark_col, oracle_col, tol) must agree
    within relative tolerance; ``array_between`` bounds each element
    of a Spark array column inside [lo_i, hi_i] oracle columns.
    Tolerances are the published sketch guarantees at 3 sigma:
    HLL++ rsd=0.05 -> 15%; Datasketches lg_k=12 (rsd ~1.6%) -> 5%;
    percentile_approx accuracy=10000 -> well inside a +/-2% rank
    window (bounds via quantile_disc so both sides are data values).
    """
    pct_bounds = ", ".join(
        f"quantile_disc(value, {max(p - 0.02, 0.0)}) AS p{int(p * 100)}_lo, "
        f"quantile_disc(value, {min(p + 0.02, 1.0)}) AS p{int(p * 100)}_hi"
        for p in (0.5, 0.95, 0.99)
    )
    return {
        "approx_profile_events": {
            "sql": f"""
SELECT event_type, count(*) AS n_rows_exact,
       count(DISTINCT user_id) AS distinct_exact,
       {pct_bounds}
FROM events GROUP BY event_type
""",
            "keys": ["event_type"],
            "exact": [("n_rows", "n_rows_exact")],
            "rel": [("approx_distinct", "distinct_exact", 0.15)],
            "array_between": [
                (
                    "value_percentiles",
                    [
                        ("p50_lo", "p50_hi"),
                        ("p95_lo", "p95_hi"),
                        ("p99_lo", "p99_hi"),
                    ],
                )
            ],
        },
        "hll_rollup": {
            "sql": """
SELECT event_type AS "group", count(*) AS n_rows_exact,
       count(DISTINCT user_id) AS distinct_exact
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__', count(*), count(DISTINCT user_id) FROM events
""",
            "keys": ["group"],
            "exact": [("n_rows", "n_rows_exact")],
            "rel": [("approx_distinct", "distinct_exact", 0.05)],
        },
    }
