"""Event analytics: retention cohorts, funnel conversion.

The standard product-analytics workloads over an event stream — heavy
count-distinct shuffles at scale, so the shapes matter:

* retention: ONE aggregate for per-user cohort assignment (tiny
  output: one row per user), re-joined to the fact, then one
  count-distinct aggregate per (cohort, period) cell;
* funnel: staged conditional minimums — each stage is a groupBy over
  the fact with the previous stage's timestamp joined in, so an
  N-step funnel costs N scans of the (pruned) fact and N user-keyed
  shuffles, never a per-user UDF or a collected event list.

At 100 TB the user-keyed aggregates dominate; both operators keep the
shuffled payload to (user, timestamp) pairs — events project down to
the 3 used columns at the scan (column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Cohort retention matrix: users active N weeks after first seen.

    cohort_week = the ISO week of the user's first event; week_n = full
    weeks between that and each event's week. Cells are distinct-user
    counts — the shuffle carries (cohort, week_n, user) once per
    distinct triple thanks to partial aggregation.
    """
    week = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    return (
        events.join(first, user_col)
        .withColumn(
            "week_n",
            F.floor(
                F.datediff(week, F.col("cohort_week")) / F.lit(7)
            ).cast("long"),
        )
        .filter(F.col("week_n") < max_weeks)
        .groupBy("cohort_week", "week_n")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .orderBy("cohort_week", "week_n")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix between consecutive events.

    For each user's time-ordered stream, count (previous event type →
    this event type) bigrams and the within-source probability. One
    window shuffle keyed on user (uniform — no hot key) carrying only
    the 4 used columns, then a hash aggregate on the (from, to) pair,
    whose distinct-value space is |types|² regardless of data size.
    Ties on ts are broken by the unique event id so the sequence — and
    therefore the counts — is engine-deterministic.

    p_transition is n / row-count-per-from_type: an exact integer
    ratio in double, deterministic across engines.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pw = Window.partitionBy("from_type")
    return (
        events.select(user_col, type_col, ts_col, id_col)
        .withColumn("from_type", F.lag(type_col).over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p_transition",
            F.col("n").cast("double") / F.sum("n").over(pw),
        )
        .orderBy("from_type", "to_type")
    )


def ab_test_summary(
    df: DataFrame,
    variant: Column,
    value_col: str = "value",
) -> DataFrame:
    """Two-variant experiment readout with a Welch t statistic.

    ``variant`` is any boolean Column (True = treatment). Both arms'
    count/mean/variance come from conditional aggregates in ONE scan —
    no split-and-union, no second pass — and the t statistic
    (mean difference over pooled standard error) is driver-free
    arithmetic on the single stats row. The decision threshold belongs
    to the caller; this emits the evidence.
    """
    # NaN measurements are excluded like NULL (a single NaN would
    # poison both arms' means/variances; oracle carries NOT isnan)
    df = df.filter(~F.isnan(F.col(value_col).cast("double")))
    a_val = F.when(variant, F.col(value_col))
    b_val = F.when(~variant, F.col(value_col))
    row = df.agg(
        F.count(a_val).alias("n_a"),
        F.count(b_val).alias("n_b"),
        F.avg(a_val).alias("_ma"),
        F.avg(b_val).alias("_mb"),
        F.var_samp(a_val).alias("_va"),
        F.var_samp(b_val).alias("_vb"),
    )
    se = F.sqrt(F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b"))
    return row.select(
        "n_a",
        "n_b",
        F.col("_ma").cast("float").alias("mean_a"),
        F.col("_mb").cast("float").alias("mean_b"),
        (F.col("_ma") - F.col("_mb")).cast("float").alias("mean_diff"),
        ((F.col("_ma") - F.col("_mb")) / se).cast("float").alias("t_stat"),
    )


def debounce_events(
    events: DataFrame,
    gap_seconds: int = 60,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Drop rapid repeats: keep the FIRST event of each burst.

    The batch twin of streaming `dropDuplicatesWithinWatermark`:
    within a (user, type) stream, consecutive events closer than
    `gap_seconds` collapse into one burst and only the burst opener
    survives. Burst membership is the lag-gap trick (new burst when
    the gap exceeds the threshold); CHAINED repeats collapse into one
    burst even when the first→last span exceeds the gap — the
    debounce semantic, distinct from a fixed-window dedup. One window
    shuffle on (user, type); ties on ts break by the unique event id.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(ts_col, id_col)
    # exact integer microseconds (unix_micros / epoch_us) — a float
    # epoch would make the threshold comparison engine-dependent for
    # sub-second components
    mic = F.unix_micros(F.col(ts_col))
    gap = mic - F.lag(mic).over(w)
    return (
        events.withColumn("_gap", gap)
        .filter(
            F.col("_gap").isNull()
            | (F.col("_gap") >= gap_seconds * 1_000_000)
        )
        .drop("_gap")
    )


def cumulative_unique_users(
    events: DataFrame,
    segment_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Growth curve: distinct users ever seen, per (segment, day).

    ``count(DISTINCT x) OVER (ORDER BY day)`` doesn't exist in Spark
    (or scale anywhere — the state is the full user set); the
    equivalent that does: each user contributes on exactly their
    FIRST-seen day in the segment (one per-(segment,user) aggregate),
    days collapse to new-user counts (tiny), and a running sum over
    that per-day frame gives the cumulative curve. Shuffles: one
    user-keyed agg on the fact + one day-keyed agg on the (already
    small) output; the window runs over |segments|×|days| rows,
    partitioned by segment.

    Emits (segment, day, new_users, cum_users).
    """
    # events without a timestamp can't place a user on a day; dropped
    # (oracle: IS NOT NULL)
    events = events.filter(F.col(ts_col).isNotNull())
    first_seen = events.groupBy(
        F.col(segment_col).alias("segment"), F.col(user_col)
    ).agg(F.date_trunc("day", F.min(ts_col)).alias("day"))
    per_day = first_seen.groupBy("segment", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_day.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("segment", "day")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel counts: users reaching step k AFTER step k−1.

    Stage k's timestamp is the user's earliest step-k event at or
    after their stage-(k−1) timestamp — the strict sequencing that
    separates a funnel from k independent filters. One row out:
    n_step_1..n (monotone non-increasing).
    """
    relevant = events.filter(F.col(type_col).isin(steps)).select(
        user_col, type_col, ts_col
    )
    stage = relevant.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias("t1")
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"t{k - 1}"
        stage = (
            relevant.join(stage, user_col)
            .groupBy(user_col)
            .agg(
                *[F.first(f"t{i}").alias(f"t{i}") for i in range(1, k)],
                F.min(
                    F.when(
                        (F.col(type_col) == step)
                        & (F.col(ts_col) >= F.col(prev)),
                        F.col(ts_col),
                    )
                ).alias(f"t{k}"),
            )
        )
    return stage.agg(
        *[
            F.count(f"t{k}").alias(f"n_step{k}")
            for k in range(1, len(steps) + 1)
        ]
    )


def trending_items(
    events: DataFrame,
    window: str = "6 hours",
    slide: str = "2 hours",
    top_k: int = 3,
    item_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Top-k items per sliding window — the trending-now query.

    Counts per (window, item) come from ONE aggregate over the
    window-replicated rows (replication factor window/slide, same knob
    as sliding_rollup); the per-window top-k is a rank window
    partitioned by window start — thousands of independent small
    partitions, no global sort. Epoch-aligned bounds keep the SQL twin
    exact; counts are integers so ranking is engine-deterministic with
    the item tie-break.
    """
    w = F.window(F.col(ts_col), window, slide)
    counts = events.groupBy(
        w.alias("win"), F.col(item_col).alias("item")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    rk = Window.partitionBy("win").orderBy(
        F.col("n_events").desc(), F.col("item")
    )
    return (
        counts.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("win.start").alias("window_start"),
            "item",
            "n_events",
            "rank",
        )
        .orderBy("window_start", "rank")
    )
