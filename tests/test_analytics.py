"""Funnel ordering and cohort-week semantics on hand-built events."""

from __future__ import annotations

import datetime as dt

from big_data_in_agriculture_spark.operators.analytics import (
    funnel_conversion,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_funnel_requires_order(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    ev = _ev(spark, [
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),  # full
        (2, "view", t(1)), (2, "purchase", t(2)),                      # skips click
        (3, "purchase", t(1)), (3, "view", t(2)), (3, "click", t(3)),  # purchase too early
        (4, "click", t(1)),                                            # never viewed
    ])
    row = funnel_conversion(ev, ["view", "click", "purchase"]).collect()[0]
    assert (row["n_step1"], row["n_step2"], row["n_step3"]) == (3, 2, 1)


def test_funnel_same_timestamp_counts(spark):
    # ts >= prev: simultaneous step events advance the funnel
    t0 = dt.datetime(2024, 1, 1)
    ev = _ev(spark, [(1, "view", t0), (1, "click", t0)])
    row = funnel_conversion(ev, ["view", "click"]).collect()[0]
    assert (row["n_step1"], row["n_step2"]) == (1, 1)


def test_retention_week_boundaries(spark):
    mon = dt.datetime(2024, 1, 1)  # a Monday
    ev = _ev(spark, [
        (1, "view", mon),
        (1, "view", mon + dt.timedelta(days=6)),   # same ISO week → week 0
        (1, "view", mon + dt.timedelta(days=7)),   # next week → week 1
        (2, "view", mon + dt.timedelta(days=9)),   # own cohort, week 0
    ])
    cells = {(r["cohort_week"].day, r["week_n"]): r["n_users"]
             for r in retention_cohorts(ev).collect()}
    assert cells == {(1, 0): 1, (1, 1): 1, (8, 0): 1}


def test_cumulative_unique_users_counts_first_seen_once(spark):
    import datetime as dt

    from big_data_in_agriculture_spark.operators.analytics import (
        cumulative_unique_users,
    )

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)
    ev = spark.createDataFrame(
        [
            ("view", 1, d(1)), ("view", 1, d(2)),   # returning user: no new count
            ("view", 2, d(2)), ("view", 3, d(2)),
            ("click", 1, d(3)),                      # new to the click segment
        ],
        ["event_type", "user_id", "ts"],
    )
    out = {(r["segment"], r["day"].day): (r["new_users"], r["cum_users"])
           for r in cumulative_unique_users(ev).collect()}
    assert out == {
        ("view", 1): (1, 1),
        ("view", 2): (2, 3),
        ("click", 3): (1, 1),
    }


def test_debounce_chained_burst_keeps_only_opener(spark):
    import datetime as dt

    from big_data_in_agriculture_spark.operators.analytics import debounce_events

    s = lambda sec: dt.datetime(2024, 1, 1, 0, 0, sec)
    ev = spark.createDataFrame(
        [
            # chained burst: 0s,30s,55s(+25),100s(+45) — every gap < 60
            (1, s(0), 1, "click"), (2, s(30), 1, "click"),
            (3, s(55), 1, "click"), (4, dt.datetime(2024, 1, 1, 0, 1, 40), 1, "click"),
            # fresh burst 60s after the last event
            (5, dt.datetime(2024, 1, 1, 0, 2, 40), 1, "click"),
            # other type is independent
            (6, s(10), 1, "view"),
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )
    kept = sorted(r["event_id"]
                  for r in debounce_events(ev, gap_seconds=60).collect())
    # burst 1-4 collapses to opener 1 even though 1->4 spans 100s > 60s
    assert kept == [1, 5, 6]


class TestTrendingItems:
    def test_topk_per_window_with_ties(self, spark):
        import datetime as dt

        from big_data_in_agriculture_spark.operators.analytics import (
            trending_items,
        )

        t0 = dt.datetime(2024, 3, 1, 0, 30)
        rows = (
            [(t0, "a")] * 3 + [(t0, "b")] * 3 + [(t0, "c")] * 1
        )
        df = spark.createDataFrame(rows, ["ts", "event_type"])
        out = trending_items(df, "2 hours", "1 hour", top_k=2).collect()
        # every event in 2 windows; per window: a,b tie at 3 → item order
        by_win = {}
        for r in out:
            by_win.setdefault(r["window_start"], []).append(
                (r["rank"], r["item"], r["n_events"])
            )
        assert len(by_win) == 2
        for ranked in by_win.values():
            assert ranked == [(1, "a", 3), (2, "b", 3)]  # c cut by top-k
