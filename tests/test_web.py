"""URL canonicalization, registered-domain extraction, domain caps.

Covers functions/web.py (Column exprs + SQL twins kept in lockstep by
the registry oracle) and operators/web.py (the per-domain cap,
property-checked against an independently built reference window and
plan-pinned to Catalyst's WindowGroupLimit rank-limit pushdown).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.functions import web as W
from big_data_in_agriculture_spark.operators import web as OW

# (input, canonical, registered_domain) — one row per canonicalization
# rule; the cross-engine identity of these cases is separately pinned
# by the url_canonical registry oracle.
CASES = [
    # scheme+host lowercase, default http port dropped, tracking params
    # dropped, survivors sorted
    ("HTTP://Crawl.Example.COM:80/p/5?utm_source=rss&z=9&a=1",
     "http://crawl.example.com/p/5?a=1&z=9", "example.com"),
    # fragment dropped; all-tracking query collapses to no query
    ("https://news.example.co.uk/art-7?fbclid=abc123#top",
     "https://news.example.co.uk/art-7", "example.co.uk"),
    # default https port dropped
    ("https://Blog.Example.com:443/post/3",
     "https://blog.example.com/post/3", "example.com"),
    # non-default port kept; params sorted; utm dropped
    ("http://shop.example.com:8080/item?b=2&a=1&utm_campaign=x",
     "http://shop.example.com:8080/item?a=1&b=2", "example.com"),
    # pathless URL -> '/'; 'ref' tracking param dropped
    ("http://example.io?ref=home", "http://example.io/", "example.io"),
    # sub-subdomain collapses to the registrable pair
    ("https://a.b.example.com/deep/6",
     "https://a.b.example.com/deep/6", "example.com"),
    # multi-label public suffix keeps three labels
    ("https://docs.uni3.ac.uk/d/2?q=1",
     "https://docs.uni3.ac.uk/d/2?q=1", "uni3.ac.uk"),
    # www is NOT special: registrable domain is site9.org
    ("http://www.site9.org/m/55", "http://www.site9.org/m/55",
     "site9.org"),
    # whitespace trimmed
    ("  http://pad.example.com/x  ", "http://pad.example.com/x",
     "example.com"),
    # unparseable rows pass through trimmed, domain ''
    ("not a url", "not a url", ""),
    # empty query string: '?' alone is dropped
    ("http://example.com/a?", "http://example.com/a", "example.com"),
    # case preserved in path and query values
    ("HTTPS://X.Example.org/CaseKept?Key=Val",
     "https://x.example.org/CaseKept?Key=Val", "example.org"),
]


class TestCanonicalization:
    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(CASES)], "i long, url string"
        )
        got = {
            r["i"]: (r["canon"], r["dom"])
            for r in df.select(
                "i",
                W.canonicalize_url("url").alias("canon"),
                W.registered_domain(
                    W.url_host(W.canonicalize_url("url"))
                ).alias("dom"),
            ).collect()
        }
        for i, (url, canon, dom) in enumerate(CASES):
            assert got[i] == (canon, dom), url

    def test_null_in_null_out(self, spark):
        df = spark.createDataFrame([(1, None)], "i long, url string")
        row = df.select(W.canonicalize_url("url").alias("c")).first()
        assert row["c"] is None

    def test_idempotent(self, spark):
        # canonicalizing a canonical URL is a no-op (dedup keys must be
        # stable under re-processing)
        df = spark.createDataFrame(
            [(i, c[1]) for i, c in enumerate(CASES) if c[1] != "not a url"],
            "i long, url string",
        )
        bad = df.filter(
            W.canonicalize_url("url") != F.col("url")
        ).collect()
        assert bad == []

    def test_sql_twin_matches(self, spark):
        # the SQL twin replays every case byte-identically (the
        # registry oracle covers the synthesized corpus; this covers
        # the hand-picked edges)
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame({"url": [c[0] for c in CASES]})
        )
        canon = W.canonicalize_url_sql("url")
        host = (
            f"lower(regexp_extract(regexp_extract(({canon}), "
            f"'{W._sql_quote(W._HOSTPORT_RE)}', 1), '^([^:]{{1,255}})', 1))"
        )
        dom = W.registered_domain_sql(host)
        rows = con.sql(
            f"SELECT {canon} AS canon, {dom} AS dom FROM t"
        ).fetchall()
        for (url, canon_want, dom_want), (canon_got, dom_got) in zip(
            CASES, rows
        ):
            assert canon_got == canon_want, url
            assert dom_got == dom_want, url


class TestDomainCap:
    @pytest.fixture(scope="class")
    def urls(self, spark):
        # skewed corpus: one registered domain holds ~40% of rows
        return spark.range(3000).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 5 < 2,
                F.concat(
                    F.lit("https://crawl.example.com/p/"),
                    F.col("id").cast("string"),
                ),
            )
            .when(
                F.col("id") % 5 == 2,
                F.concat(
                    F.lit("http://www.site"),
                    (F.col("id") % 37).cast("string"),
                    F.lit(".org/m/"),
                    F.col("id").cast("string"),
                ),
            )
            .when(
                F.col("id") % 5 == 3,
                F.concat(
                    F.lit("https://docs.uni"),
                    (F.col("id") % 11).cast("string"),
                    F.lit(".ac.uk/d/"),
                    F.col("id").cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("http://shop.example.co.uk/i/"),
                    F.col("id").cast("string"),
                )
            )
            .alias("url"),
        )

    def _naive(self, urls, cap):
        keyed = OW.with_url_keys(urls).withColumn(
            "_prio", F.md5(F.col("canon_url"))
        )
        w = Window.partitionBy("domain").orderBy("_prio", "doc_id")
        return (
            keyed.withColumn(
                "domain_rank", F.row_number().over(w).cast("int")
            )
            .filter(F.col("domain_rank") <= cap)
            .select("doc_id", "domain", "domain_rank")
        )

    @pytest.mark.parametrize("cap", [5, 1, 50, 7])
    def test_equals_reference_window(self, urls, cap):
        got = OW.domain_cap(urls, cap=cap).select(
            "doc_id", "domain", "domain_rank"
        )
        ref = self._naive(urls, cap)
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0

    def test_cap_enforced_and_deterministic(self, urls):
        out = OW.domain_cap(urls, cap=3)
        per = out.groupBy("domain").count().collect()
        assert per and all(r["count"] <= 3 for r in per)
        a = sorted(map(tuple, out.select("doc_id").collect()))
        b = sorted(map(tuple, out.select("doc_id").collect()))
        assert a == b

    def test_rank_limit_pushed_below_exchange(self, urls):
        # the scale contract: Catalyst's rank-limit pushdown must put a
        # partial WindowGroupLimit BELOW the exchange, so a hot domain
        # ships at most cap rows per map partition instead of every
        # page through one task. domain_cap's single-window design
        # DEPENDS on this rule (the measured alternative — a manual
        # salted pre-pass — costs an extra exchange+sort for the same
        # bound); if a Spark upgrade drops it, this test fails and the
        # salted form in scale_probe.py is the fallback.
        plan = OW.domain_cap(
            urls, cap=5
        )._jdf.queryExecution().executedPlan().toString()
        pre_exchange = plan.split("Exchange hashpartitioning(domain", 1)[1]
        assert "WindowGroupLimit" in pre_exchange, plan

    def test_domain_profile(self, spark):
        df = spark.createDataFrame(
            [
                (1, "http://a.example.com/x?utm_source=1"),
                (2, "http://a.example.com/x"),
                (3, "http://a.example.com/y"),
            ],
            "doc_id long, url string",
        )
        row = OW.domain_profile(df).first()
        assert row["domain"] == "example.com"
        assert row["n_pages"] == 3
        # rows 1 and 2 collapse to one canonical URL
        assert row["n_canon_urls"] == 2


class TestUrlRegexLinearity:
    """Same contract as TestRegexLinearity in test_llm.py: every
    pattern bounded <= 1000 (RE2's max-repeat compile limit) and
    linear on Java's backtracking engine for hostile inputs."""

    def test_bounds_under_re2_limit(self):
        import re

        for pat in (
            W._SCHEME_RE,
            W._HOSTPORT_RE,
            W._PATH_RE,
            W._QUERY_RE,
            W.TRACKING_PARAM_RE,
        ):
            for lo, hi in re.findall(r"\{(\d+),(\d+)\}", pat):
                assert int(hi) <= 1000, pat

    def test_monster_urls_stay_fast(self, spark):
        monster = [
            (1, "http://" + "a" * 500_000),          # unbroken host run
            (2, "http://h/" + "p" * 500_000),        # giant path
            (3, "http://h/x?" + "&" * 500_000),      # param-separator flood
            (4, "x" * 500_000),                      # no scheme at all
        ]
        df = spark.createDataFrame(monster, "i long, url string")
        t0 = time.time()
        rows = df.select(
            F.length(W.canonicalize_url("url")).alias("n")
        ).collect()
        assert time.time() - t0 < 20
        assert all(r["n"] > 0 for r in rows)
