"""Web-crawl curation operators: URL dedup keys and per-domain caps.

Crawl corpora are pathologically domain-skewed — a handful of hosts
contribute double-digit percentages of all pages (link farms, wikis,
e-commerce catalogs). Capping documents per registered domain is a
standard pre-training curation step (the C4/Gopher-style pipelines cap
or downweight dominant sources), and it is exactly the shape that
breaks a naive Spark plan: ``row_number() OVER (PARTITION BY domain)``
puts the hottest domain's entire page set through ONE task.

:func:`domain_cap` keeps the semantics and fixes the plan with a
two-level top-N: a salted local pass bounds every window partition at
``1/salt_buckets`` of the hottest domain, then a global pass ranks only
the ≤ ``salt_buckets × cap`` survivors per domain. The containment
argument is the standard one — the true top-``cap`` rows of a domain
are each in the top-``cap`` of whatever salt bucket they landed in, so
pass 1 never discards a final survivor.

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
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain.

    Selection is deterministic and engine-replayable: documents are
    ranked by ``(md5(canon_url), id)`` — an order-free pseudo-random
    priority, so the kept set is a uniform sample of the domain's
    pages rather than "whatever sorted first", and independent of
    partitioning. Output = input columns + ``canon_url``, ``domain``,
    ``domain_rank`` (1..cap), filtered to the kept rows.

    Scale shape: TWO window passes instead of one.

    1. local: ``row_number`` over ``(domain, salt)`` where salt =
       md5-derived from the priority key, ``salt_buckets`` values —
       the hottest domain's window partition shrinks by the bucket
       count, and every discarded row dies before the second shuffle;
    2. global: ``row_number`` over ``domain`` on the survivors —
       ≤ ``salt_buckets × cap`` rows per domain by construction,
       bounded work no matter how hot the domain.

    The oracle form is the naive single window; results are identical
    (containment: each true top-``cap`` row is in its bucket's local
    top-``cap``), which ``tests/test_web.py`` property-checks.
    """
    keyed = with_url_keys(df, url_col).withColumn(
        "_prio", F.md5(F.col("canon_url"))
    )
    salt = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % salt_buckets
    )
    order = [F.col("_prio"), F.col(id_col)]
    local = Window.partitionBy("domain", "_salt").orderBy(*order)
    survivors = (
        keyed.withColumn("_salt", salt)
        .withColumn("_lrank", F.row_number().over(local))
        .filter(F.col("_lrank") <= cap)
        .drop("_lrank", "_salt")
    )
    final = Window.partitionBy("domain").orderBy(*order)
    return (
        survivors.withColumn(
            "domain_rank", F.row_number().over(final).cast("int")
        )
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
