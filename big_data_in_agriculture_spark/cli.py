"""CLI driver (reference C11/C12/D4): aggregate / load / query subcommands.

Mirrors the reference entry points (``dask_jobs/aggregate_hourly.py:
128-168``, ``aggregate_daily.py``, the loader flows) as one argparse
program over the Spark engine. CSV list args (``--regions a,b``,
``--months 1,2``) follow the reference's parsing convention (C12).

Usage examples::

    python -m big_data_in_agriculture_spark.cli aggregate-hourly \
        --raw-root data/raw --out data/marts/hourly --regions r1,r2
    python -m big_data_in_agriculture_spark.cli aggregate-daily \
        --hourly data/marts/hourly --out data/marts/daily
    python -m big_data_in_agriculture_spark.cli load \
        --source data/marts/daily --target warehouse/daily --key region,day
    python -m big_data_in_agriculture_spark.cli query \
        --mart warehouse/daily --regions r1 --start 2022-01-01 --end 2022-01-31
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def _csv(s: str) -> list[str]:
    """C12: ``"a,b,c"`` → ``["a","b","c"]`` (empty string → empty list)."""
    return [p.strip() for p in s.split(",") if p.strip()]


def _csv_int(s: str) -> list[int]:
    return [int(p) for p in _csv(s)]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="big-data-in-agriculture-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    h = sub.add_parser("aggregate-hourly", help="raw grid → hourly mart (A1/C1-C3/K1)")
    h.add_argument("--raw-root", required=True)
    h.add_argument("--out", required=True)
    h.add_argument("--regions", type=_csv, default=None)
    h.add_argument("--variables", type=_csv, default=None)

    d = sub.add_parser("aggregate-daily", help="hourly mart → daily mart (A3/K2)")
    d.add_argument("--hourly", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--regions", type=_csv, default=None)
    d.add_argument("--months", type=_csv_int, default=None)

    ld = sub.add_parser("load", help="keyed upsert into a warehouse table (K4)")
    ld.add_argument("--source", required=True)
    ld.add_argument("--target", required=True)
    ld.add_argument("--key", type=_csv, required=True)

    q = sub.add_parser("query", help="serving filter query over a mart (F2/F3/O2)")
    q.add_argument("--mart", required=True)
    q.add_argument("--regions", type=_csv, required=True)
    q.add_argument("--start", required=True)
    q.add_argument("--end", required=True)
    q.add_argument("--limit", type=int, default=20)

    c = sub.add_parser(
        "curate", help="corpus curation: sample → quality gate → dedup → split"
    )
    c.add_argument("--docs", required=True, help="documents parquet path")
    c.add_argument("--out", required=True, help="curated output directory")
    c.add_argument("--rates", type=_csv, default=None,
                   help="per-lang sample rates, e.g. en=0.5,de=1.0")
    c.add_argument("--test-buckets", type=int, default=1)

    e = sub.add_parser(
        "export-shards",
        help="token-balanced training-shard export with manifest",
    )
    e.add_argument("--docs", required=True, help="documents parquet path")
    e.add_argument("--out", required=True, help="shard output directory")
    e.add_argument("--tokens-per-shard", type=int, default=100_000)

    s = sub.add_parser("search", help="BM25 keyword search over a corpus")
    s.add_argument("--docs", required=True, help="documents parquet path")
    s.add_argument("--query", required=True, help="space-separated terms")
    s.add_argument("--top-k", type=int, default=10)

    pr = sub.add_parser("profile", help="one-pass table profile + FK audit")
    pr.add_argument("--table", required=True, help="parquet path to profile")
    pr.add_argument("--fk", default=None,
                    help="referential audit: childcol=parentpath:parentcol")

    pub = sub.add_parser("publish", help="publish a versioned snapshot")
    pub.add_argument("--source", required=True, help="parquet input path")
    pub.add_argument("--root", required=True, help="versioned dataset root")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .session import get_spark

    spark = spark or get_spark("cli")

    if args.cmd == "aggregate-hourly":
        from .operators.hourly import spatial_mean_hourly
        from .sources.marts import write_hourly_mart
        from .sources.netcdf import read_raw_grid

        grid = read_raw_grid(spark, args.raw_root, variables=args.variables)
        if args.regions:
            from pyspark.sql import functions as F

            grid = grid.filter(F.col("region").isin(args.regions))
        hourly = spatial_mean_hourly(grid, variables=args.variables)
        write_hourly_mart(hourly, args.out)
        print(f"wrote hourly mart to {args.out}")
    elif args.cmd == "aggregate-daily":
        from .operators.daily import daily_rollup
        from .sources.marts import read_mart, write_daily_mart

        hourly = read_mart(spark, args.hourly, regions=args.regions)
        daily = daily_rollup(hourly)
        if args.months:
            from pyspark.sql import functions as F

            daily = daily.filter(F.month("day").isin(args.months))
        write_daily_mart(daily, args.out)
        print(f"wrote daily mart to {args.out}")
    elif args.cmd == "load":
        from .sources.upsert import upsert_parquet

        incoming = spark.read.parquet(args.source)
        n = upsert_parquet(spark, incoming, args.target, args.key)
        print(f"upserted into {args.target}: {n} rows total")
    elif args.cmd == "query":
        from .operators.serve import filter_daily

        mart = spark.read.parquet(args.mart)
        out = filter_daily(mart, args.regions, args.start, args.end)
        for row in out.limit(args.limit).collect():
            print(row.asDict())
    elif args.cmd == "curate":
        from pyspark.sql import functions as F

        from .operators import llm

        docs = spark.read.parquet(args.docs)
        if args.rates:
            rates = {
                k: float(v)
                for k, v in (pair.split("=", 1) for pair in args.rates)
            }
            docs = llm.stratified_sample(docs, rates)
        gated = (
            llm.quality_filter(docs)
            .filter(F.col("keep") == 1)
            .select("doc_id")
            .join(docs, "doc_id")
        )
        curated = llm.hash_split(
            llm.dedup_keep_best(gated), test_buckets=args.test_buckets
        )
        curated.write.mode("overwrite").partitionBy("split").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"wrote curated corpus to {args.out}: {n} docs")
    elif args.cmd == "search":
        from .operators.llm import bm25_search

        docs = spark.read.parquet(args.docs)
        for row in bm25_search(docs, args.query, top_k=args.top_k).collect():
            print(row.asDict())
    elif args.cmd == "profile":
        from .operators.profile import profile_table, referential_check

        table = spark.read.parquet(args.table)
        for row in profile_table(table).collect():
            print(row.asDict())
        if args.fk:
            child_col, rest = args.fk.split("=", 1)
            parent_path, parent_col = rest.rsplit(":", 1)
            orphans = referential_check(
                table, spark.read.parquet(parent_path), child_col, parent_col
            )
            n = orphans.limit(1).count()
            print(f"referential check {args.fk}: "
                  f"{'VIOLATED' if n else 'ok'}")
    elif args.cmd == "publish":
        from .sources.versioned import write_version

        v = write_version(spark.read.parquet(args.source), args.root)
        print(f"published version {v} under {args.root}")
    elif args.cmd == "export-shards":
        from .sources.shards import export_training_shards

        docs = spark.read.parquet(args.docs)
        manifest = export_training_shards(
            docs, args.out, tokens_per_shard=args.tokens_per_shard
        )
        rows = manifest.collect()
        toks = sum(r["n_tokens"] for r in rows)
        print(
            f"wrote {len(rows)} shards to {args.out}: "
            f"{sum(r['n_docs'] for r in rows)} docs, {toks} tokens"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
