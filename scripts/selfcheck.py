"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf tables, then compares row count, sorted
column names, and an order-insensitive value hash (rows rendered to
canonical strings, sorted, sha256'd) — the same shape of check the
driver records in CORRECTNESS_r{N}.json. Queries without an
``oracle_sql()`` twin but with a ``bounded_oracle()`` spec (the HLL
sketch queries, whose estimates legitimately differ across engines)
get a numeric-tolerance check instead: exact counts must match, sketch
estimates must sit within the published error bound, percentiles
inside a rank window — reported as PASS(bound)/FAIL(bound).

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        parts = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(repr(v))
            elif hasattr(v, "tolist"):  # numpy scalar/array
                parts.append(repr(v.tolist()))
            else:
                parts.append(repr(v))
        rows.append("|".join(parts))
    rows.sort()
    digest = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), cols, digest


def check_bounded(sdf: pd.DataFrame, odf: pd.DataFrame, spec: dict) -> list[str]:
    """Apply a ``bounded_oracle()`` spec; return failure descriptions."""
    errs: list[str] = []
    merged = sdf.merge(odf, on=spec["keys"], how="outer", indicator=True)
    if (merged["_merge"] != "both").any():
        missing = merged.loc[merged["_merge"] != "both", spec["keys"]]
        return [f"key mismatch: {missing.to_dict('records')}"]
    for scol, ocol in spec.get("exact", []):
        bad = merged[merged[scol] != merged[ocol]]
        if len(bad):
            errs.append(f"{scol} != {ocol} on {len(bad)} rows")
    for scol, ocol, tol in spec.get("rel", []):
        rel = (merged[scol] - merged[ocol]).abs() / merged[ocol].clip(lower=1)
        bad = merged[rel > tol]
        if len(bad):
            errs.append(
                f"{scol} off {ocol} by >{tol:.0%} on {len(bad)} rows "
                f"(worst {rel.max():.1%})"
            )
    for acol, windows in spec.get("array_between", []):
        for i, (lo, hi) in enumerate(windows):
            vals = merged[acol].map(lambda a: a[i])
            bad = merged[(vals < merged[lo]) | (vals > merged[hi])]
            if len(bad):
                errs.append(f"{acol}[{i}] outside [{lo},{hi}] on {len(bad)} rows")
    return errs


def reclaim(spark) -> None:
    """Drop blocks left behind by the previous query's pins.

    Operators pin reused/iterative frames with localCheckpoint or
    persist; those blocks are freed only when the ContextCleaner sees
    their RDDs garbage-collected on the driver. A 200+-query sweep in
    ONE session otherwise accumulates every query's pinned blocks —
    measured: the full sf0.1 sweep OOM'd mid-run once the round-10
    rotation moved the iterative graph queries (a dozen eager
    checkpoints each) ahead of the heavy LLM queries. One Python GC +
    one JVM GC per query lets the cleaner reclaim everything a real
    long-lived cluster session would reclaim on its own cadence."""
    import gc

    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from big_data_in_agriculture_spark.session import get_spark

    # 6g heap: local[32] shares ONE JVM across all 32 task threads —
    # Spark's 1g default dies in spill-read buffers on the heavier
    # queries at sf0.1 (measured: edit_linkage OOM in a fresh 1g
    # session); a real cluster gives each executor core GBs. The
    # driver GATE runs sf0.01 with its own session; this conf only
    # governs the in-repo sweeps.
    spark = get_spark(
        "selfcheck", shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bounded = getattr(entrymod, "bounded_oracle", dict)()
    n_pass = n_fail = n_rowsonly = n_bound = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        reclaim(spark)  # free the previous query's pinned blocks
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            spec = bounded.get(name)
            if spec is None:
                print(f"rows-only  {name}: {len(sdf)} rows  ({el:.1f}s)")
                n_rowsonly += 1
                continue
            try:
                odf = con.execute(spec["sql"]).fetchdf()
                errs = check_bounded(sdf, odf, spec)
            except Exception:
                print(f"FAIL(bound)  {name}: bounded oracle raised")
                traceback.print_exc()
                n_fail += 1
                continue
            if errs:
                print(f"FAIL(bound)  {name}: " + "; ".join(errs))
                n_fail += 1
            else:
                print(f"PASS(bound)  {name}: {len(sdf)} rows  ({el:.1f}s)")
                n_bound += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle raised")
            traceback.print_exc()
            n_fail += 1
            continue
        # normalize dtypes the way arrow round-trips do: float32 stays
        # float32; compare canonical string renderings
        sn, scols, shash = canon(sdf)
        on, ocols, ohash = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL  {name}: rows spark={sn} oracle={on}")
            n_fail += 1
        elif shash != ohash:
            print(f"FAIL  {name}: hash mismatch ({sn} rows)")
            merged = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
            omerged = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
            diff = (merged != omerged) & ~(merged.isna() & omerged.isna())
            bad = diff.any(axis=1)
            print(merged[bad].head(3))
            print(omerged[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS  {name}: {sn} rows  ({el:.1f}s)")
            n_pass += 1
    tail = f", {n_bound} bound" if n_bound else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only{tail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
