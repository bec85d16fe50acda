"""Snapshot two-engine hashes for the prefix-displaced queries.

The external driver's correctness gate records only the FIRST 50
``queries()`` entries; the rounds-3/5/6 rotations displaced 18 queries
out of that prefix, leaving their verification to in-repo pytest —
which the same codebase controls. This script closes that gap by
recording, for every DISPLACED query, the Spark result hash AND the
DuckDB oracle hash side by side in ``DISPLACED_VERIFY.json`` at the
repo root. The artifact is committed, so an external auditor can (a)
see that the two independently-computed hashes agree per query, and
(b) re-run this script against the same sf dir and diff the file —
regressions in displaced queries become externally visible without
occupying driver-prefix slots.

Usage: python scripts/displaced_verify.py [sf_dir] (default sf0.01)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import duckdb

    import __spark_entry__ as entry
    from big_data_in_agriculture_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "_selfcheck", os.path.join(repo, "scripts", "selfcheck.py")
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    spec2 = importlib.util.spec_from_file_location(
        "_registry_pins", os.path.join(repo, "tests", "test_registry.py")
    )
    # tests/test_registry.py imports __spark_entry__ at module scope;
    # repo is on sys.path already, so exec is safe here
    pins = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(pins)

    spark = get_spark(
        "displaced-verify",
        extra_conf={"spark.driver.memory": "6g"},  # selfcheck.py note
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    out: dict[str, dict] = {}
    ok = True
    for name in pins.DISPLACED:
        sc.reclaim(spark)  # free the previous query's pinned blocks
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        sn, scols, shash = sc.canon(sdf)
        on, ocols, ohash = sc.canon(odf)
        match = (sn == on) and (scols == ocols) and (shash == ohash)
        ok = ok and match
        out[name] = {
            "spark_rows": sn,
            "oracle_rows": on,
            "spark_hash": shash,
            "oracle_hash": ohash,
            "hash_match": match,
        }
        print(f"{'PASS' if match else 'FAIL'}  {name}: {sn} rows {shash}")

    payload = {"sf_dir": sf_dir, "queries": out}
    with open(os.path.join(repo, "DISPLACED_VERIFY.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{'OK' if ok else 'MISMATCH'}: wrote DISPLACED_VERIFY.json "
          f"({len(out)} queries)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
