"""Generate an alternative-seed clone of the driver's synthetic tables.

The driver's testdata is deterministic (seed=42); the oracle suite
passing there does not prove engine-parity holds on OTHER data — the
round-3 `readability` bug (a .xx5-exact double where Spark and DuckDB
round differently) only manifested at two of the three scales. This
generator rebuilds the same schemas and value distributions under any
seed so `scripts/selfcheck.py` can be fuzzed:

    python scripts/fuzzdata.py /tmp/fuzz1 --seed 1337 [--scale 1.0]
    python scripts/selfcheck.py /tmp/fuzz1

A failure here is either (a) a genuine cross-engine divergence — fix
the operator/oracle pair — or (b) a query that assumes a PLANTED
property of the driver data (document it in the query's docstring).
"""

from __future__ import annotations

import argparse
import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "MACHINERY", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
COLORS = ["red", "blue", "green", "small", "large", "shiny"]
NOUNS = ["widget", "bolt", "ring", "gear", "plate", "wire"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
WORDS = (
    "the a spark table query value key row line part order customer data "
    "column window sort group join merge filter scan agg hash batch stream "
    "fast slow big small"
).split()


def _ts(rng, lo: dt.datetime, hi: dt.datetime, n: int) -> list[dt.datetime]:
    span = int((hi - lo).total_seconds())
    return [lo + dt.timedelta(seconds=int(s)) for s in rng.integers(0, span, n)]


def generate(out: str, seed: int, scale: float = 1.0) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def write(name: str, cols: dict) -> None:
        pq.write_table(pa.table(cols), f"{out}/{name}.parquet")

    write("region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    write("nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array((rng.integers(0, 5, 25)).tolist(), pa.int32()),
    })

    n_cust = max(int(1500 * scale), 1)
    write("customer", {
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).tolist(), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    })

    n_supp = max(int(100 * scale), 1)
    write("supplier", {
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).tolist(), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    })

    n_part = max(int(2000 * scale), 1)
    write("part", {
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [
            f"{COLORS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, len(COLORS), n_part),
                            rng.integers(0, len(NOUNS), n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part).tolist(), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    })

    n_ord = max(int(15000 * scale), 1)
    odates = _ts(rng, dt.datetime(1995, 1, 1), dt.datetime(2001, 8, 1), n_ord)
    odates = [d.replace(hour=0, minute=0, second=0) for d in odates]
    write("orders", {
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord).tolist(), pa.int64()),
        "o_orderstatus": [["O", "F", "P"][i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    })

    n_li = max(int(60000 * scale), 1)
    okeys = rng.integers(1, n_ord + 1, n_li)
    sdates = _ts(rng, dt.datetime(1995, 1, 2), dt.datetime(2001, 11, 4), n_li)
    sdates = [d.replace(hour=0, minute=0, second=0) for d in sdates]
    write("lineitem", {
        "l_orderkey": pa.array(np.sort(okeys).tolist(), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li).tolist(), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li).tolist(), pa.int64()),
        "l_linenumber": pa.array((rng.integers(1, 8, n_li)).tolist(), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    })

    n_ev = max(int(10000 * scale), 1)
    ets = sorted(_ts(rng, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31), n_ev))
    write("events", {
        "event_id": pa.array(range(1, n_ev + 1), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 500, n_ev).tolist(), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.01, 500.0, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    })

    n_doc = max(int(500 * scale), 1)
    texts = []
    for _ in range(n_doc):
        n_words = int(rng.integers(10, 100))
        texts.append(" ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n_words)))
    write("documents", {
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{int(i)}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    n_vec = max(int(500 * scale), 1)
    labels = rng.integers(0, 10, n_vec)
    base = rng.normal(0, 1, (10, 64))
    vecs = (base[labels] + rng.normal(0, 0.8, (n_vec, 64))).astype(np.float32)
    write("embeddings", {
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.tolist(), pa.int32()),
    })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--scale", type=float, default=1.0)
    a = ap.parse_args()
    generate(a.out, a.seed, a.scale)
    print(f"wrote fuzz tables to {a.out} (seed={a.seed}, scale={a.scale})")
