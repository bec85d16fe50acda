"""Adversarial-VALUES clone of a testdata dir (vs fuzzdata's seeds).

fuzzdata.py varies seeds and row counts but keeps the generator's
benign distributions; this script clones an existing sf dir and
appends the hostile rows a real 100 TB corpus certainly contains:

- documents: empty text, a single-token doc, an all-same-token doc,
  a non-ASCII doc (the unicode case-map trap), a one-character doc
- events: a burst of CONSTANT-value events for one type (zero MAD,
  zero variance, zero-width histograms) plus a zero-value event
- embeddings: a zero-magnitude vector and a constant vector (cosine
  0/0 and norm edge cases)

Round-5 finds from this corpus: ANSI DIVIDE_BY_ZERO in every
cosine-dividing operator on the zero vector; Java-vs-DuckDB unicode
case maps disagreeing on eszett (upper('straße') = 'STRASSE' only in
Java; DuckDB keeps the sharp s),
which broke dedup_keep_best's planted-variant parity.

Usage:
    python scripts/advdata.py /tmp/fuzz_adv [--src /root/testdata/sf0.001]
    python scripts/advdata.py /tmp/fuzz_empty --empty   # all tables empty
    python scripts/selfcheck.py /tmp/fuzz_adv
"""

from __future__ import annotations

import argparse
import os

import duckdb

PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


ALL_TABLES = PASSTHROUGH + ["events", "documents", "embeddings"]


def generate_empty(out: str, src: str) -> None:
    """Schema-preserving EMPTY clones of every table — the
    empty-partition / filtered-to-nothing axis (round-5 finds: 12
    operators crashed or diverged; see the degenerate-input commits).
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0)"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def generate_nulls(out: str, src: str) -> None:
    """Clones with NULL rows planted: a NULL-text document, a NULL-ts
    and a NULL-value event, a NULL embedding. Round-5 finds: 19
    operators crashed or diverged; the adopted conventions are
    NULL-in -> NULL-out for pure column functions and "rows with NULL
    in the operator's required input are excluded" for content
    processors (dedup, gates, packing, training) and time windows —
    each mirrored by IS NOT NULL / CASE in the oracle SQL."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL SELECT 910001, NULL, 'en', 'adv', 0
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL SELECT 920000, TIMESTAMP '2024-03-01 12:00:00', 424244,
                   'click', NULL, '{{}}'
  UNION ALL SELECT 920001, NULL, 424245, 'view', 5.0, '{{}}'
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL SELECT 910001, NULL, 2
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")


def generate_nan(out: str, src: str) -> None:
    """Clone with a NaN measurement planted in events.value. Round-5
    finds: the engines' NaN semantics diverge in comparisons,
    percentiles, and binning (4 operators). Convention: measurement
    stats treat NaN as missing — excluded like NULL — in outlier
    gates, histograms, envelopes, and A/B readouts; plain sums/avgs
    propagate NaN identically on both engines and are left alone.
    NOTE the oracle filter must be `value IS NULL OR NOT isnan(value)`
    because Spark's isnan(NULL) is false while DuckDB's is NULL."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x != "events"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL SELECT 930000, TIMESTAMP '2024-03-01 06:00:00', 424246,
                   'click', 'NaN'::DOUBLE, '{{}}'
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")


def generate_dups(out: str, src: str) -> None:
    """Duplicate-HEAVY clone — the shape real web corpora actually
    have and the one axis benign generators never produce: one
    boilerplate doc × hundreds of exact copies plus a near-dup family
    (same boilerplate, one distinguishing token per copy).

    This is the corpus where MinHash-LSH's in-bucket expansion is
    quadratic in family size (every family member shares every band
    bucket); it gates minhash_neardup_collapsed's spanning-set
    contract and the max_bucket_width cap, and stresses every dedup
    operator's hot-key path (one sha digest carrying the whole
    family). Embeddings get a 20-copy identical vector family for the
    semantic-dedup / kNN tie-break paths.
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x not in ("documents", "embeddings")]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    boiler = "all rights reserved terms of service privacy policy contact us"
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT 940000 + i, '{boiler}', 'en', 'advdup', len('{boiler}')
  FROM range(400) t(i)
  UNION ALL
  SELECT 945000 + i,
         '{boiler} ref' || i::VARCHAR,
         'en', 'advdup', len('{boiler} ref' || i::VARCHAR)
  FROM range(40) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet')"
        " LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL
  SELECT 940000 + i,
         [(CASE WHEN j = 0 THEN 1.0 ELSE 0.25 END)::FLOAT
          FOR j IN range({dim})],
         0
  FROM range(20) t(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")


def generate_hostile_urls(out: str, src: str) -> None:
    """Clone with extra documents whose doc_ids CONCENTRATE the
    hostile URL-synthesis templates (``__spark_entry__._synth_urls``
    m = doc_id %% 20, templates 12-19: IPv6 bracket literals, IPv4,
    punycode, double-@ userinfo, >1000-char paths, unparseable rows).

    URLs in this repo are synthesized deterministically from doc_id,
    so the hostile axis plants IDS, not strings: 40 rows per hostile
    template put ~320 hostile URLs through url_canonical /
    domain_cap_sample's full two-engine sweep every round — the
    round-7 userinfo and round-8 IPv6 defects were both invisible to
    benign corpora (both engine twins replayed the same wrong answer),
    and unit-test corpora only run when someone runs the unit tests.
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x != "documents"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    # 960000 % 20 == 0: id 960000+20j+k hits template k exactly
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL
  SELECT 960000 + 20 * j + k,
         'hostile url probe row ' || (20 * j + k)::VARCHAR,
         'en', 'advhostile', 5
  FROM range(40) t(j), range(12, 20) u(k)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")


def generate_longdoc(out: str, src: str) -> None:
    """Clone with GIANT documents planted — organic synthetic docs top
    out at ~560 chars, but a real web corpus has multi-hundred-KB
    pages, and "long" breaks different things than "hostile":

    - 980001: a 100 kB doc (2000 copies of a 50-char sentence) —
      shingle/minhash/substring-dedup per-doc work is O(len), and the
      signature fold walks a ~20k-element array in ONE row
    - 980002: a 2 kB SINGLE token (no whitespace) — tokenizers emit
      one monster word; BPE encode's per-word merge loop and the
      oracle's recursive CTE walk a 2k-symbol word
    - 980003: one word repeated 20k times — extreme repetition ratios
      (Gopher gates), a single hot shingle, top-token mass
    - 980004: a 1000-line doc (line_dedup per-doc reassembly, line
      inverted index fan-out)

    All byte-deterministic (repeat()), so every oracle replays
    identically; the axis exists to prove per-doc O(len) paths stay
    linear and nothing imposes a hidden length cap on one engine only.
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x != "documents"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    sent = "the quick brown fox jumps over the lazy dog again today "
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL SELECT 980001, rtrim(repeat('{sent}', 2000)), 'en',
                   'advlong', len(rtrim(repeat('{sent}', 2000)))
  UNION ALL SELECT 980002, repeat('x', 2000), 'en', 'advlong', 2000
  UNION ALL SELECT 980003, rtrim(repeat('spam ', 20000)), 'en',
                   'advlong', len(rtrim(repeat('spam ', 20000)))
  UNION ALL SELECT 980004,
      rtrim(repeat('shared boilerplate line for dedup testing' || chr(10),
                   1000), chr(10)),
      'en', 'advlong',
      len(rtrim(repeat('shared boilerplate line for dedup testing'
                       || chr(10), 1000), chr(10)))
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")


def generate_skew(out: str, src: str) -> None:
    """Clone with HOT KEYS planted — the distribution shape that
    actually breaks 100 TB jobs: a few keys carrying orders of
    magnitude more rows than the median.

    - events: user 9_900_000 gets a 600-event burst in one day
      (sessionize / per-user windows / debounce get one giant
      partition), including 50 events sharing the EXACT same
      timestamp — any window ordered by ts alone (no id tie-break)
      produces engine-dependent row_numbers, which is precisely what
      this corpus exists to catch.
    - orders: customer 7 gets 400 extra orders (join fan-out and
      groupBy hot-key stress for every o_custkey query).
    - lineitem: 2 lines per planted order, ~all on partkey 1 with
      suppkey cycling — a hot item for copurchase / association-rule
      pairing and a hot build side for part joins.

    All planted values are deterministic expressions (no RNG), and
    totalprices are offset to avoid colliding with organic top-N
    boundaries non-deterministically.
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x not in ("events", "orders",
                                                 "lineitem")]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL
  SELECT 970000 + i,
         TIMESTAMP '2024-01-15 08:00:00'
           + INTERVAL (CASE WHEN i < 50 THEN 3600
                            ELSE i * 13 END) SECOND,
         9900000,
         ['click','view','purchase','signup','error'][(i % 5) + 1],
         (i % 97) * 1.5,
         '{{"k": ' || (i % 9)::VARCHAR || '}}'
  FROM range(600) t(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/orders.parquet')
  UNION ALL
  SELECT 800000 + i, 7,
         CASE WHEN i % 3 = 0 THEN 'F' ELSE 'O' END,
         900000.01 + i * 1.37,
         TIMESTAMP '1995-01-01' + INTERVAL ((i * 5) % 2400) DAY,
         ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
           [(i % 5) + 1]
  FROM range(400) t(i)
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/lineitem.parquet')
  UNION ALL
  SELECT 800000 + i // 2,
         CASE WHEN i % 11 = 0 THEN (i % 190) + 1 ELSE 1 END,
         (i % 10),
         (i % 2) + 1,
         (i % 49) + 1.0,
         1000.0 + (i % 500) * 2.25,
         (i % 10) / 100.0,
         (i % 8) / 100.0,
         CASE WHEN i % 3 = 0 THEN 'R' ELSE 'N' END,
         CASE WHEN i % 3 = 0 THEN 'F' ELSE 'O' END,
         TIMESTAMP '1995-01-01' + INTERVAL (((i // 2) * 5) % 2400 + 30) DAY
  FROM range(800) t(i)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")


def generate_nanvec(out: str, src: str) -> None:
    """Clone with POISONED embedding vectors planted — the four shapes
    a failed/truncated encoder actually emits: a NaN component, a +Inf
    component, a -Inf component, and a NULL component (NULL whole
    vectors are the --nulls axis). Each poisons a different stage
    differently — NaN distances make k-means/IVF argmin ordering
    engine-dependent, an Inf norm zeroes every cosine it touches, one
    NaN component poisons its whole dimension's mean/std — so the
    convention is uniform: vector operators exclude INVALID vectors at
    entry (similarity.vec_is_valid ↔ the oracle's _VALID_VEC filter).
    """
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x != "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet')"
        " LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL SELECT 960001,
      [(CASE WHEN j = 3 THEN 'NaN'::FLOAT ELSE 0.1::FLOAT END)
       FOR j IN range({dim})], 1
  UNION ALL SELECT 960002,
      [(CASE WHEN j = 0 THEN 'Infinity'::FLOAT ELSE 0.1::FLOAT END)
       FOR j IN range({dim})], 2
  UNION ALL SELECT 960003,
      [(CASE WHEN j = {dim - 1} THEN '-Infinity'::FLOAT
             ELSE 0.1::FLOAT END) FOR j IN range({dim})], 3
  UNION ALL SELECT 960004,
      [(CASE WHEN j = 7 THEN NULL ELSE 0.1::FLOAT END)
       FOR j IN range({dim})], 4
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")


def generate_unicode(out: str, src: str) -> None:
    """Clone with NFC/NFD twin documents planted — the same visible
    text encoded as composed codepoints (é = U+00E9) in one doc and
    decomposed base+combining (e + U+0301) in its twin. Byte-level
    operators (sha fingerprints, shingle hashes, dedup) legitimately
    see two distinct docs; the planted twins verify both engines make
    the SAME call everywhere (length/codepoint counts, case folds,
    tokenization), and the corpus-entry normalization convention
    (TX.nfc_normalize — apply BEFORE fingerprinting when twin collapse
    is wanted) is tested separately in tests/test_text_functions.
    """
    import unicodedata

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in [x for x in ALL_TABLES if x != "documents"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    nfc = "café résumé naïve déjà vu über straße"
    nfd = unicodedata.normalize("NFD", nfc)
    assert nfc != nfd and unicodedata.normalize("NFC", nfd) == nfc
    mixed = nfc.split(" ")[0] + " " + unicodedata.normalize("NFD", "élève näive")
    rows = [
        (950001, nfc), (950002, nfd),
        (950003, nfc.upper()), (950004, mixed),
    ]
    df_sql = " UNION ALL ".join(
        f"SELECT {i}, '{t}', 'fr', 'advuni', {len(t)}" for i, t in rows
    )
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL {df_sql}
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")


def generate(out: str, src: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/documents.parquet')
  UNION ALL SELECT 900001, '', 'en', 'adv', 0
  UNION ALL SELECT 900002, 'solo', 'en', 'adv', 4
  UNION ALL SELECT 900003,
      'same same same same same same same same', 'en', 'adv', 39
  UNION ALL SELECT 900004, 'café naïve über straße élève', 'fr', 'adv', 28
  UNION ALL SELECT 900005, 'a', 'de', 'adv', 1
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/events.parquet')
  UNION ALL
  SELECT 900000 + i,
         TIMESTAMP '2024-03-01 00:00:00' + INTERVAL (i) MINUTE,
         424242, 'advtype', 7.0, '{{}}'
  FROM range(12) t(i)
  UNION ALL SELECT 910000, TIMESTAMP '2024-03-02 00:00:00',
                   424243, 'advtype', 0.0, '{{}}'
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet')"
        " LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT * FROM read_parquet('{src}/embeddings.parquet')
  UNION ALL SELECT 900001, [0.0::FLOAT FOR i IN range({dim})], 0
  UNION ALL SELECT 900002, [1.0::FLOAT FOR i IN range({dim})], 1
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--nulls", action="store_true")
    ap.add_argument("--nan", action="store_true")
    ap.add_argument("--dups", action="store_true")
    ap.add_argument("--unicode", action="store_true")
    ap.add_argument("--nanvec", action="store_true")
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--longdoc", action="store_true")
    ap.add_argument("--hostile-urls", action="store_true")
    a = ap.parse_args()
    if a.hostile_urls:
        generate_hostile_urls(a.out, a.src)
        print(f"wrote hostile-URL-id tables to {a.out} (src={a.src})")
    elif a.longdoc:
        generate_longdoc(a.out, a.src)
        print(f"wrote giant-document tables to {a.out} (src={a.src})")
    elif a.skew:
        generate_skew(a.out, a.src)
        print(f"wrote hot-key-skew tables to {a.out} (src={a.src})")
    elif a.nanvec:
        generate_nanvec(a.out, a.src)
        print(f"wrote NaN/Inf-vector tables to {a.out} (src={a.src})")
    elif a.dups:
        generate_dups(a.out, a.src)
        print(f"wrote duplicate-heavy tables to {a.out} (src={a.src})")
    elif a.unicode:
        generate_unicode(a.out, a.src)
        print(f"wrote NFC/NFD-twin tables to {a.out} (src={a.src})")
    elif a.empty:
        generate_empty(a.out, a.src)
        print(f"wrote EMPTY tables to {a.out} (src={a.src})")
    elif a.nulls:
        generate_nulls(a.out, a.src)
        print(f"wrote NULL-planted tables to {a.out} (src={a.src})")
    elif a.nan:
        generate_nan(a.out, a.src)
        print(f"wrote NaN-planted tables to {a.out} (src={a.src})")
    else:
        generate(a.out, a.src)
        print(f"wrote adversarial tables to {a.out} (src={a.src})")
