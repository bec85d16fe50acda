"""Property-based invariants (hypothesis) for core operators.

Few examples, deterministic seeds, deadline off — Spark jobs are slow
per example, so each property gets a handful of generated cases that
still explore shapes hand-written fixtures miss (empty groups, single
rows, duplicate keys, extreme floats).
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_in_agriculture_spark.operators.daily import daily_rollup
from big_data_in_agriculture_spark.operators.relational import sessionize
from big_data_in_agriculture_spark.sources.upsert import merge_frames

SLOW = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 72), finite),
        min_size=1,
        max_size=40,
    )
)
def test_daily_rollup_invariants(spark, rows):
    data = [(r, dt.datetime(2022, 1, 1) + dt.timedelta(hours=h), v) for r, h, v in rows]
    df = spark.createDataFrame(data, ["region", "ts", "t2m"])
    out = daily_rollup(df, agg_specs={"t2m": ["mean", "min", "max"]}, cast=None).collect()
    # one output row per (region, day) present in the input
    assert len(out) == len({(r, t.date()) for r, t, _ in data})
    for row in out:
        group = [v for r, t, v in data if r == row["region"] and t.date() == row["day"]]
        assert row["t2m_min"] == min(group)
        assert row["t2m_max"] == max(group)
        assert math.isclose(row["t2m_mean"], sum(group) / len(group), rel_tol=1e-9)
        assert row["t2m_min"] <= row["t2m_mean"] <= row["t2m_max"]


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    gap=st.sampled_from([1, 5, 30]),
)
def test_sessionize_invariants(spark, events, gap):
    data = [
        (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts"])
    out = sessionize(df, gap_minutes=gap).collect()
    # every event lands in exactly one session
    assert sum(r["n_events"] for r in out) == len(data)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sessions in by_user.items():
        sessions.sort(key=lambda r: r["session_start"])
        for s in sessions:
            assert s["session_start"] <= s["session_end"]
        # consecutive sessions of one user are separated by > gap
        for a, b in zip(sessions, sessions[1:]):
            assert (b["session_start"] - a["session_end"]).total_seconds() > gap * 60


@SLOW
@given(
    # existing is key-unique — merge_frames' documented precondition
    # (every table the upsert module writes is PK-unique)
    existing=st.lists(
        st.tuples(st.integers(0, 5), finite), max_size=15, unique_by=lambda t: t[0]
    ),
    incoming=st.lists(st.tuples(st.integers(0, 5), finite), max_size=15),
)
def test_merge_frames_invariants(spark, existing, incoming):
    ex = spark.createDataFrame(existing, ["k", "v"]) if existing else spark.createDataFrame([], "k int, v float")
    inc = spark.createDataFrame(incoming, ["k", "v"]) if incoming else spark.createDataFrame([], "k int, v float")
    merged = merge_frames(ex, inc, ["k"]).collect()
    keys = [r["k"] for r in merged]
    # key-unique result covering exactly the union of key sets
    assert sorted(keys) == sorted(set(keys))
    assert set(keys) == {k for k, _ in existing} | {k for k, _ in incoming}
    # incoming wins: every incoming key's value comes from incoming
    inc_keys = {k for k, _ in incoming}
    inc_vals = {k: {v for kk, v in incoming if kk == k} for k in inc_keys}
    for r in merged:
        if r["k"] in inc_keys:
            assert any(
                r["v"] == v or (math.isnan(r["v"]) and math.isnan(v))
                for v in inc_vals[r["k"]]
            )


@SLOW
@given(
    points=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),
        min_size=1, max_size=30, unique=True,
    ),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(0, 120)),
        min_size=1, max_size=15, unique=True,
    ),
    bin_width=st.sampled_from([7, 50, 1000]),
)
def test_binned_range_join_equals_naive(spark, points, intervals, bin_width):
    from big_data_in_agriculture_spark.operators.relational import binned_range_join

    p = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(points)], ["k", "pid", "p"]
    )
    iv = spark.createDataFrame(
        [(k, j, lo, lo + ln) for j, (k, lo, ln) in enumerate(intervals)],
        ["k", "iid", "lo", "hi"],
    )
    got = {(r["pid"], r["iid"]) for r in
           binned_range_join(p, iv, ["k"], "p", "lo", "hi", bin_width).collect()}
    expected = {
        (i, j)
        for i, (pk, v) in enumerate(points)
        for j, (ik, lo, ln) in enumerate(intervals)
        if pk == ik and lo <= v <= lo + ln
    }
    assert got == expected


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["view", "click", "purchase"]),
                  st.integers(0, 10_000)),
        min_size=1, max_size=40,
    )
)
def test_funnel_monotone_and_matches_bruteforce(spark, events):
    from big_data_in_agriculture_spark.operators.analytics import funnel_conversion

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, ty, t0 + dt.timedelta(seconds=s)) for u, ty, s in events]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = funnel_conversion(df, ["view", "click", "purchase"]).collect()[0]
    assert got["n_step1"] >= got["n_step2"] >= got["n_step3"]

    # brute-force reference on the driver
    by_user: dict[int, list[tuple[str, dt.datetime]]] = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((ty, ts))
    n = [0, 0, 0]
    for evs in by_user.values():
        t = None
        for step_i, step in enumerate(["view", "click", "purchase"]):
            cand = [ts for ty, ts in evs if ty == step and (t is None or ts >= t)]
            if not cand:
                break
            t = min(cand)
            n[step_i] += 1
    assert (got["n_step1"], got["n_step2"], got["n_step3"]) == tuple(n)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["en", "de", "fr"])),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    rate=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
def test_stratified_sample_is_subset_and_idempotent(spark, rows, rate):
    from big_data_in_agriculture_spark.operators.llm import stratified_sample

    docs = spark.createDataFrame(
        [(i, lang, "t") for i, lang in rows], ["doc_id", "lang", "text"]
    )
    rates = {"en": rate, "de": 1.0, "fr": 0.5}
    out = stratified_sample(docs, rates)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids <= {i for i, _ in rows}  # subset of input
    # idempotent: sampling the sample with the same rates keeps it all
    again = {r["doc_id"] for r in stratified_sample(out, rates).collect()}
    assert again == ids
    if rate == 1.0:
        assert {i for i, l in rows if l == "en"} <= ids
    if rate == 0.0:
        assert not any(l == "en" for i, l in rows if i in ids)


@SLOW
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3600)),
        min_size=1,
        max_size=50,
    ),
    gap=st.sampled_from([1, 60, 600]),
)
def test_debounce_openers_are_gap_separated(spark, events, gap):
    import datetime as dt

    from big_data_in_agriculture_spark.operators.analytics import debounce_events

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u, "e")
            for i, (u, s) in enumerate(events)
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )
    kept = debounce_events(df, gap_seconds=gap).collect()
    by_user = {}
    for r in kept:
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    # consecutive surviving events of one key are >= gap apart (each
    # opener is >= gap after the previous EVENT, which is no earlier
    # than the previous opener)
    for times in by_user.values():
        times.sort()
        for a, b in zip(times, times[1:]):
            assert (b - a).total_seconds() >= gap
    # every user with any event keeps at least their first one
    assert set(by_user) == {u for u, _ in events}


@SLOW
@given(
    vals=st.lists(finite, min_size=5, max_size=80),
)
def test_winsorize_bounds_and_interior(spark, vals):
    from big_data_in_agriculture_spark.operators.profile import winsorize

    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    out = [r["v"] for r in winsorize(df, "v", 0.10, 0.90).collect()]
    assert len(out) == len(vals)
    # clipped range is within the original range and ordered
    assert min(out) >= min(vals) - 1e-4 and max(out) <= max(vals) + 1e-4
    # median survives clipping at the 10/90 bounds
    s_in, s_out = sorted(vals), sorted(out)
    mid = len(vals) // 2
    if len(vals) % 2 == 1:
        assert math.isclose(s_out[mid], s_in[mid], rel_tol=1e-9, abs_tol=1e-4)


@given(
    n_toks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    chunk_len=st.integers(min_value=2, max_value=16),
)
@SLOW
def test_pack_chunks_offsets_partition_token_stream(spark, n_toks, chunk_len):
    from big_data_in_agriculture_spark.operators.llm import pack_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(n_toks)],
        ["doc_id", "text"],
    )
    rows = sorted(
        pack_chunks(docs, chunk_len=chunk_len, n_buckets=4).collect(),
        key=lambda r: r["doc_id"],
    )
    # offsets are the exact running sum in id order (note: "" splits to
    # one empty token, so every doc contributes >= 1)
    running = 0
    for r in rows:
        assert r["offset"] == running
        running += r["n_tokens"]
        assert r["first_chunk"] == r["offset"] // chunk_len
        last = (r["offset"] + max(r["n_tokens"], 1) - 1) // chunk_len
        assert r["last_chunk"] == last


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1, max_size=5,
        ).map(lambda ls: "\n".join(ls)),
        min_size=1, max_size=10,
    )
)
@SLOW
def test_line_dedup_identity_when_threshold_unreachable(spark, texts):
    from big_data_in_agriculture_spark.operators.llm import line_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    # min_docs above the corpus size -> nothing can be boilerplate ->
    # every doc reassembles to itself (order preservation round trip)
    out = {r["doc_id"]: r["text"] for r in
           line_dedup(docs, min_docs=len(texts) + 1).collect()}
    assert out == {i: t for i, t in enumerate(texts)}


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40)
        .map(lambda cs: " ".join(cs)),
        min_size=1, max_size=8,
    ),
    chunk=st.integers(min_value=3, max_value=10),
    overlap=st.integers(min_value=0, max_value=2),
)
@SLOW
def test_chunk_documents_covers_and_reconstructs(spark, texts, chunk, overlap):
    from big_data_in_agriculture_spark.operators.llm import chunk_documents

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    by_doc: dict[int, list] = {}
    for r in chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # stride-reconstruction returns the original token stream
        rebuilt = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            rebuilt.extend(r["chunk_text"].split(" ")[overlap:])
        assert " ".join(rebuilt) == t
        # every chunk except the last is full-size
        assert all(r["n_chunk_tokens"] == chunk for r in rows[:-1])


@given(
    lint=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200), st.integers(0, 60)),
        min_size=1, max_size=12,
    ),
    rint=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200), st.integers(0, 60)),
        min_size=1, max_size=12,
    ),
    width=st.integers(min_value=1, max_value=80),
)
@SLOW
def test_interval_overlap_join_matches_naive(spark, lint, rint, width):
    # the binned decomposition must equal the naive inequality join
    # EXACTLY (same pairs, each exactly once) for any bin width
    from pyspark.sql import functions as F

    from big_data_in_agriculture_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(k, i, lo, lo + ln) for i, (k, lo, ln) in enumerate(lint)],
        ["k", "lid", "l_lo", "l_hi"],
    )
    right = spark.createDataFrame(
        [(k, i, lo, lo + ln) for i, (k, lo, ln) in enumerate(rint)],
        ["k", "rid", "r_lo", "r_hi"],
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, ["k"], "l_lo", "l_hi", "r_lo", "r_hi", width
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (lk, llo, lln) in enumerate(lint)
        for ri, (rk, rlo, rln) in enumerate(rint)
        if lk == rk and llo <= rlo + rln and rlo <= llo + lln
    )
    assert got == want


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=20).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(2, 4),
)
def test_substring_dedup_invariants(spark, docs, k):
    """(1) token count = kept + removed; (2) no removed mass ⇒ text
    unchanged; (3) cleaned corpus contains no k-gram that repeated."""
    from big_data_in_agriculture_spark.operators.llm import substring_dedup

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in substring_dedup(df, k=k).collect()}
    assert set(out) == set(range(len(docs)))
    for i, text in enumerate(docs):
        row = out[i]
        n_orig = len(text.split(" "))
        n_kept = len(row["clean_text"].split(" ")) if row["clean_text"] else 0
        assert n_kept + row["n_removed"] == n_orig
        if row["n_removed"] == 0:
            assert row["clean_text"] == text

    # every k-gram of the original corpus with count >= 2 must be gone
    # from every cleaned doc (it can only survive as a NEW junction of
    # kept fragments, which the span semantics does allow — so check
    # only grams fully inside kept regions: equivalently, re-running
    # dedup on already-clean docs with the ORIGINAL hot set removes
    # nothing more than re-junctioned grams; weak-check via counts)
    from collections import Counter

    grams = Counter()
    for text in docs:
        toks = text.split(" ")
        for j in range(len(toks) - k + 1):
            grams[tuple(toks[j : j + k])] += 1
    hot = {g for g, c in grams.items() if c >= 2}
    if not hot:
        for i, text in enumerate(docs):
            assert out[i]["clean_text"] == text


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="abcxyz ", min_size=1, max_size=12).map(str.strip),
        min_size=1,
        max_size=8,
        unique=True,
    ).map(lambda ns: [n for n in ns if n]),
    threshold=st.floats(0.2, 0.9),
)
def test_fuzzy_join_matches_bruteforce(spark, names, threshold):
    """Inverted-index fuzzy join ≡ brute-force char-trigram Jaccard."""
    from big_data_in_agriculture_spark.operators.relational import fuzzy_join

    if not names:
        return
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in fuzzy_join(
            df, df, "id", "id", "name", "name", threshold=threshold
        ).filter("id_a < id_b").collect()
    }

    def grams(s):
        return (
            {s[i : i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else {s}
        )

    expect = {}
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            if i < j:
                ga, gb = grams(a), grams(b)
                jac = len(ga & gb) / len(ga | gb)
                if jac >= threshold and len(ga & gb) > 0:
                    expect[(i, j)] = jac
    assert set(got) == set(expect)
    for key, v in got.items():
        assert math.isclose(v, expect[key], rel_tol=1e-6)


@SLOW
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=7),
        min_size=1,
        max_size=7,
        unique=True,
    ),
    k=st.integers(1, 2),
)
def test_edit_join_matches_bruteforce(spark, names, k):
    """PassJoin pigeonhole blocking ≡ brute-force levenshtein ≤ k.

    The tiny 'abc' alphabet maximizes near-collisions, the worst case
    for candidate-generation completeness (many pairs sit exactly at
    the k boundary through pure indel alignments)."""
    from big_data_in_agriculture_spark.operators.relational import edit_join

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_join(df, df, "id", "id", "name", "name", k=k).collect()
    }
    want = {
        (i, j, lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if lev(a, b) <= k
    }
    assert got == want


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_minhash_kernel_column_parity_on_arbitrary_text(spark, texts):
    """The portable Arrow kernel (hashlib md5 + numpy affine minima)
    and the Column twin (TX.shingle_hashes_md5 → affine fold) must be
    BIT-IDENTICAL on arbitrary unicode — empties, exotic whitespace,
    multi-byte chars — because the DuckDB oracle replays the Column
    form. Guards the kernel against tokenization drift (str.split(' ')
    vs F.split(c, ' ') keep-empties semantics)."""
    from pyspark.sql import functions as F

    from big_data_in_agriculture_spark.functions import text as TX
    from big_data_in_agriculture_spark.operators import llm

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    num_perm = 8
    kernel = {
        r["id"]: list(r["signature"])
        for r in llm.minhash_signatures(docs, num_perm=num_perm).collect()
    }
    params = [llm._affine_params(i) for i in range(num_perm)]
    mers = (1 << 61) - 1

    def affine(a, b):
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(mers)

    cols = [
        F.array_min(F.transform(TX.shingle_hashes_md5(F.col("text"), 3), affine(a, b))).alias(f"s{i}")
        for i, (a, b) in enumerate(params)
    ]
    column = {
        r["doc_id"]: [r[f"s{i}"] for i in range(num_perm)]
        for r in docs.select("doc_id", *cols).collect()
    }
    assert kernel == column


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    digits=st.sampled_from([4, 6, 8]),
)
def test_quantize_half_away_duckdb_parity(vals, digits):
    """Property: the Python quantize rule and its generated SQL twin
    agree bit-for-bit on arbitrary doubles — the contract the
    iterative-trainer oracles (k-means, classifier) rest on. Includes
    the dyadic-tie cases hypothesis finds on its own."""
    import duckdb

    import __spark_entry__ as entrymod
    from big_data_in_agriculture_spark.operators._util import (
        quantize_half_away,
    )

    con = duckdb.connect()
    exprs = ", ".join(
        entrymod._quantize_sql(repr(v), digits) for v in vals
    )
    got = con.execute(f"SELECT {exprs}").fetchone()
    for v, g in zip(vals, got):
        p = quantize_half_away(v, digits)
        assert g == p or (math.isnan(g) and math.isnan(p)), (v, digits, g, p)
