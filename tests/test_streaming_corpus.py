"""Incremental corpus ingestion: each fingerprint admitted once, ever."""

from __future__ import annotations

from pyspark.sql import types as T

from big_data_in_agriculture_spark.streaming import corpus

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _land(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def test_dedup_ingest_admits_each_fingerprint_once(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    # batch 0: doc 2 and 3 are same content modulo case/whitespace —
    # within-batch dedup keeps the min id
    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta"),
                                    (3, "GAMMA\tDELTA")])
    corpus.start_dedup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert got == {1, 2}

    # batch 1: doc 4 re-sends batch-0 content (cross-batch dup), doc 5
    # is new — only 5 admitted
    _land(spark, str(land / "b1"), [(4, "alpha beta"), (5, "epsilon zeta")])
    corpus.start_dedup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 5}
    # the sink carries the dedup index column
    assert all(len(r["fingerprint"]) == 64 for r in rows)


def _para(word: str) -> str:
    # long-enough distinct text so 3-shingle MinHash separates topics
    return (
        f"the {word} pipeline reads batches of {word} rows and writes "
        f"compact {word} outputs while tracking {word} lineage carefully"
    )


def test_neardup_ingest_rejects_near_dups_across_batches(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    base = _para("alpha")
    # batch 0: doc 2 is a near-dup of doc 1 (one word changed), doc 3
    # distinct topic — within-batch gate keeps the min id of the pair
    _land(spark, str(land / "b0"), [
        (1, base),
        (2, base.replace("carefully", "quickly")),
        (3, _para("omega")),
    ])
    corpus.start_neardup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
    ).awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 3}

    # batch 1: doc 4 near-dups admitted doc 1 (cross-batch reject),
    # doc 5 byte-identical to doc 3 (exact reject), doc 6 new
    _land(spark, str(land / "b1"), [
        (4, base.replace("lineage", "history")),
        (5, _para("omega")),
        (6, _para("sigma")),
    ])
    corpus.start_neardup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
    ).awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 3, 6}

    # the LSH index covers exactly the admitted docs
    idx_ids = {r["id"] for r in spark.read.parquet(sink + "/index").collect()}
    assert idx_ids == {1, 3, 6}


def test_neardup_ingest_replay_is_idempotent(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")

    rows = [(1, _para("alpha")), (2, _para("beta"))]
    _land(spark, str(land / "b0"), rows)
    for chk in ("chk1", "chk2"):  # fresh checkpoint = full replay
        corpus.start_neardup_ingest(
            spark, str(land) + "/*", sink, str(tmp_path / chk), DOC_SCHEMA
        ).awaitTermination(180)
    docs = spark.read.parquet(sink + "/docs").collect()
    assert sorted(r["doc_id"] for r in docs) == [1, 2]
    idx = spark.read.parquet(sink + "/index").collect()
    assert {r["id"] for r in idx} == {1, 2}


def test_dedup_ingest_crash_after_publish_replays_clean(
    spark, tmp_path, monkeypatch
):
    """Kill the exact-dedup foreachBatch AFTER its append but BEFORE
    the checkpoint commit: the replay must re-derive admissions from
    the sink's committed fingerprints and admit nothing twice."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta")])

    real = corpus._publish_admitted
    armed = {"crash": True}

    def crash_after(df, path):
        real(df, path)
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash after admitted publish")

    monkeypatch.setattr(corpus, "_publish_admitted", crash_after)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_dedup_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA
        ).awaitTermination(120)

    # clean restart, SAME checkpoint: the uncommitted batch replays
    monkeypatch.setattr(corpus, "_publish_admitted", real)
    corpus.start_dedup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]  # once each


def test_neardup_ingest_crash_in_both_publish_windows(
    spark, tmp_path, monkeypatch
):
    """Kill the near-dup admission in BOTH publish windows:

    window 1 — after the index append, before the docs append (the
    orphan-index window: replay must not be blinded by the orphan
    band keys, and duplicate index rows must stay inert);
    window 2 — after both appends, before the checkpoint commit (the
    replay-whole-batch window: the fingerprint anti-join must admit
    nothing twice).
    """
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    real_docs = corpus._publish_docs

    # ---- window 1: crash BETWEEN index and docs appends (batch b0) ----
    _land(spark, str(land / "b0"), [
        (1, _para("alpha")),
        (2, _para("alpha").replace("carefully", "quickly")),  # near-dup of 1
        (3, _para("omega")),
    ])

    def crash_before_docs(df, path):
        raise RuntimeError("injected crash between index and docs")

    monkeypatch.setattr(corpus, "_publish_docs", crash_before_docs)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_neardup_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
        ).awaitTermination(180)
    # index landed, docs did not — the orphan-index state
    assert corpus._sink_exists(spark, sink + "/index")
    assert not corpus._sink_exists(spark, sink + "/docs")

    # ---- window 2 armed for the replay: crash AFTER docs append ----
    armed = {"crash": True}

    def crash_after_docs(df, path):
        real_docs(df, path)
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash after docs publish")

    monkeypatch.setattr(corpus, "_publish_docs", crash_after_docs)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_neardup_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
        ).awaitTermination(180)

    # ---- clean restart: replays the still-uncommitted batch ----
    monkeypatch.setattr(corpus, "_publish_docs", real_docs)
    corpus.start_neardup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
    ).awaitTermination(180)

    docs = spark.read.parquet(sink + "/docs").collect()
    # no duplicate admissions across all three attempts
    assert sorted(r["doc_id"] for r in docs) == [1, 3]
    # no lost history: the index covers exactly the admitted ids (the
    # window-1 orphan rows are duplicates of real ones, inert by the
    # inner-join against docs)
    idx_ids = {r["id"] for r in spark.read.parquet(sink + "/index").collect()}
    assert idx_ids == {1, 3}

    # ---- the gate still works after the crashes: near-dup of an
    # admitted doc is rejected, a new topic is admitted ----
    _land(spark, str(land / "b1"), [
        (4, _para("alpha").replace("lineage", "history")),
        (5, _para("sigma")),
    ])
    corpus.start_neardup_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, threshold=0.5
    ).awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 3, 5}


def test_quarantine_ingest_dead_letters_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    land = tmp_path / "landing"
    land.mkdir()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    (land / "f0.csv").write_text(
        "id,name,score\n1,alice,9.5\n2,bob,NOT_A_NUMBER\n"
    )
    (land / "f1.csv").write_text("id,name,score\n3,carol,7.0\n")

    q = corpus.start_quarantine_ingest(
        spark,
        str(land) + "/*.csv",
        str(tmp_path / "clean"),
        str(tmp_path / "dlq"),
        str(tmp_path / "chk"),
        schema,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert len(dlq) == 1
    assert "NOT_A_NUMBER" in dlq[0]["_corrupt_record"]
    assert dlq[0]["id"] == 2  # partial parse preserved for replay


def test_bloom_ingest_admits_each_fingerprint_once(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta"),
                                    (3, "GAMMA\tDELTA")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2}

    # batch 1: doc 4 re-sends batch-0 content — flagged by the filter,
    # rejected by the precise path; doc 5 is provably new (no history
    # read for it) and admitted
    _land(spark, str(land / "b1"), [(4, "alpha beta"), (5, "epsilon zeta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    rows = spark.read.parquet(sink + "/docs").collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 5}
    # the bloom sink folds to a filter covering exactly the admitted fps
    words = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), epoch_id=-1)
    assert words is not None
    from pyspark.sql import functions as F

    n_deltas = words.select("_batch_id").distinct().count()
    assert n_deltas == 2  # one delta partition per non-empty batch


def test_bloom_ingest_nonstrict_rejects_flagged_outright(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    _land(spark, str(land / "b0"), [(1, "alpha beta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)
    # batch 1: true re-arrival rejected with ZERO history reads; novel
    # doc admitted (provably new — bloom-negative)
    _land(spark, str(land / "b1"), [(2, "alpha beta"), (3, "epsilon zeta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 3}


def test_bloom_ingest_crash_in_both_publish_windows(
    spark, tmp_path, monkeypatch
):
    """Kill the bloom admission in BOTH publish windows:

    window 1 — after the bloom-delta write, before the docs write (the
    over-set-bits window: the crashed attempt's partition must be
    INVISIBLE to the replay's gate — excluded by epoch — and then
    overwritten, not appended);
    window 2 — after both writes, before the checkpoint commit (whole-
    batch replay: dynamic overwrite must rewrite the same partitions,
    admitting nothing twice).

    Run in strict=False — the mode where a naive append-based delta
    design LOSES the whole batch in window 1 (its own crashed bits
    flag every doc and non-strict rejects them outright).
    """
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    real_docs = corpus._publish_bloom_docs

    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta")])

    # ---- window 1: crash BETWEEN the delta write and the docs write ----
    def crash_before_docs(df, path, epoch_id):
        raise RuntimeError("injected crash between bloom delta and docs")

    monkeypatch.setattr(corpus, "_publish_bloom_docs", crash_before_docs)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_bloom_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
        ).awaitTermination(120)
    # delta landed, docs did not
    assert corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -1) is not None
    assert corpus._bloom_history(spark, sink + "/docs", -1) is None

    # ---- window 2 armed for the replay: crash AFTER the docs write ----
    armed = {"crash": True}

    def crash_after_docs(df, path, epoch_id):
        real_docs(df, path, epoch_id)
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash after bloom docs publish")

    monkeypatch.setattr(corpus, "_publish_bloom_docs", crash_after_docs)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_bloom_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
        ).awaitTermination(120)

    # ---- clean restart: replays the still-uncommitted batch ----
    monkeypatch.setattr(corpus, "_publish_bloom_docs", real_docs)
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)

    docs = spark.read.parquet(sink + "/docs").collect()
    # nothing lost (the window-1 hazard) and nothing admitted twice
    # (the window-2 hazard) across all three attempts
    assert sorted(r["doc_id"] for r in docs) == [1, 2]
    # exactly one delta partition — replays overwrote, never appended
    deltas = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -1)
    assert deltas.select("_batch_id").distinct().count() == 1

    # ---- the gate still works after the crashes ----
    _land(spark, str(land / "b1"), [(3, "alpha beta"), (4, "theta iota")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 4}


def test_bloom_compaction_preserves_the_gate(spark, tmp_path):
    """compact_bloom folds the delta partitions into the reserved
    ``_batch_id=-1`` partition without weakening the filter: after
    compaction a re-arrival is still rejected and a novel doc is still
    admitted, and the fold input is one partition instead of many."""
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    _land(spark, str(land / "b0"), [(1, "alpha beta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    _land(spark, str(land / "b1"), [(2, "gamma delta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)

    deltas = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -999)
    pre = {
        (r["word_idx"],): None
        for r in deltas.groupBy("word_idx").count().collect()
    }
    assert deltas.select("_batch_id").distinct().count() == 2

    corpus.compact_bloom(spark, sink)
    after = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -999)
    assert {r["_batch_id"] for r in after.select("_batch_id").distinct().collect()} == {-1}
    assert {(r["word_idx"],) for r in after.collect()} == set(pre)

    # idempotent: a second compaction is a no-op
    corpus.compact_bloom(spark, sink)

    # the gate still works on the compacted filter
    _land(spark, str(land / "b2"), [(3, "alpha beta"), (4, "epsilon zeta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 4}


def test_bloom_sink_stats_tracks_fill(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    # empty sink: zero fill, zero expected FPR
    r0 = corpus.bloom_sink_stats(spark, sink).collect()[0]
    assert r0["n_set_bits"] == 0 and r0["fill_frac"] == 0.0

    _land(spark, str(land / "b0"), [(i, f"doc number {i}") for i in range(50)])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA
    ).awaitTermination(120)
    r1 = corpus.bloom_sink_stats(spark, sink).collect()[0]
    # 50 keys x 7 hashes into 2^20 bits: ~350 set bits, tiny fill
    assert 0 < r1["n_set_bits"] <= 350
    assert 0.0 < r1["fill_frac"] < 0.001
    assert r1["expected_fpr"] < 1e-20

    # compaction must not change the stats (same folded bits)
    corpus.compact_bloom(spark, sink)
    r2 = corpus.bloom_sink_stats(spark, sink).collect()[0]
    assert (r2["n_set_bits"], r2["fill_frac"]) == (r1["n_set_bits"], r1["fill_frac"])


def test_bloom_compaction_between_crash_and_replay(
    spark, tmp_path, monkeypatch
):
    """Compaction running BETWEEN a crashed epoch and its replay must
    not fold the crashed epoch's delta: folded into ``_batch_id=-1``,
    its bits become invisible to the replay's epoch-exclusion and the
    replayed batch would be flagged dup and silently dropped in
    strict=False — the exact loss the replay model prevents. Bounding
    the fold by the checkpoint's last COMMITTED batch id makes
    compaction safe to run concurrently with a crashed/live stream."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    real_docs = corpus._publish_bloom_docs

    # nothing committed yet: checkpoint-bounded compaction is a no-op
    corpus.compact_bloom(spark, sink, checkpoint_path=chk)

    # batch 0 commits normally
    _land(spark, str(land / "b0"), [(1, "alpha beta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)

    # batch 1 crashes AFTER both publishes, BEFORE the checkpoint commit
    armed = {"crash": True}

    def crash_after_docs(df, path, epoch_id):
        real_docs(df, path, epoch_id)
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash after bloom docs publish")

    monkeypatch.setattr(corpus, "_publish_bloom_docs", crash_after_docs)
    _land(spark, str(land / "b1"), [(2, "gamma delta"), (3, "epsilon zeta")])
    with pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_bloom_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
        ).awaitTermination(120)

    # compaction between the crash and the replay: only batch 0 (the
    # last committed epoch) folds; the crashed batch 1 delta survives
    # as its own partition, still excludable by epoch on replay
    corpus.compact_bloom(spark, sink, checkpoint_path=chk)
    mid = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -999)
    ids = {r["_batch_id"] for r in mid.select("_batch_id").distinct().collect()}
    assert ids == {-1, 1}

    # clean restart: the replay must re-admit the crashed batch whole
    monkeypatch.setattr(corpus, "_publish_bloom_docs", real_docs)
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)
    docs = spark.read.parquet(sink + "/docs").collect()
    assert sorted(r["doc_id"] for r in docs) == [1, 2, 3]

    # once batch 1 has committed, the bounded fold takes it too
    corpus.compact_bloom(spark, sink, checkpoint_path=chk)
    after = corpus._bloom_history(spark, corpus._bloom_dir(sink, 1 << 20), -999)
    ids = {r["_batch_id"] for r in after.select("_batch_id").distinct().collect()}
    assert ids == {-1}

    # and the gate still rejects re-arrivals / admits novels
    _land(spark, str(land / "b2"), [(4, "alpha beta"), (5, "theta iota")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, strict=False
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 3, 5}


def test_bloom_rebuild_restores_fpr_and_keeps_exactly_once(spark, tmp_path):
    """The resize lifecycle bloom_sink_stats exists to trigger: run the
    gate at a deliberately tiny m until fill is past the design point,
    rebuild at a larger m from the docs sink, restart at the new m —
    admissions stay exactly-once across the resize (re-arrivals of
    pre-resize docs still rejected, novels admitted) and the stats
    show the FPR restored."""
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    m_small, m_big = 64, 1 << 16

    # 30 docs x 7 hashes into 64 bits: saturated filter
    _land(spark, str(land / "b0"),
          [(i, f"document number {i}") for i in range(30)])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, m_bits=m_small
    ).awaitTermination(120)
    r_sat = corpus.bloom_sink_stats(spark, sink, m_bits=m_small).collect()[0]
    assert r_sat["fill_frac"] > 0.5  # past the design point

    corpus.rebuild_bloom(
        spark, sink, m_small, m_big, checkpoint_path=chk
    )
    # old directory retired, new one holds the reserved partition
    assert corpus._bloom_history(
        spark, corpus._bloom_dir(sink, m_small), -999
    ) is None
    new = corpus._bloom_history(spark, corpus._bloom_dir(sink, m_big), -999)
    ids = {r["_batch_id"] for r in new.select("_batch_id").distinct().collect()}
    assert ids == {-1}
    r_new = corpus.bloom_sink_stats(spark, sink, m_bits=m_big).collect()[0]
    assert r_new["fill_frac"] < 0.01
    assert r_new["expected_fpr"] < 1e-6

    # resumed stream at the new m: strict=False so the decisions come
    # purely from the rebuilt filter — re-arrivals rejected, novel in
    _land(spark, str(land / "b1"),
          [(100, "document number 3"), (101, "a genuinely novel doc")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=m_big, strict=False,
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == set(range(30)) | {101}


def test_bloom_rebuild_crash_before_retire_is_recoverable(
    spark, tmp_path, monkeypatch
):
    """Kill the rebuild in its one risky-looking window — after the new
    filter publishes, before the old directory is retired. The gate's
    directory choice is parameter-driven, so the old filter keeps
    working at m_old; re-running the rebuild completes the swap."""
    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    m_small, m_big = 64, 1 << 16
    real = corpus._publish_rebuilt_bloom

    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, m_bits=m_small
    ).awaitTermination(120)

    def crash_after_publish(words, new_dir):
        real(words, new_dir)
        raise RuntimeError("injected crash after rebuilt-filter publish")

    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", crash_after_publish)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        corpus.rebuild_bloom(spark, sink, m_small, m_big, checkpoint_path=chk)
    # both directories exist; the gate still works at the OLD m
    assert corpus._bloom_history(
        spark, corpus._bloom_dir(sink, m_small), -999
    ) is not None
    _land(spark, str(land / "b1"), [(3, "alpha beta"), (4, "epsilon zeta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=m_small, strict=False,
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 4}

    # re-run completes the swap; the new filter includes batch b1's doc
    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", real)
    corpus.rebuild_bloom(spark, sink, m_small, m_big, checkpoint_path=chk)
    assert corpus._bloom_history(
        spark, corpus._bloom_dir(sink, m_small), -999
    ) is None
    _land(spark, str(land / "b2"), [(5, "epsilon zeta"), (6, "theta iota")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=m_big, strict=False,
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 4, 6}


def test_bloom_rebuild_excludes_uncommitted_docs(
    spark, tmp_path, monkeypatch
):
    """A crashed epoch's published-but-uncommitted docs must NOT be
    baked into the rebuilt filter: on replay under the new m the batch
    would find its own fingerprints in the filter and (strict=False)
    be silently dropped. checkpoint-bounded rebuild excludes them, so
    the replay re-admits the batch whole."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    m_small, m_big = 1 << 10, 1 << 16
    real_docs = corpus._publish_bloom_docs

    _land(spark, str(land / "b0"), [(1, "alpha beta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=m_small, strict=False,
    ).awaitTermination(120)

    armed = {"crash": True}

    def crash_after_docs(df, path, epoch_id):
        real_docs(df, path, epoch_id)
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("injected crash after bloom docs publish")

    monkeypatch.setattr(corpus, "_publish_bloom_docs", crash_after_docs)
    _land(spark, str(land / "b1"), [(2, "gamma delta"), (3, "epsilon zeta")])
    with _pytest.raises(StreamingQueryException, match="injected crash"):
        corpus.start_bloom_ingest(
            spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
            m_bits=m_small, strict=False,
        ).awaitTermination(120)

    # rebuild between the crash and the replay — bounded by the last
    # COMMITTED batch, so docs 2 and 3 are not in the new filter
    monkeypatch.setattr(corpus, "_publish_bloom_docs", real_docs)
    corpus.rebuild_bloom(spark, sink, m_small, m_big, checkpoint_path=chk)

    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=m_big, strict=False,
    ).awaitTermination(120)
    docs = spark.read.parquet(sink + "/docs").collect()
    assert sorted(r["doc_id"] for r in docs) == [1, 2, 3]  # nothing lost


def test_current_bloom_m_discovery_across_lifecycle(
    spark, tmp_path, monkeypatch
):
    """current_bloom_m closes the caller/rebuild disagreement window:
    fresh sink -> None; running stream -> its m; crash INSIDE the
    publish seam (new dir on disk, _REBUILT marker never written) ->
    still the OLD m (the old filter is intact and the rebuild is
    simply re-run); completed rebuild -> the new m, which drives a
    working gate; a SECOND rebuild -> newest marker wins."""
    import pytest as _pytest

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    m_small, m_big, m_mid = 64, 1 << 16, 4096

    assert corpus.current_bloom_m(spark, sink) is None  # fresh sink

    _land(spark, str(land / "b0"), [(1, "alpha beta"), (2, "gamma delta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA, m_bits=m_small
    ).awaitTermination(120)
    assert corpus.current_bloom_m(spark, sink) == m_small

    # kill in the publish seam: the new dir exists (unmarked -1), the
    # _REBUILT marker was never written -- discovery must stay on the
    # old, intact filter
    real = corpus._publish_rebuilt_bloom

    def crash_after_publish(words, new_dir):
        real(words, new_dir)
        raise RuntimeError("injected crash after rebuilt-filter publish")

    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", crash_after_publish)
    with _pytest.raises(RuntimeError, match="injected crash"):
        corpus.rebuild_bloom(spark, sink, m_small, m_big, checkpoint_path=chk)
    assert corpus.current_bloom_m(spark, sink) == m_small

    # re-run completes publish + marker + retire
    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", real)
    corpus.rebuild_bloom(spark, sink, m_small, m_big, checkpoint_path=chk)
    assert corpus.current_bloom_m(spark, sink) == m_big

    # the discovered m drives a working gate (strict=False: decisions
    # come purely from the rebuilt filter)
    _land(spark, str(land / "b1"),
          [(3, "alpha beta"), (4, "epsilon zeta")])
    corpus.start_bloom_ingest(
        spark, str(land) + "/*", sink, chk, DOC_SCHEMA,
        m_bits=corpus.current_bloom_m(spark, sink), strict=False,
    ).awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(sink + "/docs").collect()}
    assert got == {1, 2, 4}

    # second rebuild, crash again before retire: BOTH dirs now carry a
    # marker and the NEWEST marker (the m_mid rebuild) must win
    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", crash_after_publish)
    with _pytest.raises(RuntimeError, match="injected crash"):
        corpus.rebuild_bloom(spark, sink, m_big, m_mid, checkpoint_path=chk)
    assert corpus.current_bloom_m(spark, sink) == m_big  # marker not written
    monkeypatch.setattr(corpus, "_publish_rebuilt_bloom", real)
    corpus.rebuild_bloom(spark, sink, m_big, m_mid, checkpoint_path=chk)
    assert corpus.current_bloom_m(spark, sink) == m_mid


def test_bloom_gate_rejects_legacy_unversioned_layout(spark, tmp_path):
    """A sink written before the m-versioned layout (_batch_id=*
    directly under _bloom/) must fail loudly at the gate and at
    discovery — silently reading it as empty history would re-admit
    every historical fingerprint."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    sink = str(tmp_path / "sink")
    # forge the legacy layout: one delta partition directly in _bloom/
    spark.range(3).select(
        F.col("id").alias("word_idx"), F.lit(7).alias("bits"),
        F.lit(0).alias("_batch_id"),
    ).write.partitionBy("_batch_id").parquet(sink + "/_bloom")

    with _pytest.raises(RuntimeError, match="legacy"):
        corpus.current_bloom_m(spark, sink)
    batch = spark.createDataFrame([(1, "alpha beta")], DOC_SCHEMA)
    with _pytest.raises(RuntimeError, match="legacy"):
        corpus.admit_batch_bloom(batch, sink, 0, m_bits=64)
