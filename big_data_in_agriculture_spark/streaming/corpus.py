"""Incremental corpus ingestion: streaming arrivals, cross-batch dedup.

A training-data corpus grows by landed batches (crawl dumps, upload
drops); the pipeline must admit each document ONCE, ever — including
documents that re-arrive in later batches or on replay after failure.

``foreachBatch`` formulation:

1. within-batch: survivor-policy exact dedup on the normalized content
   fingerprint (min doc_id — deterministic under replay);
2. cross-batch: left-anti join against the fingerprints already in the
   sink — first batch to land a fingerprint wins, forever;
3. append the admitted rows (with their fingerprint column, which IS
   the dedup index).

Idempotence: a replayed batch re-runs steps 1-2 and admits nothing new
— the at-least-once delivery of foreachBatch composes to exactly-once
admission on the fingerprint key (same argument as the keyed-upsert
loader, sources/upsert.py).

Scale: the anti join is fingerprint ⋈ fingerprint — both sides hash
uniformly by construction. At 100 TB the sink side reads ONE column
(fingerprint) thanks to parquet column pruning; partitioning the sink
by a fingerprint prefix would turn it into a pruned point-lookup per
batch partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import text as TX


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """Explicit check that the sink holds COMMITTED data.

    The admission gates MUST distinguish "no sink yet" (first batch —
    gate everything through) from a TRANSIENT read failure (permissions,
    corrupt footer). Catching ``Exception`` around the sink read would
    silently disable dedup gating for the batch and admit duplicates;
    this inspects the filesystem instead, so a readable-but-broken
    sink still raises at read time and the stream retries.

    "Exists" means committed part files are present — a bare directory
    left by a crashed FIRST write (only ``_temporary/``) must count as
    "no sink yet", or every retry would fail schema inference forever;
    replay is already duplicate-safe via the fingerprint anti-join.
    A permissions problem surfaces here as an exception from the
    listing itself — still a retry, never a silent gate-bypass.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            return True
    return False


def _publish_admitted(df: DataFrame, path: str) -> None:
    """Append one batch's admitted rows — THE publish step of the exact
    gate. Module-level so crash-injection tests can kill the batch at
    exactly this boundary (same seam as ``versioned._repoint``)."""
    df.write.mode("append").parquet(path)


def _publish_index(df: DataFrame, path: str) -> None:
    """Append the admitted docs' LSH band keys (near-dup gate step 1)."""
    df.write.mode("append").parquet(path)


def _publish_docs(df: DataFrame, path: str) -> None:
    """Append the admitted docs themselves (near-dup gate step 2)."""
    df.write.mode("append").parquet(path)


def admit_batch(batch: DataFrame, sink_path: str) -> None:
    """Dedup one landed batch against itself and the sink, then append.

    Crash-safety: the single append either commits (Spark's job-commit
    protocol — no partial part files) or leaves the sink untouched;
    either way the foreachBatch replay re-derives admissions from the
    sink's committed fingerprints, so a crash in ANY window admits
    nothing twice (tested with injected kills in
    tests/test_streaming_corpus.py).
    """
    spark = batch.sparkSession
    fp = batch.withColumn("fingerprint", TX.fingerprint("text"))
    in_batch = (
        fp.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if _sink_exists(spark, sink_path):
        seen = spark.read.parquet(sink_path).select("fingerprint")
        fresh = in_batch.join(seen, "fingerprint", "left_anti")
    else:  # first batch: no sink yet
        fresh = in_batch
    _publish_admitted(fresh, sink_path)


def start_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream the landing dir; admit each fingerprint once ever."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: admit_batch(b, sink_path)
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Near-dup-aware admission (MinHash-LSH gate, cross-batch)
# ---------------------------------------------------------------------------

def _sig_jaccard(a, b):  # Column, Column -> Column
    """Estimated Jaccard = fraction of agreeing MinHash components."""
    return (
        F.aggregate(
            F.zip_with(a, b, lambda p, q: (p == q).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.size(a)
    )


def admit_batch_neardup(
    batch: DataFrame,
    sink_path: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> None:
    """Admit one landed batch, rejecting near-duplicates of ALL history.

    The streaming twin of the batch MinHash pipeline: a document is
    admitted only if (a) its exact fingerprint is new (within batch and
    ever), and (b) no LSH band bucket it occupies contains an admitted
    document whose signature-estimated Jaccard is ≥ threshold. The
    S-curve math is identical to ``llm.lsh_candidate_pairs`` — only the
    verify step differs: it compares stored SIGNATURES (estimated
    Jaccard, num_perm components) instead of re-shingling stored text,
    so the sink never re-reads document bodies.

    Sink layout (both hash-partitioned appends, replay-idempotent):
      sink/docs   — admitted rows + fingerprint + minhash signature
      sink/index  — (band, bucket, id) LSH index of admitted docs

    Scale: per batch, work is O(batch) signatures (map-only) + one
    equi-join of the batch's band keys against the index — a pruned
    two-column read of sink/index, uniform keys. Within-batch near-dup
    keeps the LOWEST doc_id of each verified pair (greedy, order-free
    deterministic; non-transitive chains admit the chain's survivors
    exactly like the batch `dedup_near`). At 100 TB the index join is
    the only shuffle and its payload is (band, bucket, id) triples.
    """
    from ..operators import llm

    spark = batch.sparkSession
    fp = batch.withColumn("fingerprint", TX.fingerprint("text"))
    in_batch = (
        fp.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    first_batch = not _sink_exists(spark, f"{sink_path}/docs")
    if first_batch:
        fresh = in_batch
    else:
        seen = spark.read.parquet(f"{sink_path}/docs").select("fingerprint")
        fresh = in_batch.join(seen, "fingerprint", "left_anti")

    rows_per_band = num_perm // bands
    sigs = llm.minhash_signatures(fresh, num_perm=num_perm)
    with_sig = fresh.join(
        sigs.withColumnRenamed("id", "doc_id"), "doc_id"
    )
    # Signatures feed three consumers (in-batch pairs, index probe,
    # final append) — localCheckpoint so the affine-min fold runs once.
    with_sig = with_sig.localCheckpoint(eager=True)
    sigs = with_sig.select(F.col("doc_id").alias("id"), "signature")

    # (a) within-batch near-dup: verified pair (id_a < id_b) rejects id_b
    cands = llm.lsh_candidate_pairs(sigs, bands, rows_per_band)
    sig_a = sigs.select(
        F.col("id").alias("id_a"), F.col("signature").alias("_sig_a")
    )
    sig_b = sigs.select(
        F.col("id").alias("id_b"), F.col("signature").alias("_sig_b")
    )
    rejected_in_batch = (
        cands.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(_sig_jaccard(F.col("_sig_a"), F.col("_sig_b")) >= threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )

    # (b) cross-batch: probe the admitted LSH index, verify vs admitted
    # signatures (read pruned to fingerprint+signature columns only)
    if not first_batch:
        probe = llm.lsh_band_keys(sigs, bands, rows_per_band)
        index = spark.read.parquet(f"{sink_path}/index")
        hits = (
            probe.join(
                index.select(
                    "band", "bucket", F.col("id").alias("_admitted_id")
                ),
                ["band", "bucket"],
            )
            .select("id", "_admitted_id")
            .distinct()
        )
        admitted_sigs = spark.read.parquet(f"{sink_path}/docs").select(
            F.col("doc_id").alias("_admitted_id"),
            F.col("signature").alias("_sig_b"),
        )
        rejected_cross = (
            hits.join(sig_a.withColumnRenamed("id_a", "id"), "id")
            .join(admitted_sigs, "_admitted_id")
            .filter(
                _sig_jaccard(F.col("_sig_a"), F.col("_sig_b")) >= threshold
            )
            .select(F.col("id").alias("doc_id"))
            .distinct()
        )
        rejected = rejected_in_batch.unionByName(rejected_cross).distinct()
    else:
        rejected = rejected_in_batch

    admitted = with_sig.join(rejected, "doc_id", "left_anti")
    admitted = admitted.localCheckpoint(eager=True)
    # Index FIRST: a crash between the two appends must not blind the
    # gate. Orphan index rows (index written, docs append lost) are
    # inert — cross-batch verification inner-joins admitted_sigs from
    # docs, so a bucket hit with no docs row drops out — whereas the
    # reverse order (docs without index) would permanently exempt those
    # documents from future near-dup candidacy.
    _publish_index(
        llm.lsh_band_keys(
            admitted.select(F.col("doc_id").alias("id"), "signature"),
            bands,
            rows_per_band,
        ),
        f"{sink_path}/index",
    )
    _publish_docs(admitted, f"{sink_path}/docs")


def start_neardup_ingest(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema,
    threshold: float = 0.8,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream the landing dir through the near-dup admission gate."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: admit_batch_neardup(
                b, sink_path, threshold=threshold
            )
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_quarantine_ingest(
    spark: SparkSession,
    source_glob: str,
    clean_sink: str,
    dead_letter_sink: str,
    checkpoint_path: str,
    schema,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream CSV landings; malformed rows go to a dead-letter sink.

    The streaming face of ``sources.text_formats``: a partner feed
    lands files continuously, one torn line must not kill the query OR
    silently vanish. The stream reads PERMISSIVE with the corrupt
    column declared; ``foreachBatch`` splits each micro-batch and
    writes clean rows and quarantined rows (partial parse + raw line)
    to separate parquet sinks. The dead-letter sink is replayable:
    after a parser/schema fix, re-ingest it as an ordinary batch.

    Replay safety: foreachBatch is at-least-once, so both sinks are
    keyed by the checkpoint batch id (``_batch_id=<id>`` partitions,
    dynamic overwrite) — a crash between the append and the checkpoint
    commit replays the batch into the SAME partition instead of
    duplicating rows.
    """
    from pyspark.sql import types as T

    from ..sources.text_formats import CORRUPT_COL, split_quarantine

    eff = schema
    if CORRUPT_COL not in schema.fieldNames():
        eff = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    stream = (
        spark.readStream.schema(eff)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true")
        .csv(source_glob)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        clean, bad = split_quarantine(batch_df)
        for df, path in ((clean, clean_sink), (bad, dead_letter_sink)):
            (
                df.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(path)
            )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Bloom-gated admission (memory-bounded cross-batch dedup)
# ---------------------------------------------------------------------------

def _bloom_dir(sink_path: str, m_bits: int) -> str:
    """The filter directory for one m. Versioning the directory by m
    is what makes resize (``rebuild_bloom``) safe: word indices from
    different m values are incompatible bit spaces — folding them
    together would set wrong bits (false rejections in strict=False)
    — so each m gets its own delta lineage and a rebuild SWITCHES
    directories rather than mixing them.

    LAYOUT HISTORY: before the m-versioning (round 7) deltas lived
    DIRECTLY under ``{sink}/_bloom/``. A sink written with that layout
    is rejected by the gate (``_reject_legacy_bloom_layout``) instead
    of silently treated as empty — which would re-admit every
    historical fingerprint without any error."""
    return f"{sink_path}/_bloom/m={m_bits}"


#: completion marker rebuild_bloom drops at the new filter dir's root
#: strictly after the -1 publish job returns — the discovery signal
#: current_bloom_m keys on (dynamic-overwrite jobs commit no _SUCCESS)
_REBUILT_MARKER = "_REBUILT"


def _reject_legacy_bloom_layout(spark: SparkSession, sink_path: str) -> None:
    """Raise if ``_batch_id=*`` partitions sit DIRECTLY under
    ``{sink}/_bloom/`` — the pre-m-versioning layout. Reading such a
    sink with the current layout returns None history (deltas
    orphaned), so previously admitted fingerprints would be silently
    re-admitted; compact_bloom/bloom_sink_stats at any m would no-op.
    The caller must migrate (move the deltas into ``_bloom/m=<their
    m_bits>/``) or rebuild via ``rebuild_bloom``. One listStatus per
    call — cheap enough to run per micro-batch."""
    jvm = spark._jvm
    bpath = jvm.org.apache.hadoop.fs.Path(f"{sink_path}/_bloom")
    fs = bpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(bpath):
        return
    legacy = [
        status.getPath().getName()
        for status in fs.listStatus(bpath)
        if status.isDirectory()
        and status.getPath().getName().startswith("_batch_id=")
    ]
    if legacy:
        raise RuntimeError(
            f"bloom sink {sink_path!r} uses the legacy un-versioned "
            f"filter layout ({len(legacy)} _batch_id=* partitions "
            "directly under _bloom/) — migrate them into "
            "_bloom/m=<m_bits>/ (they are orphaned under the current "
            "layout, and ignoring them would re-admit all history)"
        )


def current_bloom_m(spark: SparkSession, sink_path: str) -> int | None:
    """Discover the LIVE filter size of a bloom-gate sink.

    ``rebuild_bloom`` publishes the new filter into ``_bloom/m=<new>/``
    BEFORE deleting ``_bloom/m=<old>/``, so a crash between the two
    leaves both directories on disk; until round 8 the caller had to
    carry ``m_bits`` out-of-band and could disagree with a completed
    rebuild. Resolution rule, deterministic at every crash point:

    * no ``_bloom`` dir / no ``m=`` subdirs → ``None`` (fresh sink —
      caller picks its design m);
    * exactly one ``m=`` dir → that m (the running stream's);
    * several → prefer dirs carrying the ``_REBUILT`` marker, newest
      marker first (``rebuild_bloom`` writes it strictly AFTER the new
      filter's publish job returns and BEFORE the old dir retires, so
      a marked dir is a complete rebuild; parquet's dynamic-overwrite
      commit leaves no ``_SUCCESS``, hence the explicit marker). A
      crash anywhere before the marker — mid-publish or between
      publish and marker — leaves the new dir unmarked, and discovery
      stays on the old filter: among unmarked dirs, exactly one with a
      live stream lineage (any ``_batch_id=<n≥0>`` partition) wins;
      an unmarked dir holding only ``-1`` is a crashed rebuild and is
      never chosen (the rebuild is simply re-run). Anything else is
      not a state this lifecycle produces → raise.

    Kill-injected like the rest of the lifecycle
    (tests/test_streaming_corpus.py)."""
    _reject_legacy_bloom_layout(spark, sink_path)
    jvm = spark._jvm
    bpath = jvm.org.apache.hadoop.fs.Path(f"{sink_path}/_bloom")
    fs = bpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(bpath):
        return None
    mdirs = [
        status.getPath()
        for status in fs.listStatus(bpath)
        if status.isDirectory() and status.getPath().getName().startswith("m=")
    ]
    if not mdirs:
        return None
    if len(mdirs) == 1:
        return int(mdirs[0].getName()[2:])
    marked = []  # (marker mtime, m)
    for mpath in mdirs:
        marker = jvm.org.apache.hadoop.fs.Path(mpath, _REBUILT_MARKER)
        if fs.exists(marker):
            marked.append(
                (fs.getFileStatus(marker).getModificationTime(),
                 int(mpath.getName()[2:]))
            )
    if marked:
        return max(marked)[1]
    live = [
        p for p in mdirs
        if any(
            status.isDirectory()
            and status.getPath().getName().startswith("_batch_id=")
            and not status.getPath().getName().endswith("=-1")
            for status in fs.listStatus(p)
        )
    ]
    if len(live) == 1:
        return int(live[0].getName()[2:])
    raise RuntimeError(
        f"bloom sink {sink_path!r} has multiple filter directories "
        f"({sorted(p.getName() for p in mdirs)}) and none resolves to "
        "a completed rebuild or a unique live stream lineage — not a "
        "crash state the rebuild lifecycle produces; inspect the sink"
    )


def _publish_bloom_words(df: DataFrame, path: str, epoch_id: int) -> None:
    """Publish one batch's (word_idx, bits) Bloom delta into its OWN
    ``_batch_id`` partition (dynamic overwrite — replay rewrites the
    same partition instead of appending a duplicate delta).
    Module-level crash-injection seam."""
    (
        df.withColumn("_batch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def _publish_bloom_docs(df: DataFrame, path: str, epoch_id: int) -> None:
    """Publish one batch's admitted docs into its own ``_batch_id``
    partition (dynamic overwrite). Module-level crash-injection seam."""
    (
        df.withColumn("_batch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def _bloom_history(
    spark: SparkSession, path: str, epoch_id: int
) -> DataFrame | None:
    """All committed partitions of a bloom-gate sink EXCEPT the current
    epoch's. Excluding our own partition makes replay EXACTLY re-derive
    the first attempt: a crashed attempt's half-published partition is
    invisible to the gate and simply overwritten. Returns None when no
    prior-epoch partition exists (first batch)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    prior = [
        status.getPath().getName()
        for status in fs.listStatus(hpath)
        if status.isDirectory()
        and status.getPath().getName().startswith("_batch_id=")
        and status.getPath().getName() != f"_batch_id={epoch_id}"
    ]
    if not prior:
        return None
    return spark.read.parquet(path).filter(F.col("_batch_id") != epoch_id)


def admit_batch_bloom(
    batch: DataFrame,
    sink_path: str,
    epoch_id: int,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    strict: bool = True,
) -> None:
    """Admit one landed batch with a Bloom filter gating history reads.

    The memory-bounded evolution of ``admit_batch``: that gate re-reads
    the ENTIRE sink fingerprint column every micro-batch (pruned, but
    O(admitted history) per batch — at 100 TB, billions of rows scanned
    to admit thousands). Here history is compressed into an m-bit Bloom
    filter kept as per-batch (word_idx, bits) delta partitions next to
    the sink, folded by ONE words-sized bit_or aggregate per batch:

    * ``maybe_dup = false`` docs are PROVABLY new (a Bloom filter has
      no false negatives) — admitted with zero history I/O;
    * ``maybe_dup = true`` docs take the precise path: ``strict=True``
      (default) anti-joins just those rows against the sink
      fingerprints — the full exactly-once guarantee, with the
      expensive scan amortized to (true re-arrivals + FPR·batch) rows;
      ``strict=False`` rejects them outright — ZERO history reads
      ever, trading a bounded false-rejection rate (fill_frac^k, see
      ``profile.bloom_stats``) for throughput, the web-crawl mode
      where a lost near-miss costs nothing.

    Replay model (tested with injected kills in both publish windows):
    both sinks are ``_batch_id``-partitioned dynamic overwrites, and
    every gating read EXCLUDES the current epoch's partitions — so a
    replayed batch sees exactly the history the first attempt saw,
    re-derives the identical admission set (every step deterministic),
    and REWRITES its own partitions instead of appending duplicates.
    That makes the gate exactly-once in BOTH modes with no publish-
    order subtleties: an alternative append-based delta design is
    replay-UNSAFE in ``strict=False`` (the crashed attempt's bits flag
    the replayed batch as dup and the whole batch is silently dropped).
    One checkpoint lineage per sink — epoch ids restart at 0 with a
    fresh checkpoint, which would overwrite live partitions.
    """
    from ..operators.profile import bloom_build, bloom_probe

    spark = batch.sparkSession
    # a sink written before the m-versioned layout must fail loudly,
    # not read as empty history (ADVICE round 7)
    _reject_legacy_bloom_layout(spark, sink_path)
    fp = batch.withColumn("fingerprint", TX.fingerprint("text"))
    in_batch = (
        fp.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    bloom_path = _bloom_dir(sink_path, m_bits)
    docs_path = f"{sink_path}/docs"
    deltas = _bloom_history(spark, bloom_path, epoch_id)
    if deltas is not None:
        words = deltas.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
        flags = bloom_probe(
            in_batch.select("doc_id", F.col("fingerprint").alias("fp")),
            words,
            "fp",
            "doc_id",
            m_bits,
            k_hashes,
        )
        in_batch = in_batch.join(flags, "doc_id")
        novel = in_batch.filter(~F.col("maybe_dup")).drop("maybe_dup")
        flagged = in_batch.filter(F.col("maybe_dup")).drop("maybe_dup")
        if strict:
            seen = _bloom_history(spark, docs_path, epoch_id)
            if seen is None:
                # bloom deltas exist but no committed docs partition:
                # the sink is corrupt (or a foreign filter was dropped
                # in) — admitting on it could re-admit history. An
                # explicit raise, not an assert: asserts vanish under
                # python -O and this is a data-integrity guard.
                raise RuntimeError(
                    f"bloom gate sink {sink_path!r} has delta "
                    "partitions but no prior docs partition — "
                    "refusing to run the strict precise path against "
                    "a missing history"
                )
            flagged = flagged.join(
                seen.select("fingerprint"), "fingerprint", "left_anti"
            )
        else:  # throughput mode: every flagged doc is rejected
            flagged = flagged.filter(F.lit(False))
        fresh = novel.unionByName(flagged)
    else:  # first batch: no filter yet
        fresh = in_batch
    # two consumers (delta build + docs write) — materialize once
    fresh = fresh.localCheckpoint(eager=True)
    _publish_bloom_words(
        bloom_build(
            fresh.select(F.col("fingerprint").alias("fp")),
            "fp",
            m_bits,
            k_hashes,
        ),
        bloom_path,
        epoch_id,
    )
    _publish_bloom_docs(fresh, docs_path, epoch_id)


def start_bloom_ingest(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    strict: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream the landing dir through the Bloom admission gate."""
    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, epoch: admit_batch_bloom(
                b, sink_path, epoch,
                m_bits=m_bits, k_hashes=k_hashes, strict=strict,
            )
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _last_committed_batch(
    spark: SparkSession, checkpoint_path: str
) -> int | None:
    """Largest batch id with a commit entry in a Structured Streaming
    checkpoint (``<checkpoint>/commits/<batchId>``). ``None`` when no
    batch has committed yet. The commit log may purge OLD entries
    (``minBatchesToRetain``), so membership of an id is not testable —
    but the MAX survives purging, and any id ≤ max is committed
    (commits are sequential)."""
    jvm = spark._jvm
    cpath = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_path}/commits")
    fs = cpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(cpath):
        return None
    ids = [
        int(status.getPath().getName())
        for status in fs.listStatus(cpath)
        if status.getPath().getName().isdigit()
    ]
    return max(ids) if ids else None


def compact_bloom(
    spark: SparkSession,
    sink_path: str,
    checkpoint_path: str | None = None,
    m_bits: int = 1 << 20,
) -> None:
    """Fold committed Bloom delta partitions into one reserved partition.

    The per-batch delta layout keeps every gating read a words-sized
    fold, but at high batch counts the fold input grows as
    O(batches × words). Compaction bit_or-folds the current partitions
    into ``_batch_id = -1`` (stream epochs are non-negative — no live
    batch collides) and THEN deletes exactly the partitions it folded.

    Crash-safe at every boundary because bit_or is idempotent: after
    the fold lands, every not-yet-deleted delta is a SUBSET of the
    compacted bits, so the folded filter is bit-identical no matter
    where a crash stops the deletes — there is no swap window in which
    the filter is missing or weaker (an earlier delete-then-rename
    design had exactly that window: a crash between the two would
    blind the gate entirely and re-admit history). Deltas published
    by a concurrently running stream AFTER the fold's snapshot are
    not in the captured list and survive untouched.

    **Which partitions are safe to fold.** A delta published by a
    CRASHED, not-yet-checkpoint-committed epoch must NOT be folded:
    once its bits live in ``_batch_id=-1`` the replay's gate can no
    longer exclude them by epoch, so in ``strict=False`` the replayed
    batch is flagged dup and silently dropped — exactly the data loss
    the replay model exists to prevent. Pass ``checkpoint_path`` (the
    stream's checkpoint location) and the fold is bounded to
    ``_batch_id ≤`` the last COMMITTED batch id — committed epochs
    never replay, so folding them is always safe, even concurrently
    with a live or crashed stream. Without ``checkpoint_path`` the
    fold takes every partition, which is safe ONLY when the stream is
    quiesced with no failed-uncommitted attempt pending — a hard
    precondition on the caller.
    """
    bloom_path = _bloom_dir(sink_path, m_bits)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(bloom_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    fold_below = None  # fold everything (quiesced-stream mode)
    if checkpoint_path is not None:
        last = _last_committed_batch(spark, checkpoint_path)
        if last is None:
            return  # nothing committed yet — nothing safe to fold
        fold_below = last
    folded = [
        name
        for status in fs.listStatus(hpath)
        if (name := status.getPath().getName()).startswith("_batch_id=")
        and name != "_batch_id=-1"
        and (fold_below is None or int(name.split("=", 1)[1]) <= fold_below)
    ]
    if not folded:
        return
    src = spark.read.parquet(bloom_path)  # includes any prior -1 partition
    if fold_below is not None:
        # -1 ≤ any committed id, so the prior compacted partition
        # always folds; uncommitted (> last committed) deltas do not
        src = src.filter(F.col("_batch_id") <= fold_below)
    words = (
        src.groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
        .withColumn("_batch_id", F.lit(-1))
    )
    # materialize BEFORE writing into the path being read — overwriting
    # a partition while a lazy plan still scans it is undefined; the
    # fold is words-sized, so the checkpoint is trivially cheap
    words = words.localCheckpoint(eager=True)
    (
        words.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(bloom_path)
    )
    for name in folded:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{bloom_path}/{name}"), True)


def bloom_sink_stats(
    spark: SparkSession,
    sink_path: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
) -> DataFrame:
    """Filter-health of a bloom-gate sink: fill fraction + expected FPR.

    The operator's resize trigger (`profile.bloom_stats` over the
    folded delta partitions): in strict mode rising fill means a
    growing share of each batch pays the precise path; in non-strict
    mode it IS the false-rejection rate — at fill ≥ 0.5 the filter is
    past its design point and the stream should be re-based onto a
    bigger m (admit history into a fresh wider filter — one
    words-sized rebuild from the docs sink's fingerprints).
    """
    from ..operators.profile import bloom_stats

    words = _bloom_history(spark, _bloom_dir(sink_path, m_bits), epoch_id=-999)
    if words is None:
        empty = spark.createDataFrame([], "word_idx long, bits long")
        return bloom_stats(empty, m_bits, k_hashes)
    folded = words.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    return bloom_stats(folded, m_bits, k_hashes)


def _publish_rebuilt_bloom(words: DataFrame, new_dir: str) -> None:
    """Publish a rebuilt filter's folded words into the new m's
    directory as the reserved ``_batch_id=-1`` partition (dynamic
    overwrite: deltas a post-rebuild stream already published into
    the new directory survive — their bits are a subset of any later
    rebuild from the same docs). Module-level crash-injection seam."""
    (
        words.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(new_dir)
    )


def rebuild_bloom(
    spark: SparkSession,
    sink_path: str,
    m_bits_old: int,
    m_bits_new: int,
    k_hashes: int = 7,
    checkpoint_path: str | None = None,
) -> None:
    """Re-base a bloom-gate sink onto a differently-sized filter.

    The lifecycle step ``bloom_sink_stats`` exists to trigger: when
    fill_frac passes the design point (≥ 0.5), non-strict mode's
    false-rejection rate degrades and strict mode pays the precise
    path for a growing share of each batch. The fix is a larger m —
    but word indices from different m values are incompatible bit
    spaces, so the new filter must be REBUILT from the ground truth
    (the docs sink's fingerprints), never converted from the old bits.

    Protocol (each step idempotent, any crash point recoverable by
    re-running):

    1. bloom_build over the docs sink's committed fingerprints at
       ``m_bits_new`` — one words-sized aggregate, output bounded at
       ceil(m_new/63) rows regardless of history size;
    2. publish into ``_bloom/m=<m_new>/`` as ``_batch_id=-1`` (the
       crash-injection seam);
    3. only after that write completes, delete ``_bloom/m=<m_old>/``.

    There is NO window with a missing or weaker filter: the gate's
    directory choice is parameter-driven (``start_bloom_ingest``'s
    ``m_bits``), and the caller switches to ``m_bits_new`` only after
    this function returns. A crash before step 3 leaves the old
    directory intact — the stream can keep running at ``m_bits_old``
    and the rebuild be re-run.

    Replay safety across the resize: with ``checkpoint_path`` given,
    only docs partitions with ``_batch_id`` ≤ the last COMMITTED batch
    feed the new filter. A crashed epoch's published-but-uncommitted
    docs are excluded, so its replay under the new m re-derives the
    original admission decision instead of finding its own
    fingerprints pre-baked into the filter and (in strict=False)
    silently dropping the whole batch — the same bound
    ``compact_bloom`` applies to deltas. Without ``checkpoint_path``
    the docs read is unbounded, which is safe only for a quiesced
    stream with no failed attempt pending.
    """
    from ..operators.profile import bloom_build

    if m_bits_new == m_bits_old:
        raise ValueError(
            "rebuild_bloom needs a different m — same-m maintenance is "
            "compact_bloom's job"
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    docs_path = f"{sink_path}/docs"
    dpath = jvm.org.apache.hadoop.fs.Path(docs_path)
    fs = dpath.getFileSystem(conf)
    old_dir = _bloom_dir(sink_path, m_bits_old)
    if not fs.exists(dpath):
        # nothing ever admitted: an empty filter is the correct rebuild
        fs.delete(jvm.org.apache.hadoop.fs.Path(old_dir), True)
        return
    src = spark.read.parquet(docs_path)
    if checkpoint_path is not None:
        last = _last_committed_batch(spark, checkpoint_path)
        if last is None:
            raise RuntimeError(
                "docs partitions exist but the checkpoint has no "
                "committed batch — refusing to bake uncommitted docs "
                "into the rebuilt filter"
            )
        src = src.filter(F.col("_batch_id") <= last)
    words = bloom_build(
        src.select(F.col("fingerprint").alias("fp")),
        "fp",
        m_bits_new,
        k_hashes,
    ).withColumn("_batch_id", F.lit(-1))
    new_dir = _bloom_dir(sink_path, m_bits_new)
    _publish_rebuilt_bloom(words, new_dir)
    # completion marker strictly after the publish job returns: the
    # signal current_bloom_m resolves the swap window on (step 2.5)
    marker = jvm.org.apache.hadoop.fs.Path(f"{new_dir}/{_REBUILT_MARKER}")
    fs.create(marker, True).close()
    # retire the old filter only after the new one is fully published
    fs.delete(jvm.org.apache.hadoop.fs.Path(old_dir), True)
