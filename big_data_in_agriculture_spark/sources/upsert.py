"""Keyed upsert sink (reference K4/K5): last-writer-wins MERGE on a PK.

Reference semantics (``flows/load_hourly_parquet_to_postgres.py:20-41``):
``INSERT … ON CONFLICT (region, ts) DO UPDATE SET col = EXCLUDED.col``
with the SET list built dynamically from whatever columns arrive —
re-loading the same file is idempotent; re-loading a changed file wins.

This engine's mart store is parquet (no Postgres in the harness), so
the upsert is a read-merge-write on the primary key:

    merged = incoming ∪ (existing ∖ keys(incoming))

which is exactly MERGE WHEN MATCHED THEN UPDATE ALL / WHEN NOT MATCHED
THEN INSERT ALL. With Delta/Iceberg as the table format the same call
becomes a real ``MERGE INTO`` and the full-table rewrite disappears;
the function signature is the stable contract.

Scale notes:
* the anti-join is a shuffled hash join on the PK — no collect, no
  driver-side diff;
* writes stage to a scratch directory, so a failed job never corrupts
  the live mart (the reference got this from per-file ``os.replace``
  S3); the final swap is two renames — see ``upsert_parquet`` for the
  exact crash-window contract;
* at 100 TB you partition the mart (marts.py) and MERGE per partition
  (the loader passes only the affected partitions), not whole-table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOURLY_KEY = ["region", "ts"]
DAILY_KEY = ["region", "day"]


def _validate_key(df: DataFrame, key: list[str]) -> None:
    """K5: loader precondition — every key column must be present."""
    missing = [k for k in key if k not in df.columns]
    if missing:
        raise ValueError(f"upsert input missing key columns {missing}; has {df.columns}")


def _dedup_incoming(incoming: DataFrame, key: list[str]) -> DataFrame:
    """Collapse incoming duplicates to one deterministic survivor."""
    others = [c for c in incoming.columns if c not in key]
    return (
        incoming.groupBy(*key)
        .agg(F.max(F.struct(*others)).alias("_s"))
        .select(*key, *[F.col(f"_s.{c}").alias(c) for c in others])
    )


def merge_frames(existing: DataFrame, incoming: DataFrame, key: list[str]) -> DataFrame:
    """Pure MERGE: incoming rows win on key collision; others survive.

    Incoming duplicates on the key collapse to one arbitrary-but-
    deterministic survivor first (max over a struct of the non-key
    columns) so the result is key-unique — same end state as the
    reference's sequential ON CONFLICT loop applying the last batch row.

    Precondition: ``existing`` is key-unique (a PK'd table). Every
    table this module writes satisfies it; a duplicate-keyed
    ``existing`` passes through un-collapsed, exactly like a Postgres
    table whose PK constraint was never enforced.
    """
    _validate_key(incoming, key)
    deduped = _dedup_incoming(incoming, key)
    keep = existing.join(deduped.select(*key), key, "left_anti")
    return keep.unionByName(deduped, allowMissingColumns=True)


def upsert_parquet(
    spark: SparkSession, incoming: DataFrame, path: str, key: list[str]
) -> int:
    """Idempotent keyed load into a parquet table at ``path``.

    Returns the row count of the merged table. Publication is
    stage-then-swap: a failed STAGE write leaves the live table
    untouched (the stage dir is cleaned up). The swap itself is two
    directory renames — there is a microseconds-wide crash window
    between them where ``path`` is absent with the previous snapshot
    intact at ``<path>.old-*`` (plain filesystems have no atomic
    directory exchange; a table format with a transaction log — Delta,
    Iceberg — closes this gap and is the drop-in upgrade).
    """
    _validate_key(incoming, key)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = merge_frames(existing, incoming, key)
    else:
        merged = _dedup_incoming(incoming, key)
    stage = f"{path}.stage-{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").parquet(stage)
        n = spark.read.parquet(stage).count()
    except Exception:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(stage, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return n


def upsert_parquet_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key: list[str],
    partition_cols: list[str],
) -> int:
    """Keyed upsert that rewrites ONLY the partitions a batch touches.

    The 100 TB form of ``upsert_parquet``: the mart is hive-partitioned
    on ``partition_cols`` (which must be derivable columns of every
    incoming row and a prefix of the key's locality — a key never moves
    between partitions). The affected partition list is collected from
    the incoming batch (driver-scale: partitions-per-batch is bounded
    by the load cadence, e.g. a daily load touches one day), baked into
    a static IN-filter so the existing-side read PRUNES to those
    directories, and the merged slice is written back with dynamic
    partition overwrite — untouched partitions are never read, never
    rewritten, and stay live throughout.

    Returns the merged row count of the touched slice.
    """
    _validate_key(incoming, key)
    _validate_key(incoming, partition_cols)
    inc = _dedup_incoming(incoming, key)

    parts = inc.select(*partition_cols).distinct().collect()
    if not parts:
        return 0
    pred = None
    for row in parts:
        clause = None
        for c in partition_cols:
            this = F.col(c) == F.lit(row[c])
            clause = this if clause is None else (clause & this)
        pred = clause if pred is None else (pred | clause)

    if os.path.exists(path):
        existing_slice = spark.read.parquet(path).filter(pred)
        merged = merge_frames(existing_slice, inc, key)
    else:
        merged = inc
    # Materialize before the overwrite: the merged plan READS the same
    # partitions the dynamic overwrite is about to replace.
    merged = merged.localCheckpoint(eager=True)

    writer = (
        merged.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
    )
    writer.parquet(path)
    return merged.count()
