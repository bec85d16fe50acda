"""Partitioned parquet marts (reference K1/K2/S9).

Reference layout (``dask_jobs/aggregate_hourly.py:120-123``,
``aggregate_daily.py:78-82``):

* hourly — ``<root>/region=<r>/year=<y>/month=<mm>/…`` (one file per
  region-month in the reference; here one *directory* per partition —
  row-level parity, not byte-level, per SURVEY.md §7.4)
* daily  — ``<root>/year=<y>/month=<mm>/…`` (all regions in one file)

Spark's native hive-partition discovery replaces the reference's manual
``glob("region=*/year=Y/month=MM.parquet")``: reading the root yields
the partition columns back, and partition predicates prune directories
before any file I/O (S9 → free partition pruning, SURVEY.md §4.1).

Scale notes:
* ``partitionBy`` writes one directory per partition value; the derived
  year/month columns are low-cardinality so the partition count stays
  sane at 100 TB (regions × months, not timestamps).
* Writers repartition by the partition columns first so each task
  writes one partition directory (avoids the many-small-files problem
  of every task holding a sliver of every partition).
* ``sortWithinPartitions("ts")`` reproduces the reference's per-file
  time order (O1) inside each written file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOURLY_PARTITIONS = ["region", "year", "month"]
DAILY_PARTITIONS = ["year", "month"]


def _with_year_month(df: DataFrame, time_col: str) -> DataFrame:
    """Derive zero-pad-free partition columns from the time axis (C11).

    Spark renders partition values as ``month=1`` (int), not ``month=01``
    — the discovery read returns them as ints either way, so the
    zero-padding of the reference's file names is irrelevant to
    semantics.
    """
    return df.withColumn("year", F.year(time_col)).withColumn(
        "month", F.month(time_col)
    )


def _hadoop_fs(spark: SparkSession, root: str):
    """Resolve (FileSystem, Path) for ``root`` via the Hadoop FS API.

    Mart roots are not necessarily local paths — on a cluster they are
    ``hdfs://`` / ``s3a://`` URIs that Python's ``os``/``open`` cannot
    touch. ``Path.getFileSystem`` dispatches on the URI scheme (bare
    paths resolve against ``fs.defaultFS``, which in local mode is the
    local filesystem), so the sidecar lands next to the data wherever
    Spark wrote it.
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def _write_schema_sidecar(df: DataFrame, root: str) -> None:
    """Persist the mart schema as ``_schema.json`` next to the data.

    Two reasons: (1) an EMPTY mart write under partitionBy produces no
    parquet files at all, so a later read has nothing to infer a
    schema from and fails — the sidecar keeps empty marts readable;
    (2) with ``trust_sidecar=True`` a 100 TB reader skips footer
    sampling entirely and plans straight from the recorded schema.

    Publish order is data-then-sidecar: the parquet job commits first,
    so a crash in the gap leaves an older sidecar next to newer data —
    never a sidecar describing data that does not exist. ``read_mart``
    closes the residual staleness window by checking the sidecar
    against the footer schema (data wins on mismatch). Written via the
    Hadoop FileSystem API with a temp+rename publish (rename is atomic
    on HDFS/local; on object stores it degrades to copy+delete, same
    as every other rename-based committer).
    """
    import json

    spark = df.sparkSession
    fs, root_path, jvm = _hadoop_fs(spark, root)
    fs.mkdirs(root_path)
    tmp = jvm.org.apache.hadoop.fs.Path(root_path, "_schema.json.tmp")
    final = jvm.org.apache.hadoop.fs.Path(root_path, "_schema.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(json.loads(df.schema.json())).encode()))
    finally:
        out.close()
    if fs.exists(final):
        fs.delete(final, False)
    fs.rename(tmp, final)


def _read_schema_sidecar(spark: SparkSession, root: str):
    import json

    from pyspark.sql.types import StructType

    fs, root_path, jvm = _hadoop_fs(spark, root)
    path = jvm.org.apache.hadoop.fs.Path(root_path, "_schema.json")
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return StructType.fromJson(json.loads(raw))


def _sidecar_compatible(sidecar, inferred) -> bool:
    """Order-insensitive (name, type) match — partition discovery moves
    partition columns to the end, so field ORDER legitimately differs
    between the written frame and the discovered read."""
    as_set = lambda s: {(f.name, f.dataType.simpleString()) for f in s.fields}
    return as_set(sidecar) == as_set(inferred)


def write_hourly_mart(df: DataFrame, root: str, mode: str = "overwrite") -> None:
    """K1: hourly mart partitioned by (region, year, month).

    ``partitionOverwriteMode=dynamic`` makes a re-run of one month
    replace ONLY the partitions it produced — the reference's
    one-file-per-month overwrite semantics (idempotent re-runs) without
    clobbering sibling months.
    """
    out = _with_year_month(df, "ts")
    (
        out.repartition(*[F.col(c) for c in HOURLY_PARTITIONS])
        .sortWithinPartitions("ts")
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*HOURLY_PARTITIONS)
        .parquet(root)
    )
    _write_schema_sidecar(out, root)


def write_daily_mart(df: DataFrame, root: str, mode: str = "overwrite") -> None:
    """K2: daily mart partitioned by (year, month) — all regions together."""
    out = _with_year_month(df, "day")
    (
        out.repartition(*[F.col(c) for c in DAILY_PARTITIONS])
        .sortWithinPartitions("region", "day")
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*DAILY_PARTITIONS)
        .parquet(root)
    )
    _write_schema_sidecar(out, root)


def refresh_daily_mart(
    spark: SparkSession,
    hourly_root: str,
    daily_root: str,
    year: int,
    month: int,
    agg_specs: dict[str, list[str]] | None = None,
) -> None:
    """Hypertable-style continuous-aggregate refresh for one month.

    The TimescaleDB/materialized-rollup pattern on plain Spark + parquet:
    re-derive ONE (year, month) slice of the daily mart from the hourly
    mart and swap exactly that partition in (dynamic partition
    overwrite). Re-runs are idempotent; untouched months never rewrite;
    the hourly read prunes to the refreshed month's directories, so the
    refresh cost scales with the slice, not the mart.
    """
    from ..operators.daily import daily_rollup

    hourly = read_mart(spark, hourly_root, year=year, month=month).drop(
        "year", "month"
    )
    daily = daily_rollup(hourly, agg_specs=agg_specs)
    write_daily_mart(daily, daily_root, mode="overwrite")


def read_mart(
    spark: SparkSession,
    root: str,
    regions: list[str] | None = None,
    year: int | None = None,
    month: int | None = None,
    trust_sidecar: bool = False,
) -> DataFrame:
    """S9: partition-discovery read with pruning predicates.

    The filters target partition columns, so Catalyst prunes whole
    directories at planning time — a single-region read of a 100 TB
    mart touches only that region's files (verify with
    ``plans.explain.partition_filters``).

    Sidecar handling: by default the ``_schema.json`` sidecar is
    cross-checked against the footer-inferred schema (one footer read —
    Spark infers from a single file with mergeSchema off, so the check
    is O(1), not O(files)); on mismatch the DATA wins, covering the
    crash-between-data-and-sidecar staleness window. The sidecar is
    authoritative only when the mart has no parquet files to infer
    from (the empty-mart case it exists for). ``trust_sidecar=True``
    skips the probe and plans straight from the recorded schema — the
    100 TB fast path for marts published solely by this module's
    writers, where data+sidecar move together.
    """
    schema = _read_schema_sidecar(spark, root)
    if schema is not None and not trust_sidecar:
        try:
            inferred = spark.read.parquet(root).schema
        except Exception:
            inferred = None  # no files — empty mart, sidecar authoritative
        if inferred is not None and not _sidecar_compatible(schema, inferred):
            schema = None  # stale sidecar: the data's own schema wins
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(root)
    if regions is not None:
        df = df.filter(F.col("region").isin(regions))
    if year is not None:
        df = df.filter(F.col("year") == year)
    if month is not None:
        df = df.filter(F.col("month") == month)
    return df


def compact_mart(
    spark: SparkSession,
    root: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    sort_cols: list[str] | None = None,
) -> None:
    """Rewrite a mart's partitions into few large files (small-files fix).

    Streaming appends and per-batch upserts accumulate many small
    files; at scale each costs a task + a namenode op + a parquet
    footer read, and row-group statistics lose selectivity. Compaction
    re-reads the mart, repartitions on the partition columns so each
    output directory is written by ``files_per_partition`` tasks, and
    overwrites atomically via Spark's dynamic partition overwrite (only
    directories present in the frame are replaced — same idempotence
    story as the mart writers). ``sort_cols`` restores the in-file
    order contract (O1) and tightens min/max stats for data skipping.
    """
    df = spark.read.parquet(root)
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition <= 1:
        # all rows of a partition value hash to one task → one file/dir
        compacted = df.repartition(*parts)
        drop_salt = None
    else:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        compacted = df.withColumn("_salt", salt).repartition(*parts, F.col("_salt"))
        drop_salt = "_salt"
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*partition_cols, *sort_cols)
    if drop_salt:
        compacted = compacted.drop(drop_salt)
    (
        compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(root)
    )


def expire_partitions(
    spark: SparkSession,
    root: str,
    keep_from: tuple[int, int],
    dry_run: bool = False,
) -> list[str]:
    """Retention: drop year/month partition directories older than
    ``keep_from`` (inclusive cutoff) from a mart laid out with hive
    ``year=YYYY/month=MM`` partitions at any nesting depth.

    Partition discovery is filesystem-metadata only (directory listing
    — no data files are opened), deletion is per-directory (the same
    granularity the writers commit at), and the surviving data is
    untouched on disk — no rewrite, no table-level lock. Returns the
    deleted (or, with ``dry_run``, would-be-deleted) partition paths,
    sorted, so callers can log an audit trail. Mirrors the lifecycle
    operation warehouses run nightly; on Delta/Iceberg this becomes
    ``DELETE WHERE`` + ``VACUUM`` / ``expire_snapshots``.
    """
    import re as _re
    import shutil
    from pathlib import Path

    cutoff = keep_from[0] * 100 + keep_from[1]
    doomed: list[str] = []
    for month_dir in sorted(Path(root).rglob("month=*")):
        if not month_dir.is_dir():
            continue
        ym = _re.search(r"year=(\d+)/month=(\d+)$", str(month_dir))
        if not ym:
            continue
        if int(ym.group(1)) * 100 + int(ym.group(2)) < cutoff:
            doomed.append(str(month_dir))
    for path in doomed:
        if not dry_run:
            shutil.rmtree(path)
    if not dry_run:
        # drop now-empty year= directories so partition discovery
        # doesn't trip on dataless branches
        for year_dir in sorted(Path(root).rglob("year=*")):
            if year_dir.is_dir() and not any(year_dir.iterdir()):
                year_dir.rmdir()
    return doomed


def small_file_report(
    spark: SparkSession,
    root: str,
    threshold_bytes: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Per-directory small-file audit — the compaction trigger signal.

    Streaming appends and per-batch upserts accrete files far below the
    ideal scan unit; at 100 TB the symptom is task-launch overhead and
    footer-read storms, and the fix is ``compact_mart``. This walks the
    dataset's directories (driver-side FS listing — metadata only, no
    data read) and reports, per leaf directory: file count, bytes, and
    how many files sit under the threshold. Feed the worst rows to
    ``compact_mart`` rather than compacting everything on a schedule.
    """
    import os

    rows = []
    for dirpath, _dirs, files in os.walk(root):
        parquets = [f for f in files if f.endswith(".parquet")]
        if not parquets:
            continue
        sizes = [os.path.getsize(os.path.join(dirpath, f)) for f in parquets]
        rows.append(
            (
                os.path.relpath(dirpath, root),
                len(sizes),
                int(sum(sizes)),
                sum(1 for s in sizes if s < threshold_bytes),
            )
        )
    schema = (
        "partition string, n_files long, total_bytes long, n_small long"
    )
    return spark.createDataFrame(
        sorted(rows), schema=schema
    ).orderBy(F.col("n_small").desc(), "partition")
