"""Z-order clustered writes: multi-dimensional data skipping.

Partition pruning (sources/marts.py) skips whole directories on the
partition key; parquet row-group min/max stats skip *files* — but only
for columns the file layout is clustered on. A sort on one column
gives perfect skipping on that column and none on any other; Z-order
(Morton) interleaving gives GOOD skipping on every participating
column at once, which is why Delta/Iceberg `OPTIMIZE ZORDER BY` exists.
A 100 TB table queried by both `user_id` and `value` predicates wants
exactly this layout.

Design (two passes, nothing driver-heavy):

1. a quantile pass computes per-column bucket boundaries
   (`approxQuantile`, one aggregate job; boundaries are a few KB on
   the driver regardless of table size);
2. each row maps its columns to rank buckets (broadcast boundaries as
   a literal sorted array — `array_position`-style binary search via
   `F.aggregate` fold over ≤256 boundaries), bits interleave into one
   Morton key with pure integer Column math, and the frame is
   `repartitionByRange(morton)` + `sortWithinPartitions(morton)` so
   every output file owns a compact Z-curve segment.

The write itself stays a plain parquet write — min/max footer stats
then do the skipping on ANY engine reading the files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (256 buckets); 2-4 dims → 16-32 bit Morton keys.
_BITS = 8


def _bucket(col: Column, boundaries: list[float]) -> Column:
    """Rank bucket of `col` in [0, 2^_BITS) via broadcast boundaries.

    boundaries is the sorted (2^_BITS − 1)-quantile list; the bucket is
    the count of boundaries ≤ value — a fold over a literal array, no
    join, no shuffle, executes inside codegen.
    """
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0),
    )


def _morton(buckets: list[Column], bits: int = _BITS) -> Column:
    """Interleave the bit planes of the bucket ids into one long."""
    n = len(buckets)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(buckets):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + d))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`."""
    df.sparkSession  # fail fast on a closed session
    quantiles = [i / (1 << _BITS) for i in range(1, 1 << _BITS)]
    bounds = df.approxQuantile(cols, quantiles, 0.001)
    zkey = _morton(
        [_bucket(F.col(c), bounds[i]) for i, c in enumerate(cols)]
    )
    (
        df.withColumn("_z", zkey)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_ratio(path: str, col: str, value: float) -> float:
    """Fraction of files whose [min, max] footer range EXCLUDES value.

    Diagnostic twin of the optimizer's stats-based skipping: what share
    of files would a `col = value` point query never open? (Uses
    pyarrow footer metadata directly — the same stats Spark's parquet
    filter pushdown consults.)
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None and (value < lo or value > hi):
            skipped += 1
    return skipped / len(files) if files else 0.0


def write_with_bloom(
    df,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
    mode: str = "overwrite",
    codec: str = "zstd",
) -> None:
    """Parquet write with per-column bloom filters (+ zstd).

    The third skipping mechanism beside partition pruning and min/max
    clustering: bloom filters answer point predicates (`user_id = X`)
    on HIGH-CARDINALITY, UNSORTED columns where min/max ranges are
    useless — each row group stores a compact membership filter and a
    reader skips groups that definitely lack the value. Costs ~1 byte/
    distinct value at write time; pays off on every selective lookup.
    zstd is the 100 TB default codec (parquet's snappy default trades
    ~30% size for negligible CPU at today's zstd levels).
    """
    w = df.write.mode(mode).option("compression", codec)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
    w.parquet(path)


def has_bloom_filter(spark, path: str, col: str) -> bool:
    """True if any row group stores a bloom filter for `col`.

    pyarrow's footer object does not surface bloom offsets, so this
    asks the JVM parquet reader (same library that wrote the file).
    """
    import glob
    import os

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        footer = jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, jvm.org.apache.hadoop.fs.Path(f)
        )
        for block in footer.getBlocks():
            for c in block.getColumns():
                if (
                    c.getPath().toDotString() == col
                    and c.getBloomFilterOffset() >= 0
                ):
                    return True
    return False
