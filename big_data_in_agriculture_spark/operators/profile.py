"""Table profiling + approximate aggregates (engine extensions).

A 100 TB lake needs cheap answers to "what's in this table" before
anyone runs real queries: per-column null rates, cardinalities, ranges
— and approximate forms of the expensive ones (distinct counts,
percentiles) whose exact versions would shuffle the world.

``profile_table`` is exact and runs as ONE aggregate pass (no shuffle
beyond the single global agg). The approximate forms use Spark's HLL++
(`approx_count_distinct`) and t-digest-style (`percentile_approx`)
built-ins — sketch state merges associatively, so the shuffle carries
sketches, not values.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.ShortType)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: count/nulls/distinct (+min/max for numerics).

    Exact, one SCAN of the table: every column's stats live in the
    same aggregate (N separate profile queries would be N full scans).
    Multiple COUNT(DISTINCT) compile to an Expand that replicates rows
    ~(k+1)x between scan and shuffle — exactness has that price; when
    cardinalities may be approximate, ``approx_profile``'s HLL sketches
    drop the Expand entirely.
    """
    cols = columns or df.columns
    by_type = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if isinstance(by_type.get(c), _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column — tiny data,
    # stack() is a projection, no extra pass over the table
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_non_null, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column",
        "n_rows",
        "n_non_null",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_null"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def approx_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    distinct_col: str,
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate distinct count + percentile sketch.

    HLL++ (`rsd` relative error) and `percentile_approx` (1/accuracy
    rank error) — both mergeable sketches, so partial aggregation works
    and the shuffle payload per group is the sketch, not the rows. The
    exact twins of these at 100 TB are a full-shuffle distinct and a
    global sort; the sketches are the only sane default.
    """
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(
            value_col, list(percentiles), accuracy
        ).alias("value_percentiles"),
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier detection: modified z-score on median/MAD.

    Mean/stddev z-scores are themselves dragged by the outliers they
    hunt; the robust version (Iglewicz-Hoberg 0.6745·(x−med)/MAD)
    is the standard data-cleaning gate. Two grouped passes over the
    fact (median, then MAD around it) with the tiny per-group stats
    broadcast back — the fact is never shuffled, only scanned. Exact
    percentiles sort per group; for 100 TB swap in approx_percentile
    (same shape, rank-error bound) — exactness here keeps the SQL
    oracle bit-matched.

    Emits only the flagged rows, with the score: (key, value, robust_z).
    A group whose MAD is zero (over half the values equal the median —
    constant-valued groups, or 1-row groups) flags NOTHING: the
    modified z-score is undefined there, and the guard keeps ANSI mode
    from raising DIVIDE_BY_ZERO (the SQL oracle's NULL-on-div-0 drops
    the same rows, so both engines agree).
    """
    # NaN measurements are sensor garbage: excluded like NULL (the
    # engines' NaN comparison/percentile semantics diverge; the oracle
    # carries the matching NOT isnan)
    df = df.filter(~F.isnan(F.col(value_col).cast("double")))
    med = df.groupBy(key_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    mad = (
        df.join(F.broadcast(med), key_col)
        .groupBy(key_col)
        .agg(
            F.first("_med").alias("_med"),
            F.percentile(
                F.abs(F.col(value_col) - F.col("_med")), F.lit(0.5)
            ).alias("_mad"),
        )
    )
    z = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
    ).otherwise(F.lit(0.0))
    return (
        df.join(F.broadcast(mad), key_col)
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > z_thresh)
        .drop("_med", "_mad")
    )


#: First-digit propensities log10(1 + 1/d), quantized 6 dp half-away
#: in PYTHON and injected as literals into BOTH engines — libm log10
#: may differ by an ulp across implementations, so neither engine
#: computes the logarithm itself.
_BENFORD_EXPECTED = {
    d: math.floor(abs(math.log10(1.0 + 1.0 / d)) * 1e6 + 0.5) / 1e6
    for d in range(1, 10)
}


def benford_deviation(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford's law) screen over a positive numeric
    column: 9 rows ``(digit, n_obs, share, expected, deviation)``.

    The classic cheap fraud / data-corruption detector (Benford 1938;
    Nigrini 1996 for audit practice): naturally-generated multi-scale
    magnitudes (prices, populations, file sizes) put digit d first
    with propensity log10(1+1/d) ≈ 30.1% for 1 down to 4.6% for 9 —
    fabricated or truncated data visibly deviates. In a lake pipeline
    it's a one-scan quality gate per numeric column; in a curation
    pipeline, a synthetic-table detector.

    Scale shape: ONE scan + a 9-group aggregate; the digit histogram
    is the only shuffled state. Determinism: values quantize to LONG
    micros (scale-invariance makes the unit irrelevant to Benford);
    the leading digit is the first character of the BIGINT's decimal
    string (exact on both engines — no float log10 anywhere); shares
    are single divisions of exact LONGs, quantized 6 dp half-away;
    ``expected`` is a Python-computed literal (see above), so
    ``deviation`` subtracts two bit-identical doubles. NULL, NaN,
    zero and sub-microunit values are excluded (no leading digit).
    Digits absent from the data still emit their row with n_obs 0.
    """
    from .similarity import _quantize_col

    v = F.col(value_col).cast("double")
    vm = F.floor(F.abs(v) * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    counts = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(vm.alias("_vm"))
        .filter(F.col("_vm") > 0)
        .select(
            F.substring(F.col("_vm").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    expected = F.when(
        F.col("digit") == 1, F.lit(_BENFORD_EXPECTED[1])
    )
    for d in range(2, 10):
        expected = expected.when(
            F.col("digit") == d, F.lit(_BENFORD_EXPECTED[d])
        )
    total = Window.partitionBy()
    # empty-input guard: share 0 (not 0/0 = NaN — the engines'
    # NaN-propagation through the quantize differs from NULL's)
    share = F.when(
        F.sum("n_obs").over(total) > 0,
        _quantize_col(
            F.col("n_obs").cast("double")
            / F.sum("n_obs").over(total).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        digits.join(counts, "digit", "left")
        .select(
            "digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs")
        )
        .select(
            "digit",
            "n_obs",
            share.alias("share"),
            expected.alias("expected"),
            _quantize_col(F.abs(share - expected), 6).alias("deviation"),
        )
    )


def check_constraints(
    df: DataFrame, constraints: dict[str, Column]
) -> DataFrame:
    """Data-quality expectations: one-pass violation report.

    The Deequ-style contract check a pipeline runs before publishing a
    table: each constraint is a boolean Column; a row violates it when
    the predicate is not TRUE (so NULL counts as a violation — an
    unverifiable row fails the check). ALL constraints are counted in
    ONE scan / one scalar aggregate — at 100 TB this is the difference
    between N passes and one — then the single stats row is unpivoted
    driver-side into (check_name, n_violations, violation_rate).

    The rate is an exact integer ratio in double; deterministic.
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for name, pred in constraints.items():
        aggs.append(
            F.sum(F.when(pred, 0).otherwise(1)).alias(name)
        )
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in constraints)
    return (
        row.select(
            F.expr(
                f"stack({len(constraints)}, {pairs}) AS (check_name, n_violations)"
            ),
            F.col("_n_rows").alias("n_rows"),
        )
        .withColumn(
            "violation_rate",
            F.col("n_violations").cast("double") / F.col("n_rows"),
        )
        .orderBy("check_name")
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations, ONE scan, long-form output.

    All C(n,2) corr states accumulate in a single scalar aggregate —
    the scan cost is independent of the pair count. The wide stats row
    unpivots to (col_a, col_b, corr); corr is a ratio of large sums,
    so cross-engine partial-sum reordering is washed out by the final
    float32 cast (the repo-wide aggregate-determinism contract).
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = [
        F.corr(a, b).alias(f"_c_{i}") for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', `_c_{i}`" for i, (a, b) in enumerate(pairs)
    )
    return (
        row.select(
            F.expr(
                f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr_d)"
            )
        )
        .select(
            "col_a", "col_b", F.col("corr_d").cast("float").alias("corr")
        )
        .orderBy("col_a", "col_b")
    )


def quantile_bins(df: DataFrame, col: str, bins: int = 4) -> DataFrame:
    """Equal-frequency binning: per-bin counts from quantile boundaries.

    The feature-discretization primitive. Two passes: ONE exact
    percentile aggregate produces the bins−1 boundaries (broadcast back
    as a 1-row cross join), then one hash aggregate on the bin id.
    Boundaries are rounded to 4 decimals before the comparison — the
    two engines' interpolation formulas agree to the last ulp at best,
    and a data point sitting exactly on an unrounded boundary would
    otherwise flip buckets between engines.
    """
    probs = ", ".join(str(i / bins) for i in range(1, bins))
    bounds = df.agg(
        F.expr(
            f"transform(percentile({col}, array({probs})), b -> round(b, 4))"
        ).alias("_bounds")
    )
    bin_id = F.aggregate(
        "_bounds",
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("_mn"),
        )
        .select(
            "bin_id",
            "n",
            F.col("_mn").cast("float").alias("bin_min"),
        )
        .orderBy("bin_id")
    )


def winsorize(
    df: DataFrame, col: str, lower: float = 0.01, upper: float = 0.99
) -> DataFrame:
    """Clip a numeric column at quantile bounds (outlier taming).

    One exact percentile aggregate yields both bounds, broadcast back
    as a 1-row cross join; the clip itself is least/greatest — a pure
    projection. Bounds are rounded to 4 decimals (same cross-engine
    interpolation argument as quantile_bins: a value exactly on an
    unrounded boundary would clip on one engine and not the other).
    """
    bounds = df.agg(
        F.expr(
            f"transform(percentile({col}, array({lower}, {upper})),"
            " b -> round(b, 4))"
        ).alias("_wb")
    )
    clipped = F.least(
        F.greatest(F.col(col), F.col("_wb")[0]), F.col("_wb")[1]
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(col, clipped)
        .drop("_wb")
    )


def impute_group_mean(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Fill NULLs with the group's mean (feature-prep imputation).

    The per-group means are a tiny aggregate broadcast back to the
    fact — the fact itself is never shuffled. Groups that are entirely
    NULL stay NULL (their mean is NULL); callers wanting a global
    fallback chain a second coalesce with the overall mean.
    """
    means = df.groupBy(group_col).agg(F.avg(value_col).alias("_gm"))
    return (
        df.join(F.broadcast(means), group_col, "left")
        .withColumn(value_col, F.coalesce(F.col(value_col), F.col("_gm")))
        .drop("_gm")
    )


def value_histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Fixed-width histogram over a numeric column.

    Two passes: a scalar min/max aggregate (broadcast back as a 1-row
    cross join — Catalyst's own plan for an uncorrelated scalar
    subquery), then one hash aggregate on the bin id. The top value
    folds into the last bin (least(floor(...), bins-1)) so max lands
    in-range; a degenerate column (min == max — constant values or a
    single row) collapses into bin 0 rather than dividing by a zero
    width (ANSI raise on Spark, NULL-fed last-bin on DuckDB — the
    explicit guard makes both engines agree). Bin math is plain double
    IEEE ops — engine-deterministic given identical min/max, which the
    exact scalar agg guarantees.
    """
    # Neither NULL nor NaN can be binned — without the explicit
    # exclusion both engines' NULL-skipping least() silently dropped
    # NULL values into the LAST bin (oracle: IS NOT NULL AND NOT isnan)
    df = df.filter(
        F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    )
    stats = df.agg(
        F.min(col).cast("double").alias("_mn"),
        F.max(col).cast("double").alias("_mx"),
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(bins))
    bin_id = (
        F.when(
            F.col("_mx") > F.col("_mn"),
            F.least(
                F.floor((F.col(col) - F.col("_mn")) / width),
                F.lit(bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first(F.col("_mn")).alias("_mn"),
            F.first(F.col("_mx")).alias("_mx"),
        )
        .select(
            "bin_id",
            ((F.col("_mn") + F.col("bin_id") * (F.col("_mx") - F.col("_mn"))
              / F.lit(float(bins)))).cast("float").alias("bin_lo"),
            "n",
        )
        .orderBy("bin_id")
    )


def key_skew(
    df: DataFrame, key_cols: list[str], top: int = 10
) -> DataFrame:
    """Shuffle-key skew diagnostic: the pre-flight check for join/agg
    strategy at scale (salt? AQE skew-split? broadcast the other side?).

    One partial-aggregated count per key, then the top-N heaviest keys
    with their share of all rows and a ratio to the mean key load
    (ratio >> 1 on a join key predicts straggler tasks). Deterministic
    top-N via (count desc, key) ordering.

    Totals come from re-aggregating the per-key counts and riding back
    in as a broadcast 1-row cross join — all lazy, and the per-key
    groupBy exchange is identical in both branches so AQE reuses it:
    the input is scanned ONCE, no eager driver-side counts.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_tot"), F.count(F.lit(1)).alias("_nk")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .withColumn(
            "share",
            (F.col("n_rows") / F.col("_tot").cast("double")).cast("float"),
        )
        .withColumn(
            "skew_ratio",
            (
                F.col("n_rows")
                * F.col("_nk").cast("double")
                / F.col("_tot").cast("double")
            ).cast("float"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
        .drop("_tot", "_nk")
    )


def hll_rollup(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches PLUS their union, re-aggregated not rescanned.

    The mergeable-sketch pattern that makes distinct counts tractable at
    100 TB: build one Datasketches HLL per group (`hll_sketch_agg` —
    partial aggregation applies, shuffle payload = the ~2^lg_config_k
    byte sketch per group), then derive the GLOBAL distinct estimate by
    merging the per-group sketches (`hll_union_agg`) — the raw rows are
    never touched again. The same union property powers incremental
    daily sketches → monthly rollups without re-reading a month of data.

    Output: one row per group (estimate per group) plus the '__all__'
    union row. Estimates are approximate — verify with the 3-sigma test
    harness, not a SQL hash oracle.
    """
    sketches = df.groupBy(group_col).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_config_k)).alias("_sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    per_group = sketches.select(
        F.col(group_col).cast("string").alias("group"),
        "n_rows",
        F.hll_sketch_estimate("_sk").alias("approx_distinct"),
    )
    union = sketches.agg(
        F.lit("__all__").alias("group"),
        # coalesce: SUM over zero groups is NULL, but the union row's
        # row count over an empty input is 0 (matches count(*))
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_union_agg("_sk", F.lit(False))
        ).alias("approx_distinct"),
    ).select("group", "n_rows", "approx_distinct")
    return per_group.unionByName(union).orderBy("group")


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier groups smaller than k (re-identification risk).

    The governance audit behind "is this table safe to share": any
    combination of quasi-identifier values matching fewer than k rows
    singles people out. ONE hash aggregate on the quasi columns; the
    risky-group table is what a suppression/generalization pass then
    consumes. At 100 TB the aggregate is partial-agg friendly and the
    output is bounded by the number of RARE combinations — the ones
    you care about — not the table size.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
        .orderBy(*quasi_cols)
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Orphaned foreign keys: child keys with no parent row.

    The cross-table data-quality expectation `check_constraints` can't
    express (it is single-scan by design): a left-anti join from the
    child's DISTINCT key set — collapsed BEFORE the join, so the join
    input is key-cardinality-sized, not fact-table-sized — against the
    parent's key column (pruned scan). Empty result = constraint holds.
    """
    orphans = (
        child.select(F.col(child_key).alias("orphan_key"))
        .distinct()
        .join(
            parent.select(F.col(parent_key).alias("orphan_key")),
            "orphan_key",
            "left_anti",
        )
    )
    return (
        child.select(F.col(child_key).alias("orphan_key"))
        .groupBy("orphan_key")
        .agg(F.count(F.lit(1)).alias("n_child_rows"))
        .join(orphans, "orphan_key", "left_semi")
        .orderBy("orphan_key")
    )


# --- Bloom-filter membership (incremental dedup vs history) -----------------
#
# The mergeable-sketch answer to "have we seen this document before?"
# when the history is too large to join against: an m-bit Bloom filter
# over normalized content fingerprints, stored as (word_idx, bits)
# BIGINT rows. 63 usable bits per word — bit index 63 is never set, so
# `1::BIGINT << bit` stays in signed-64 range on BOTH engines (DuckDB
# raises on `1 << 63`; Spark would wrap to the sign bit).
#
# Hash family: Kirsch-Mitzenmacher double hashing — position_i =
# (h1 + i*h2) mod m from TWO independent slices of the sha256 content
# fingerprint (hex chars 1-15 -> h1 < 2^60; 17-24 -> h2, forced odd,
# < 2^33). i < 64 keeps h1 + i*h2 < 2^61: no overflow under ANSI
# arithmetic, and DuckDB replays every position bit-identically via
# ('0x' || substr(fp, ...))::BIGINT.

#: usable bits per BIGINT word (see module comment above)
_BLOOM_WORD_BITS = 63


def _bloom_hashes(fp: Column) -> tuple[Column, Column]:
    """(h1, h2-odd) position-hash pair from a sha256 hex fingerprint."""
    h1 = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(fp, 17, 8), 16, 10).cast("long") * F.lit(2)
        + F.lit(1)
    )
    return h1, h2


def _bloom_positions(fp: Column, m_bits: int, k_hashes: int) -> Column:
    """array<long> of the k_hashes bit positions for one fingerprint."""
    h1, h2 = _bloom_hashes(fp)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(m_bits),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "fp",
    m_bits: int = 4032,
    k_hashes: int = 5,
) -> DataFrame:
    """Build the (word_idx, bits) Bloom bitmap over a key column.

    Scale shape: one explode of k positions per key plus ONE hash
    aggregate keyed on word_idx — at most ceil(m_bits/63) output rows
    no matter how large the history is, and the positions are
    md5/sha-uniform so the aggregate is skew-free by construction.
    The bitmap MERGES associatively (bit_or over word_idx), so daily
    batches can each build their own words and fold into the running
    filter without rescanning history — the same mergeability contract
    as the HLL rollup (`hll_rollup`).
    """
    if not 1 <= k_hashes <= 64:
        raise ValueError("k_hashes must be in [1, 64]")
    pos = keys.select(
        F.explode(
            _bloom_positions(F.col(key_col), m_bits, k_hashes)
        ).alias("pos")
    )
    return (
        pos.select(
            F.floor(F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % _BLOOM_WORD_BITS).cast("int"),
            ).alias("bitval"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bitval").alias("bits"))
    )


def bloom_probe(
    keys: DataFrame,
    words: DataFrame,
    key_col: str = "fp",
    id_col: str = "doc_id",
    m_bits: int = 4032,
    k_hashes: int = 5,
) -> DataFrame:
    """Per key: maybe_dup = every one of its k filter bits is set.

    False positives at the standard (1 - e^(-k*n/m))^k rate; NO false
    negatives — "maybe_dup = false" is a proof the key is new. Scale
    shape: k rows per probe key equi-joined on uniform word_idx, then
    one group-agg back to per-key. The history itself is never
    touched. The filter side is <= ceil(m_bits/63) rows; it gets an
    explicit broadcast hint only while that is broadcast-SAFE (a
    filter sized for a 10-bits/key 10B-doc history is ~190M words /
    1.5 GB — a FORCED broadcast there would OOM the executors, so past
    the threshold the hint is dropped and the planner takes a shuffled
    join on the same uniform key, which AQE may still convert).
    """
    pos = keys.select(
        F.col(id_col),
        F.posexplode(
            _bloom_positions(F.col(key_col), m_bits, k_hashes)
        ).alias("_i", "pos"),
    ).select(
        id_col,
        F.floor(F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("pos") % _BLOOM_WORD_BITS).cast("int"),
        ).alias("bitval"),
    )
    hit = F.coalesce(
        F.col("bits").bitwiseAND(F.col("bitval")) != F.lit(0), F.lit(False)
    )
    # ~16 bytes/word row; 64 MB of words ≈ 2^22 words ≈ 2^28 bits
    if m_bits <= (1 << 28):
        words = F.broadcast(words)
    return (
        pos.join(words, "word_idx", "left")
        .select(id_col, hit.alias("_hit"))
        .groupBy(id_col)
        .agg(F.bool_and("_hit").alias("maybe_dup"))
    )


def bloom_dedup(
    docs: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 4032,
    k_hashes: int = 5,
) -> DataFrame:
    """Screen new documents against a Bloom filter of history content.

    The memory-bounded sibling of `llm.crosscorpus_dedup`: that
    operator anti-joins against the history's exact fingerprint set
    (precise, but the set grows with history); this one compresses
    history to m_bits once and screens any number of future batches
    against it. maybe_dup=false rows are PROVABLY new (no false
    negatives) and can skip the exact check entirely; at the standard
    sizing (m/n = 10 bits/key, k = 7) only ~1% of genuinely-new docs
    pay the precise path. Identity = TX.fingerprint (whitespace/case-
    normalized sha256), the repo-wide exact-dedup convention. NULL
    text has no fingerprint: excluded on both sides.
    """
    from ..functions import text as TX

    hist_fp = (
        history.filter(F.col(text_col).isNotNull())
        .select(TX.fingerprint(text_col).alias("fp"))
    )
    words = bloom_build(hist_fp, "fp", m_bits, k_hashes)
    probe = docs.filter(F.col(text_col).isNotNull()).select(
        id_col, TX.fingerprint(text_col).alias("fp")
    )
    return bloom_probe(probe, words, "fp", id_col, m_bits, k_hashes)


def bloom_stats(
    words: DataFrame,
    m_bits: int = 4032,
    k_hashes: int = 5,
) -> DataFrame:
    """Filter-health diagnostics: fill fraction and expected FPR.

    The operational companion to `bloom_build`: a Bloom filter's
    false-positive rate is fill_frac^k where fill_frac is the share of
    set bits, so this one-row aggregate over the (tiny) words table
    tells the pipeline when the filter is saturating and needs a
    bigger m (the curator's resize trigger — at fill ≥ 0.5 the filter
    is past its design point). Exact popcounts via bit_count; the only
    float math is the final division and power, one correctly-rounded
    step each on identical integer inputs, cast to float at the end on
    both engines per the repo's determinism contract.
    """
    n_set = F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).cast("long")
    fill = n_set.cast("double") / F.lit(float(m_bits))
    return words.agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        n_set.alias("n_set_bits"),
        fill.cast("float").alias("fill_frac"),
        F.pow(fill, F.lit(float(k_hashes))).cast("float").alias("expected_fpr"),
    )


# --- Count-Min sketch (approximate frequencies, mergeable) -------------------
#
# The third of the classic mergeable sketches next to the HLL rollup
# (distinct counts) and the Bloom filter (membership): approximate
# FREQUENCIES in depth×width integer cells. est(key) = min over the
# depth rows of its counter — never an underestimate, overestimates by
# at most ε·N (ε = e/width) with probability 1−δ (δ = e^−depth).
# Positions reuse the Bloom module's Kirsch-Mitzenmacher double
# hashing over md5 (col_i = (h1 + i·h2) mod width), so with a fixed
# hash family the whole sketch — build AND probe — is deterministic
# and the DuckDB oracle replays it bit-exactly. Sketches MERGE by
# cell-wise addition (sum over (row_idx, col_idx)): daily sketches
# fold into monthly ones without rescanning rows, exactly like
# hll_rollup's union re-aggregation.

def _cms_cols(key: Column, depth: int, width: int) -> Column:
    """array<long> of the depth column indices for one key."""
    fp = F.md5(key)
    h1 = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(fp, 17, 8), 16, 10).cast("long") * F.lit(2)
        + F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(width),
    )


def cms_build(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row_idx, col_idx, cnt) cells of a Count-Min sketch.

    ONE explode of depth cells per occurrence + ONE hash aggregate
    bounded at depth×width output rows regardless of input size; the
    partial agg collapses each partition to its touched cells before
    the shuffle. NULL keys carry no frequency information — excluded,
    matching the profile family's NULL conventions.
    """
    if not 1 <= depth <= 64:
        raise ValueError("depth must be in [1, 64]")
    return (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.posexplode(_cms_cols(F.col(key_col), depth, width)).alias(
                "row_idx", "col_idx"
            )
        )
        .groupBy("row_idx", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per query key: the CMS frequency estimate (min over depth rows).

    depth rows per query key equi-joined against the sketch cells
    (≤ depth×width rows — broadcast), then one min-agg back to
    per-key. A missing cell means no occurrence hashed there: counts
    as 0, so keys never seen estimate 0 (the CMS never underestimates,
    and 0 is exact for them). NULL query keys are excluded at entry,
    mirroring ``cms_build``'s NULL-carries-no-frequency convention —
    md5(NULL) would otherwise produce all-NULL cell indices and a
    spurious estimate of 0 indistinguishable from a never-seen key.
    """
    queries = queries.filter(F.col(key_col).isNotNull())
    pos = queries.select(
        key_col,
        F.posexplode(_cms_cols(F.col(key_col), depth, width)).alias(
            "row_idx", "col_idx"
        ),
    )
    # broadcast only while the sketch is broadcast-safe (~24 B/cell;
    # a width sized for tiny ε can reach hundreds of millions of cells
    # — same rule as bloom_probe's words side); past the threshold the
    # planner takes a shuffled join on the uniform cell key
    if depth * width <= (1 << 22):
        sketch = F.broadcast(sketch)
    return (
        pos.join(sketch, ["row_idx", "col_idx"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
        )
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (round 8) — the fourth mergeable
# sketch beside HLL (distinct), Bloom (membership), CMS (frequency).
# ---------------------------------------------------------------------------

def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Build a fixed-bound equi-width histogram sketch: one row per
    OCCUPIED bin, ``(bin_id, n)``.

    The bounds are CALLER-FIXED, not data-derived — that is what makes
    two sketches mergeable by construction (``merge_histograms`` just
    sums counts per bin id), the same contract as Bloom's fixed
    ``m_bits`` and CMS's fixed (depth, width): shards, days, or
    corpora sketch independently and the union's quantiles come from
    one ≤``bins``-row merge, history never rescanned. Values outside
    [lo, hi) clamp into the edge bins (documented lossiness — pick
    bounds from domain knowledge, e.g. price caps, token-length
    limits); NULL/NaN are excluded on both engines. One hash aggregate
    over ≤``bins`` groups; bin math is plain double IEEE ops, so the
    sketch is engine-deterministic.
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    v = F.col(col).cast("double")
    d = df.filter(F.col(col).isNotNull() & ~F.isnan(v))
    width = (hi - lo) / float(bins)
    bin_id = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("long")
    return (
        d.groupBy(bin_id.alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(*sketches: DataFrame) -> DataFrame:
    """Union fixed-bound sketches built with IDENTICAL (lo, hi, bins)
    and sum counts per bin — the mergeable-sketch operation. The
    caller owns the bounds agreement (same contract as merging Bloom
    filters of equal m_bits)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin_id").agg(F.sum("n").alias("n"))


def sketch_quantiles(
    sketch: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
) -> DataFrame:
    """Estimate quantiles from a histogram sketch: ``(q, estimate,
    err_bound)`` — estimate is the linear interpolation inside the bin
    containing the target rank, err_bound the bin width (the sketch's
    worst-case error for in-range values; clamped outliers can exceed
    it, which is why the bounds are a domain decision).

    Everything downstream of the sketch is ≤``bins`` rows: one
    cumulative-count window over bin ids, one cross join against the
    |qs|-row quantile frame, one min-by. Rank math follows the
    nearest-rank convention target = ceil(q * n) (exact LONGs), then
    one double interpolation — deterministic on both engines.
    """
    width = (hi - lo) / float(bins)
    w = Window.orderBy("bin_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sketch.select(
        "bin_id",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.orderBy("bin_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    quantiles = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], ["q"]
    )
    target = F.ceil(F.col("q") * F.col("total")).cast("long")
    hit = (
        cum.crossJoin(F.broadcast(quantiles))
        .filter(F.col("cum") >= F.greatest(target, F.lit(1)))
        .groupBy("q")
        .agg(
            F.min_by(
                F.struct("bin_id", "n", "cum", "total"), F.col("bin_id")
            ).alias("b")
        )
    )
    tgt = F.ceil(F.col("q") * F.col("b.total")).cast("long")
    frac = (
        (tgt - (F.col("b.cum") - F.col("b.n"))).cast("double")
        / F.col("b.n").cast("double")
    )
    est = F.lit(lo) + (F.col("b.bin_id").cast("double") + frac) * F.lit(width)
    return hit.select(
        "q",
        F.round(est, 6).alias("estimate"),
        F.lit(float(width)).alias("err_bound"),
    ).orderBy("q")
