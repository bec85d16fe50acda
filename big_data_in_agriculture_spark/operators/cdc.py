"""Changelog / dimension-maintenance operators: CDC apply, SCD2 history.

The warehouse side of an ingest pipeline: a stream of keyed
insert/update/delete records must become (a) the current state of the
table and (b) a versioned history with validity intervals. Both are
single-window shapes — the changelog shuffles ONCE on the key and
every derived column (latest row, validity bounds, current flag) comes
from that one sort. At 100 TB the key-partitioned window is the
minimum possible data movement for either semantic; nothing here adds
a second shuffle or a join.

Ties in the change timestamp are broken by a unique sequence column —
without it, "latest" is partition-order-dependent and the operators
stop being deterministic (same contract as the serve-layer ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    changelog: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an I/U/D changelog to the final state per key.

    The last change (by ts, then seq) wins; keys whose last change is
    a delete disappear. One window shuffle on the key — the changelog
    is never joined against itself or against a snapshot.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )


def scd2_history(
    changelog: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a changelog.

    Each change opens a version valid from its own timestamp until the
    next change of the same key (NULL = still current). valid_to and
    is_current both fall out of one lead() over the single key-ordered
    window; a point-in-time lookup is then `key = k AND t >= valid_from
    AND (valid_to IS NULL OR t < valid_to)` — or an as-of join
    (`relational.asof_join`) when the probe side is itself a table.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    valid_to = F.lead(ts_col).over(w)
    return (
        changelog.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
        .drop(ts_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table.

    The audit/reconciliation primitive: one full-outer join on the key
    (both sides shuffle once on the same key — co-partitioned if the
    snapshots are bucketed on it) classifying every key as added /
    removed / changed; unchanged keys are dropped before the result
    materializes. Value comparison is null-safe (a NULL→value change
    is a change, not a join artifact).
    """
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_o_{c}") for c in compare_cols]
    )
    n = new.select(
        *key_cols, *[F.col(c).alias(f"_n_{c}") for c in compare_cols]
    )
    # presence is judged on join-side membership (sentinel columns),
    # not value nulls — a row whose compare columns are all NULL still
    # exists on its side
    o = o.withColumn("_in_old", F.lit(1))
    n = n.withColumn("_in_new", F.lit(1))
    joined = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type") != "unchanged")
        .select(*key_cols, "change_type")
    )
