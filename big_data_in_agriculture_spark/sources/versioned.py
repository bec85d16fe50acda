"""Versioned dataset snapshots: immutable writes + an atomic pointer.

Training-data reproducibility demands "the exact corpus run X trained
on", not "whatever the table holds today". Full table formats (Delta/
Iceberg) solve this with transaction logs; this is the dependency-free
80%: every publish writes an IMMUTABLE snapshot directory `v=K/` and
then atomically repoints a one-line `_LATEST` file (write-temp +
`os.replace`, the reference's own atomic-materialization trick,
`flows/download_era5_land.py:97-103`). Readers resolve the pointer
once at plan time; a publish never mutates bytes a concurrent reader
may be scanning, and rollback is a pointer move — no data rewrite.

Scale notes: each snapshot is a plain parquet dataset (any layout —
z-ordered, bloom-filtered, partitioned); the pointer file is O(bytes).
Old snapshots are pruned explicitly (`expire_versions`), never
implicitly — the training-run manifest decides what must stay.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


def list_versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(root: str) -> int | None:
    """The published version (pointer wins over directory listing).

    The no-pointer fallback only trusts COMPLETE snapshots (Spark's
    ``_SUCCESS`` marker present): a publisher that crashed mid-write
    leaves a partial ``v=K`` directory, and before the first pointer
    exists that partial must not be served as latest. A publisher that
    crashed AFTER the write but BEFORE the pointer move left a
    complete, correct snapshot — serving it is safe (and lets the
    exactly-once foreachBatch replay recognize its own applied batch
    id inside it)."""
    ptr = os.path.join(root, "_LATEST")
    if os.path.isfile(ptr):
        with open(ptr) as f:
            return int(f.read().strip())
    for v in reversed(list_versions(root)):
        if os.path.isfile(os.path.join(root, f"v={v}", "_SUCCESS")):
            return v
    return None


def _repoint(root: str, version: int) -> None:
    tmp = os.path.join(root, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(root, "_LATEST"))


def write_version(df: DataFrame, root: str) -> int:
    """Publish a new immutable snapshot; returns its version number.

    The snapshot lands fully before the pointer moves, so a crashed
    publish leaves an orphan directory (re-publishable) — never a
    half-published latest.
    """
    os.makedirs(root, exist_ok=True)
    version = (latest_version(root) or 0) + 1
    existing = list_versions(root)
    if existing and existing[-1] >= version:
        version = existing[-1] + 1
    df.write.mode("errorifexists").parquet(os.path.join(root, f"v={version}"))
    _repoint(root, version)
    return version


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot (training-run manifests pin; ad-hoc reads
    default to the published latest)."""
    v = version if version is not None else latest_version(root)
    if v is None:
        raise FileNotFoundError(f"no published versions under {root}")
    path = os.path.join(root, f"v={v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {v} not found under {root}")
    return spark.read.parquet(path)


def rollback(root: str, version: int) -> None:
    """Repoint latest to an older snapshot — a pointer move, no rewrite."""
    if version not in list_versions(root):
        raise FileNotFoundError(f"version {version} not found under {root}")
    _repoint(root, version)


def expire_versions(root: str, keep: int = 3, dry_run: bool = False) -> list[int]:
    """Delete all but the newest `keep` snapshots (never the pointed one).

    Returns the expired (or would-expire) version numbers.
    """
    import shutil

    versions = list_versions(root)
    pointed = latest_version(root)
    old = versions[:-keep] if keep > 0 else versions
    candidates = [v for v in old if v != pointed]
    if not dry_run:
        for v in candidates:
            shutil.rmtree(os.path.join(root, f"v={v}"))
    return candidates
