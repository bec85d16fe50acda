"""CDS API ingest (reference S1–S3, K3, D3): driver-side download tasks.

Reference semantics (``flows/download_era5_land.py:60-106``, variant
``dask_jobs/extract_era5.py:29-76``):

* build one request per (region, month): variables (long names via
  VAR_MAP, C10), full day/hour lists (C11 zero-padded), bbox ``area``;
* skip when the target exists (S2 idempotence; ``--force`` overrides);
* write a ``<target>.request.json`` sidecar (K3 lineage);
* download to ``<target>.part`` then ``os.replace`` (S3 atomicity);
* retry transient failures (D3: 2 retries, 30 s delay in the flow).

Downloading is external ingestion, not a Spark scan — it stays a
driver-side (or ``sc.parallelize(requests).foreach``) task. The HTTP
client is injectable: the real one needs the ``cdsapi`` package and
credentials (absent here), tests inject a fake fetcher. No network I/O
happens in this module unless a fetcher performs it.
"""

from __future__ import annotations

import calendar
import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from ..schemas import VAR_MAP

#: D3 defaults (reference ``flows/download_era5_land.py:60``).
DEFAULT_RETRIES = 2
DEFAULT_RETRY_DELAY_S = 30.0


def normalize_variables(short_or_long: list[str]) -> list[str]:
    """C10: map short codes through VAR_MAP; pass unknown names through."""
    return [VAR_MAP.get(v, v) for v in short_or_long]


def build_request(
    variables: list[str],
    year: int,
    month: int,
    area: list[float],
    limit_days: int | None = None,
) -> dict:
    """One CDS request dict per (region, month) — C11 list building.

    Day list honors the month length (``calendar.monthrange``); hours
    are the full 24 ``HH:00`` strings; ``limit_days`` mirrors the
    flow's default-7 trimming (``download_era5_land.py:115``).
    """
    n_days = calendar.monthrange(year, month)[1]
    if limit_days is not None:
        n_days = min(n_days, limit_days)
    return {
        "product_type": "reanalysis",
        "variable": normalize_variables(variables),
        "year": str(year),
        "month": f"{month:02d}",
        "day": [f"{d:02d}" for d in range(1, n_days + 1)],
        "time": [f"{h:02d}:00" for h in range(24)],
        "area": list(area),
        "format": "netcdf",
    }


@dataclass
class DownloadResult:
    target: str
    status: str  # "downloaded" | "skipped" | "failed"
    attempts: int = 0
    error: str | None = None


@dataclass
class CdsDownloader:
    """Idempotent, atomic, retrying downloader around an injectable fetch.

    ``fetch(request, tmp_path)`` must materialize the payload at
    ``tmp_path``. The default raises: the real client requires the
    ``cdsapi`` package + credentials, wired like::

        import cdsapi
        client = cdsapi.Client()
        CdsDownloader(fetch=lambda req, out:
            client.retrieve("reanalysis-era5-land", req, out))
    """

    fetch: Callable[[dict, str], None] = field(default=None)  # type: ignore[assignment]
    retries: int = DEFAULT_RETRIES
    retry_delay_s: float = DEFAULT_RETRY_DELAY_S
    sleep: Callable[[float], None] = time.sleep  # injectable for tests

    def download_month(
        self,
        request: dict,
        target: str,
        force: bool = False,
        write_sidecar: bool = True,
    ) -> DownloadResult:
        if self.fetch is None:
            raise NotImplementedError(
                "no fetch function configured: the real CDS client needs the "
                "cdsapi package and credentials (not available in this "
                "environment); inject fetch=..."
            )
        # S2: idempotent skip.
        if os.path.exists(target) and not force:
            return DownloadResult(target, "skipped")
        parent = os.path.dirname(target)
        if parent:
            os.makedirs(parent, exist_ok=True)
        # K3: lineage sidecar next to the data file.
        if write_sidecar:
            with open(f"{target}.request.json", "w") as f:
                json.dump(request, f, indent=2, sort_keys=True)
        part = f"{target}.part"
        last_err: Exception | None = None
        for attempt in range(1, self.retries + 2):
            try:
                self.fetch(request, part)
                os.replace(part, target)  # S3: atomic publish
                return DownloadResult(target, "downloaded", attempts=attempt)
            except Exception as exc:  # noqa: BLE001 - retry any fetch error
                last_err = exc
                if os.path.exists(part):
                    os.remove(part)
                if attempt <= self.retries:
                    self.sleep(self.retry_delay_s)
        # terminal failure: drop the sidecar (written optimistically,
        # reference order) so no lineage record points at missing data
        if write_sidecar and os.path.exists(f"{target}.request.json"):
            os.remove(f"{target}.request.json")
        return DownloadResult(target, "failed", attempts=self.retries + 1, error=str(last_err))


def raw_target_path(root: str, region: str, year: int, month: int) -> str:
    """Hive-style landing path (S4 layout, ``aggregate_hourly.py:107``)."""
    return os.path.join(root, f"region={region}", f"year={year}", f"month={month:02d}.nc")
