"""Region config loading (reference S10/F1).

Reference: ``config/regions.yaml`` is a map ``name → {area: [N,W,S,E]}``
loaded with ``yaml.safe_load`` (``dask_jobs/aggregate_hourly.py:142``);
a sentinel all-zero bbox disables a region (F1), unknown requested
names warn (``flows/download_era5_land.py:138-145``).
"""

from __future__ import annotations

import warnings

from .schemas import enabled_regions


def load_regions(path: str) -> dict[str, dict]:
    """S10: YAML → region dict, sentinel-filtered (F1)."""
    import yaml  # noqa: PLC0415

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return enabled_regions(raw)


def select_regions(
    available: dict[str, dict], requested: list[str] | None
) -> dict[str, dict]:
    """Intersect a requested name list with config; warn on unknowns.

    ``None`` means "all enabled regions" (the flow default).
    """
    if requested is None:
        return dict(available)
    out = {}
    for name in requested:
        if name in available:
            out[name] = available[name]
        else:
            warnings.warn(f"unknown region {name!r} not in config; skipping", stacklevel=2)
    return out
