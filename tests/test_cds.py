"""CDS ingest plumbing: request building, idempotence, atomicity, retry."""

from __future__ import annotations

import json

import pytest

from big_data_in_agriculture_spark import config as cfgmod
from big_data_in_agriculture_spark.sources import cds


def test_build_request_shapes():
    req = cds.build_request(["t2m", "tp"], 2022, 2, [56.6, 53.1, 51.6, 59.9])
    assert req["variable"] == ["2m_temperature", "total_precipitation"]  # C10
    assert req["month"] == "02" and len(req["day"]) == 28  # C11 + monthrange
    assert req["day"][0] == "01" and req["time"][0] == "00:00" and len(req["time"]) == 24


def test_build_request_limit_days_and_leap():
    assert len(cds.build_request(["t2m"], 2024, 2, [0, 0, 0, 0])["day"]) == 29
    assert len(cds.build_request(["t2m"], 2022, 1, [0, 0, 0, 0], limit_days=7)["day"]) == 7


def test_download_skip_sidecar_atomic(tmp_path):
    calls = []

    def fake_fetch(req, out):
        calls.append(out)
        with open(out, "wb") as f:
            f.write(b"ncdata")

    dl = cds.CdsDownloader(fetch=fake_fetch, retry_delay_s=0)
    target = cds.raw_target_path(str(tmp_path), "r1", 2022, 3)
    r1 = dl.download_month({"k": 1}, target)
    assert r1.status == "downloaded" and r1.attempts == 1
    assert open(target, "rb").read() == b"ncdata"
    # K3 sidecar
    assert json.load(open(f"{target}.request.json")) == {"k": 1}
    # S3: fetch wrote to .part, publish was a rename
    assert calls == [f"{target}.part"]
    # S2: second run skips without fetching
    r2 = dl.download_month({"k": 1}, target)
    assert r2.status == "skipped" and len(calls) == 1
    # --force re-downloads
    r3 = dl.download_month({"k": 1}, target, force=True)
    assert r3.status == "downloaded" and len(calls) == 2


def test_download_retries_then_succeeds(tmp_path):
    attempts = []
    slept = []

    def flaky(req, out):
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("transient")
        open(out, "wb").write(b"ok")

    dl = cds.CdsDownloader(fetch=flaky, retries=2, retry_delay_s=30, sleep=slept.append)
    r = dl.download_month({}, str(tmp_path / "t.nc"))
    assert r.status == "downloaded" and r.attempts == 3
    assert slept == [30, 30]  # D3: delay between attempts


def test_download_fails_after_budget(tmp_path):
    def broken(req, out):
        raise OSError("down")

    dl = cds.CdsDownloader(fetch=broken, retries=2, retry_delay_s=0)
    r = dl.download_month({}, str(tmp_path / "t.nc"))
    assert r.status == "failed" and r.attempts == 3 and "down" in r.error
    # no torn files left behind, and no orphaned lineage sidecar
    assert not (tmp_path / "t.nc").exists() and not (tmp_path / "t.nc.part").exists()
    assert not (tmp_path / "t.nc.request.json").exists()


def test_no_fetch_configured_raises(tmp_path):
    with pytest.raises(NotImplementedError, match="cdsapi"):
        cds.CdsDownloader().download_month({}, str(tmp_path / "t.nc"))


def test_load_regions_yaml_and_select(tmp_path):
    p = tmp_path / "regions.yaml"
    p.write_text(
        "r1:\n  area: [56.6, 53.1, 51.6, 59.9]\n"
        "off:\n  area: [0.0, 0.0, 0.0, 0.0]\n"
    )
    regions = cfgmod.load_regions(str(p))
    assert list(regions) == ["r1"]  # sentinel filtered (F1)
    with pytest.warns(UserWarning, match="unknown region"):
        sel = cfgmod.select_regions(regions, ["r1", "nope"])
    assert list(sel) == ["r1"]
    assert list(cfgmod.select_regions(regions, None)) == ["r1"]
