"""NetCDF ingest plumbing: ZIP sniff, path parsing, mapInPandas pipeline.

The container has no HDF5 decoder (xarray/h5netcdf absent), so the
decode step runs through a deterministic fake; everything else — the
binaryFile scan, partition tagging, Arrow batching, schema — is real.
The fake produces a constant grid whose spatial mean is hand-checkable
end-to-end through spatial_mean_hourly.
"""

from __future__ import annotations

import datetime as dt
import io
import zipfile

import pandas as pd
import pytest

from big_data_in_agriculture_spark.operators.hourly import spatial_mean_hourly
from big_data_in_agriculture_spark.sources import netcdf

NC_MAGIC = b"\x89HDF\r\n\x1a\nfake-netcdf-body"


def _make_fake_decoder():
    # Defined NESTED so cloudpickle serializes it by value — a top-level
    # function of this (unimportable-on-executors) test module would be
    # pickled by reference and fail with ModuleNotFoundError.
    def _fake_decoder(nc_bytes: bytes, variables: list[str]) -> pd.DataFrame:
        import datetime as dt  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        # 2 timestamps x 2x2 grid; t2m constant 280K, u10/v10 fixed 3/4
        assert nc_bytes.startswith(b"\x89HDF"), "decoder must receive unwrapped bytes"
        rows = []
        for h in (0, 1):
            for lat in (50.0, 50.1):
                for lon in (30.0, 30.1):
                    rows.append(
                        {"valid_time": dt.datetime(2022, 1, 1, h), "latitude": lat,
                         "longitude": lon, "t2m": 280.0, "u10": 3.0, "v10": 4.0}
                    )
        return pd.DataFrame(rows).rename(columns={"valid_time": "ts"})

    return _fake_decoder


def _layout(tmp_path, as_zip=False):
    d = tmp_path / "raw" / "region=testreg" / "year=2022"
    d.mkdir(parents=True)
    if as_zip:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("data_0.nc", NC_MAGIC)
        (d / "month=01.zip").write_bytes(buf.getvalue())
    else:
        (d / "month=01.nc").write_bytes(NC_MAGIC)
    return str(tmp_path / "raw")


def test_sniff_passthrough_and_zip_extract():
    assert netcdf.sniff_netcdf_bytes(NC_MAGIC) == NC_MAGIC
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("inner/data_0.nc", NC_MAGIC)
    assert netcdf.sniff_netcdf_bytes(buf.getvalue()) == NC_MAGIC


def test_sniff_zip_without_nc_raises():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", b"nope")
    with pytest.raises(ValueError, match="no .nc member"):
        netcdf.sniff_netcdf_bytes(buf.getvalue())


def test_parse_partition_path():
    r, y, m = netcdf.parse_partition_path(
        "file:/data/raw/era5-land/region=bashkortostan/year=2022/month=02.nc"
    )
    assert (r, y, m) == ("bashkortostan", 2022, 2)
    with pytest.raises(ValueError):
        netcdf.parse_partition_path("/some/flat/file.nc")


@pytest.mark.parametrize("as_zip", [False, True])
def test_ingest_pipeline_with_fake_decoder(spark, tmp_path, as_zip):
    root = _layout(tmp_path, as_zip=as_zip)
    grid = netcdf.read_raw_grid(
        spark, root, variables=["t2m", "u10", "v10"], decoder=_make_fake_decoder()
    )
    rows = grid.collect()
    assert len(rows) == 8  # 2 ts x 4 cells
    assert all(r["region"] == "testreg" for r in rows)
    # absent variables surface as NULL columns under the static schema
    assert all(r["swvl1"] is None for r in rows)

    # end-to-end: ingest → hourly mart semantics
    hourly = spatial_mean_hourly(grid, ["t2m", "u10", "v10"], cast=None).collect()
    assert len(hourly) == 2
    assert hourly[0]["t2m"] == pytest.approx(280.0 - 273.15)
    assert hourly[0]["wind_speed_10m"] == pytest.approx(5.0)


def test_default_decoder_raises_without_libs():
    with pytest.raises(NotImplementedError, match="xarray"):
        netcdf.default_decoder(NC_MAGIC, ["t2m"])


class TestNetCDFDataSource:
    def _source(self):
        # subclass defined here so cloudpickle ships it (and the fake
        # decoder) by value to worker processes
        from big_data_in_agriculture_spark.sources.netcdf_datasource import (
            NetCDFDataSource,
        )

        fake = _make_fake_decoder()

        class FakeNetCDFSource(NetCDFDataSource):
            _decoder = staticmethod(fake)

        return FakeNetCDFSource

    def _multi_layout(self, tmp_path):
        import zipfile as _zip

        for region in ("alpha", "beta"):
            for month in (1, 2):
                d = tmp_path / "raw" / f"region={region}" / "year=2022"
                d.mkdir(parents=True, exist_ok=True)
                (d / f"month={month:02d}.nc").write_bytes(NC_MAGIC)
        return str(tmp_path / "raw")

    def test_reads_all_partitions(self, spark, tmp_path):
        root = self._multi_layout(tmp_path)
        spark.dataSource.register(self._source())
        df = spark.read.format("netcdf").option("path", root).load()
        # 4 files x 8 grid rows
        assert df.count() == 32
        assert set(r["region"] for r in df.select("region").distinct().collect()) == {
            "alpha", "beta"
        }
        # unit conversion contract: raw Kelvin arrives undisturbed
        assert df.agg({"t2m": "max"}).first()[0] == 280.0

    def test_option_pruning_plans_one_task(self, spark, tmp_path):
        root = self._multi_layout(tmp_path)
        src = self._source()
        spark.dataSource.register(src)
        reader = src(
            {"path": root, "region": "alpha", "month": "2"}
        ).reader(None)
        parts = reader.partitions()
        assert len(parts) == 1 and "region=alpha" in parts[0].path \
            and "month=02" in parts[0].path
        df = (
            spark.read.format("netcdf")
            .option("path", root)
            .option("region", "alpha")
            .option("month", "2")
            .load()
        )
        assert df.count() == 8
        assert df.select("region").distinct().first()[0] == "alpha"

    def test_missing_partition_tolerance(self, spark, tmp_path):
        root = self._multi_layout(tmp_path)
        spark.dataSource.register(self._source())
        df = (
            spark.read.format("netcdf")
            .option("path", root)
            .option("region", "nonexistent")
            .load()
        )
        assert df.count() == 0

    def test_feeds_hourly_pipeline(self, spark, tmp_path):
        from big_data_in_agriculture_spark.operators import hourly

        root = self._multi_layout(tmp_path)
        spark.dataSource.register(self._source())
        raw = spark.read.format("netcdf").option("path", root).load()
        mart = hourly.spatial_mean_hourly(raw)
        row = mart.filter("region = 'alpha'").orderBy("ts").first()
        # constant 280K grid → mean exactly 280K → 6.85°C; wind 3-4-5
        assert abs(row["t2m"] - 6.85) < 1e-6
        assert abs(row["wind_speed_10m"] - 5.0) < 1e-6
