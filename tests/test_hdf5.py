"""Unit tests for the pure-Python HDF5/NetCDF4 reader (sources/hdf5.py).

The integration proof (raw CDS bytes → hourly mart parity) lives in
test_golden_parity.py; these cover the format-layer pieces in
isolation: CF time decode, error paths, filter application, and the
long-form melt contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_in_agriculture_spark.sources.hdf5 import (
    Hdf5File,
    Hdf5FormatError,
    decode_cf_time,
    era5_frame,
)

RAW_NC = (
    "/root/reference/data/raw/era5-land/region=bashkortostan/year=2022/"
    "month=02.nc"
)


def _real_bytes() -> bytes:
    import os

    from big_data_in_agriculture_spark.sources.netcdf import (
        sniff_netcdf_bytes,
    )

    if not os.path.exists(RAW_NC):
        pytest.skip("reference raw bytes not present")
    return sniff_netcdf_bytes(open(RAW_NC, "rb").read())


def test_bad_signature_rejected():
    with pytest.raises(Hdf5FormatError, match="signature"):
        Hdf5File(b"PAR1" + b"\x00" * 100)


def test_decode_cf_time_units():
    vals = np.array([0, 1, 2], dtype=np.int64)
    secs = decode_cf_time(vals, "seconds since 1970-01-01")
    assert str(secs[1]) == "1970-01-01T00:00:01.000000000"
    hrs = decode_cf_time(vals, "hours since 2022-02-01 06:00:00")
    assert str(hrs[2]) == "2022-02-01T08:00:00.000000000"
    days = decode_cf_time(vals, "days since 1900-01-01")
    assert str(days[1]) == "1900-01-02T00:00:00.000000000"
    with pytest.raises(Hdf5FormatError, match="time units"):
        decode_cf_time(vals, "fortnights since 1970-01-01")


def test_shuffle_deflate_chunk_roundtrip():
    """The t2m chunk is shuffle+deflate; decoded values must be finite
    Kelvin temperatures — garbage de-shuffling would give 1e30s."""
    f = Hdf5File(_real_bytes())
    ds = f.datasets["t2m"]
    assert [fid for fid, _ in ds.filters] == [2, 1]  # shuffle, deflate
    arr = f.read("t2m")
    assert np.isfinite(arr).all()
    assert 220.0 < arr.min() < arr.max() < 300.0


def test_fill_value_nan_for_sea_cells():
    """krasnodar's bbox includes the Black Sea: land-only variables
    carry NaN fills there, and the reader must surface them as NaN
    (they become NULLs → skipna mean parity)."""
    import os

    from big_data_in_agriculture_spark.sources.netcdf import (
        sniff_netcdf_bytes,
    )

    path = RAW_NC.replace("bashkortostan", "krasnodar")
    if not os.path.exists(path):
        pytest.skip("reference raw bytes not present")
    f = Hdf5File(sniff_netcdf_bytes(open(path, "rb").read()))
    arr = f.read("swvl1")  # soil moisture: undefined over water
    frac = float(np.isnan(arr).mean())
    assert 0.1 < frac < 0.5
    # NaN mask is time-invariant (it's geography)
    assert (np.isnan(arr) == np.isnan(arr[0])[None, :, :]).all()


def test_era5_frame_melt_contract():
    """Long-form melt: row count = nt × nlat × nlon, C-order (ts is the
    slowest axis), presence gating drops absent variables."""
    buf = _real_bytes()
    frame = era5_frame(buf, ["t2m", "not_a_var"])
    assert list(frame.columns) == ["ts", "latitude", "longitude", "t2m"]
    assert len(frame) == 24 * 51 * 69
    # first grid block is the first timestamp
    assert (frame["ts"].iloc[: 51 * 69] == frame["ts"].iloc[0]).all()
    # longitude is the fastest axis
    assert frame["longitude"].iloc[0] != frame["longitude"].iloc[1]
    assert frame["latitude"].iloc[0] == frame["latitude"].iloc[1]
    with pytest.raises(ValueError, match="no requested variable"):
        era5_frame(buf, ["nope"])


def test_vlen_and_grib_attributes():
    f = Hdf5File(_real_bytes())
    assert f.datasets["t2m"].attrs["GRIB_units"] == "K"
    assert f.datasets["t2m"].attrs["units"] == "K"
    assert f.datasets["t2m"].attrs["GRIB_name"] == "2 metre temperature"
    # int attr via dense storage
    assert f.datasets["t2m"].attrs["GRIB_Nx"] == 69
    # expver is a vlen-string dataset: read() refuses cleanly
    with pytest.raises(Hdf5FormatError, match="unsupported element type"):
        f.read("expver")


def test_dimension_list_resolution():
    f = Hdf5File(_real_bytes())
    assert f.dim_names("t2m") == ["valid_time", "latitude", "longitude"]
    assert f.dim_names("latitude") is None or f.dim_names("latitude") == [
        "latitude"
    ]
