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
    cf_mask_and_scale,
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
    # classic-ERA5 fractional-second epoch + UTC designators
    era5 = decode_cf_time(vals, "hours since 1900-01-01 00:00:00.0")
    assert str(era5[1]) == "1900-01-01T01:00:00.000000000"
    z = decode_cf_time(vals, "seconds since 1970-01-01T00:00:00Z")
    assert str(z[1]) == "1970-01-01T00:00:01.000000000"
    utc = decode_cf_time(vals, "seconds since 1970-01-01 00:00:00+00:00")
    assert str(utc[1]) == "1970-01-01T00:00:01.000000000"
    with pytest.raises(Hdf5FormatError, match="time units"):
        decode_cf_time(vals, "fortnights since 1970-01-01")
    with pytest.raises(Hdf5FormatError, match="non-UTC"):
        decode_cf_time(vals, "seconds since 1970-01-01 00:00:00+05:30")


def test_decode_cf_time_float_values():
    """Float counts (climatology / unpacked time) decode exactly:
    whole units via the integer path, fractions via ns remainder."""
    vals = np.array([0.0, 0.5, 1.25], dtype=np.float64)
    days = decode_cf_time(vals, "days since 2000-01-01")
    assert str(days[1]) == "2000-01-01T12:00:00.000000000"
    assert str(days[2]) == "2000-01-02T06:00:00.000000000"
    # large whole parts stay exact (no float64 ns-product rounding)
    big = decode_cf_time(
        np.array([1069680.0]), "hours since 1900-01-01"
    )
    assert str(big[0]) == str(
        decode_cf_time(np.array([1069680]), "hours since 1900-01-01")[0]
    )
    with pytest.raises(Hdf5FormatError, match="NaN"):
        decode_cf_time(np.array([np.nan]), "days since 2000-01-01")


def test_cf_mask_and_scale_short_packed():
    """Classic short-packed ERA5: int16 counts + scale/offset, with
    -32767 fill → NaN. Mask applies to RAW values, before unpacking."""
    raw = np.array([100, 200, -32767, 300], dtype=np.int16)
    attrs = {"scale_factor": 0.1, "add_offset": 5.0, "_FillValue": -32767}
    out = cf_mask_and_scale(raw, attrs)
    assert out.dtype == np.float64
    np.testing.assert_allclose(out[[0, 1, 3]], [15.0, 25.0, 35.0])
    assert np.isnan(out[2])
    # missing_value list form + no-scale masking
    out2 = cf_mask_and_scale(
        np.array([1.0, 9999.0], dtype=np.float32),
        {"missing_value": [9999.0]},
    )
    assert np.isnan(out2[1]) and out2[0] == 1.0
    # no attrs → identity passthrough (bit-parity with committed files)
    same = np.array([1, 2], dtype=np.int32)
    assert cf_mask_and_scale(same, {}) is same


def test_era5_frame_unpacks_short_packed_variables(monkeypatch):
    """era5_frame applies CF mask_and_scale to data variables, matching
    the reference's xr.open_dataset default (ADVICE r3 finding)."""
    import big_data_in_agriculture_spark.sources.hdf5 as mod

    class _FakeDs:
        def __init__(self, attrs):
            self.attrs = attrs

    class _FakeH5:
        def __init__(self, _b):
            self.datasets = {
                "valid_time": _FakeDs({"units": "hours since 2022-02-01"}),
                "latitude": _FakeDs({}),
                "longitude": _FakeDs({}),
                "t2m": _FakeDs(
                    {
                        "scale_factor": 0.01,
                        "add_offset": 250.0,
                        "_FillValue": -32767,
                    }
                ),
            }

        def read(self, name):
            return {
                "valid_time": np.array([0, 1], dtype=np.int64),
                "latitude": np.array([50.0]),
                "longitude": np.array([30.0, 31.0]),
                "t2m": np.array(
                    [[[1000, -32767]], [[2000, 3000]]], dtype=np.int16
                ),
            }[name]

        def dim_names(self, name):
            return ["valid_time", "latitude", "longitude"]

    monkeypatch.setattr(mod, "Hdf5File", _FakeH5)
    frame = mod.era5_frame(b"irrelevant", ["t2m"])
    vals = frame["t2m"].tolist()
    np.testing.assert_allclose(vals[0], 260.0)
    assert np.isnan(vals[1])
    np.testing.assert_allclose(vals[2:], [270.0, 280.0])


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


# ---------------------------------------------------------------------------
# Hostile-bytes fuzz: the parser consumes attacker-shaped input (offsets,
# counts, heap ids). Property: ANY truncation or bit flip of a real CDS
# file either decodes successfully or raises Hdf5FormatError — never any
# other exception, never a hang, never an unbounded allocation. For
# truncations a successful full decode additionally implies value
# equality with the unmutated baseline (a prefix cannot change bytes it
# still contains; it can only make reads fall off the end, which must
# raise). Bit flips may legitimately land in data payload, so success
# there asserts shape/dtype stability only.
# ---------------------------------------------------------------------------

_ALL_RAW = [
    RAW_NC.replace("bashkortostan", r)
    for r in ("bashkortostan", "belarus", "moscow_oblast", "krasnodar")
]


def _decode_all(buf: bytes) -> dict[str, np.ndarray]:
    f = Hdf5File(buf)
    out = {}
    for name in f.datasets:
        try:
            out[name] = f.read(name)
        except Hdf5FormatError:
            pass  # vlen-string datasets (expver) refuse cleanly
    return out


@pytest.fixture(scope="module", params=_ALL_RAW, ids=lambda p: p[-40:])
def _fuzz_target(request):
    import os

    if not os.path.exists(request.param):
        pytest.skip("reference raw bytes not present")
    from big_data_in_agriculture_spark.sources.netcdf import (
        sniff_netcdf_bytes,
    )

    buf = sniff_netcdf_bytes(open(request.param, "rb").read())
    return buf, _decode_all(buf)


def test_fuzz_truncations(_fuzz_target):
    buf, baseline = _fuzz_target
    rng = np.random.RandomState(0xC0FFEE)
    cuts = np.concatenate(
        [
            rng.randint(0, len(buf), size=90),
            rng.randint(0, 4096, size=10),  # dense over the header region
        ]
    )
    for cut in cuts:
        try:
            got = _decode_all(bytes(buf[: int(cut)]))
        except Hdf5FormatError:
            continue
        for name, arr in got.items():
            np.testing.assert_array_equal(
                arr, baseline[name], err_msg=f"truncate@{cut} {name}"
            )


def test_fuzz_bit_flips(_fuzz_target):
    buf, baseline = _fuzz_target
    rng = np.random.RandomState(0xFEED)
    n = len(buf)
    offsets = np.concatenate(
        [rng.randint(0, n, size=60), rng.randint(0, 8192, size=40)]
    )
    bits = rng.randint(0, 8, size=len(offsets))
    for off, bit in zip(offsets, bits):
        mutated = bytearray(buf)
        mutated[int(off)] ^= 1 << int(bit)
        try:
            got = _decode_all(bytes(mutated))
        except Hdf5FormatError:
            continue
        for name, arr in got.items():
            if name in baseline:
                assert arr.shape == baseline[name].shape, (off, bit, name)
                assert arr.dtype == baseline[name].dtype, (off, bit, name)


def test_fuzz_word_stomps(_fuzz_target):
    """Overwrite aligned 8-byte words with adversarial values: 0,
    all-ones (UNDEF), small/huge offsets, self-references — the shapes
    that turn counts into bombs and pointers into cycles."""
    buf, baseline = _fuzz_target
    rng = np.random.RandomState(0xBEEF)
    n = len(buf)
    words = rng.randint(0, n // 8, size=100) * 8
    import struct as _s

    patterns = [
        b"\x00" * 8,
        b"\xff" * 8,
        _s.pack("<Q", 0xFFFFFFFFFFFFFFFF - 7),
        _s.pack("<Q", 1 << 62),
    ]
    for i, w in enumerate(words):
        mutated = bytearray(buf)
        pat = (
            patterns[i % len(patterns)]
            if i % 5
            else _s.pack("<Q", int(w))  # self-reference
        )
        mutated[int(w) : int(w) + 8] = pat
        try:
            got = _decode_all(bytes(mutated))
        except Hdf5FormatError:
            continue
        for name, arr in got.items():
            if name in baseline:
                assert arr.shape == baseline[name].shape, (int(w), name)


def _build_v0_file() -> bytes:
    """Hand-assemble a minimal superblock-v0 HDF5 file: old-style root
    group (symbol-table message → v1 B-tree → SNOD → local heap) with
    one contiguous float64 dataset carrying a v1 attribute — the
    old-library layout netcdf-c emits with pre-1.10 HDF5. Exercises
    the v0-superblock, v1-object-header, SNOD and v1-attribute paths
    the real CDS file (all new-style) never touches."""
    import struct

    UNDEF = 0xFFFFFFFFFFFFFFFF
    buf = bytearray()

    def pad(n: int) -> None:
        buf.extend(b"\x00" * ((n - len(buf) % n) % n))

    # ---- plan addresses (two-pass not needed: fixed sizes) ----
    # superblock: 0..96 ; dataset OH: 96 ; root OH after it; then
    # heap data, local heap, SNOD, B-tree, raw data.
    data = struct.pack("<4d", 1.5, 2.5, 3.5, 4.5)

    # dataset object header v1 (at 96)
    ds_msgs = []
    # dataspace v1: ver 1, rank 1, flags 0, res(5), dim 4
    ds_msgs.append((0x0001, struct.pack("<BBB5xQ", 1, 1, 0, 4)))
    # datatype: v1 class0? -> float64: byte0 0x11, bits 0x20 0 0, size 8,
    # props: bitoffset 0, precision 64, exploc 52, expsize 11, manloc 0,
    # mansize 52, bias 1023
    ds_msgs.append((
        0x0003,
        struct.pack("<B3BI", 0x11, 0x20, 0x3F, 0x00, 8)
        + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023),
    ))
    # attribute v1: name 'units', dtype = fixed string len 1, scalar
    attr_name = b"units\x00\x00\x00"  # 'units' padded to 8
    attr_dt = struct.pack("<B3BI", 0x13, 0, 0, 0, 1)  # v1 class3 size1
    attr_ds = struct.pack("<BBB5x", 1, 0, 0)  # v1 rank 0 -> 8 bytes
    attr_body = (
        struct.pack("<BBHHH", 1, 0, 6, len(attr_dt), len(attr_ds))
        + attr_name
        + attr_dt + b"\x00" * ((8 - len(attr_dt) % 8) % 8)
        + attr_ds
        + b"K"
    )
    ds_msgs.append((0x000C, attr_body))
    # layout v3 contiguous: addr/size patched later
    layout_at = None

    def v1_header(msgs) -> bytes:
        body = b""
        for mtype, mbody in msgs:
            mb = mbody + b"\x00" * ((8 - len(mbody) % 8) % 8)
            body += struct.pack("<HHB3x", mtype, len(mb), 0) + mb
        return (
            struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(body)) + body
        )

    # Two-pass layout: header SIZES are independent of the addresses
    # they embed, so build once with dummies to size, then rebuild.
    def ds_header_at(data_addr: int) -> bytes:
        layout = struct.pack("<BBQQ", 3, 1, data_addr, len(data))
        return v1_header(ds_msgs + [(0x0008, layout)])

    def root_header_at(btree: int, heap: int) -> bytes:
        return v1_header([(0x0011, struct.pack("<QQ", btree, heap))])

    ds_addr = 96
    root_addr = ds_addr + len(ds_header_at(0))
    heap_data_addr = root_addr + len(root_header_at(0, 0))
    heap_data = b"\x00" + b"temp\x00\x00\x00\x00"  # offset 0 unused; name at 1
    name_off = 1
    heap_addr = heap_data_addr + len(heap_data)
    local_heap = (
        b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, heap_data_addr)
    )
    snod_addr = heap_addr + len(local_heap)
    snod = (
        b"SNOD"
        + struct.pack("<BBH", 1, 0, 1)
        + struct.pack("<QQI4x16x", name_off, ds_addr, 0)
    )
    btree_addr = snod_addr + len(snod)
    btree = (
        b"TREE"
        + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        + struct.pack("<Q", 0)        # key 0
        + struct.pack("<Q", snod_addr)  # child 0
        + struct.pack("<Q", 0)        # key 1
    )
    data_addr = btree_addr + len(btree)

    ds_header = ds_header_at(data_addr)
    root_header = root_header_at(btree_addr, heap_addr)

    eof = data_addr + len(data)
    superblock = (
        b"\x89HDF\r\n\x1a\n"
        + struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        + struct.pack("<QQI4x16x", 0, root_addr, 0)  # root symbol entry
    )
    buf.extend(superblock)
    buf.extend(b"\x00" * (96 - len(buf)))
    buf.extend(ds_header)
    buf.extend(root_header)
    buf.extend(heap_data)
    buf.extend(local_heap)
    buf.extend(snod)
    buf.extend(btree)
    buf.extend(data)
    return bytes(buf)


def test_old_style_v0_superblock_and_snod_group():
    """Superblock v0 + v1 object headers + symbol-table group + v1
    attribute + contiguous data — the pre-1.10 layout — parses and
    reads correctly."""
    f = Hdf5File(_build_v0_file())
    assert list(f.datasets) == ["temp"]
    ds = f.datasets["temp"]
    assert ds.shape == (4,)
    assert ds.attrs["units"] == "K"
    assert f.read("temp").tolist() == [1.5, 2.5, 3.5, 4.5]


def test_deflate_overflow_detected_with_empty_unconsumed_tail():
    """A deflate chunk whose plaintext exceeds the declared chunk size
    must raise even when zlib consumed ALL input — pending output can
    sit in the decompressor with an empty unconsumed_tail, so the
    overflow probe has to be unconditional. Also: a stream cut short
    (no deflate EOF marker) raises here, not as a downstream reshape
    error."""
    import zlib as _zlib

    from big_data_in_agriculture_spark.sources.hdf5 import (
        Dataset,
        Datatype,
        Hdf5File,
    )

    ds = Dataset(
        name="x",
        shape=(4,),
        dtype=Datatype("int", 1, signed=False),
        chunk_dims=(4,),                 # declared bound: 4 bytes
        filters=[(1, [6])],              # deflate
    )
    fake = Hdf5File.__new__(Hdf5File)    # _apply_filters needs no buf

    # 1 MiB of zeros compresses to a tiny input that zlib consumes in
    # one call — overflow is only visible via buffered pending output.
    bomb = _zlib.compress(b"\x00" * (1 << 20), 9)
    with pytest.raises(Hdf5FormatError, match="deflate chunk"):
        fake._apply_filters(ds, bomb)

    # truncated stream: all input consumed, under bound, but no EOF
    whole = _zlib.compress(b"\x01\x02\x03\x04", 9)
    with pytest.raises(Hdf5FormatError, match="deflate chunk"):
        fake._apply_filters(ds, whole[:-2])

    # exact-size, well-formed chunk still decodes
    assert fake._apply_filters(ds, whole) == b"\x01\x02\x03\x04"
