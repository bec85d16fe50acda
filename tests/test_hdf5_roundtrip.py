"""Positive-space fuzz: read(write(x)) == x over random HDF5 layouts.

The reader's positive coverage was previously limited to six committed
CDS files and mutations of them; this property test generates ≥100
synthetic layouts — random dtypes, ranks, shapes, chunk grids (edge
chunks, chunk dims larger than the data), filter combinations, and
2-level chunk B-trees — through the minimal in-repo writer
(tests/_hdf5_writer.py) and requires byte-exact round-trips through
sources/hdf5.py. Complements the hostile-bytes negative-space fuzz in
tests/test_hdf5.py.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_in_agriculture_spark.sources.hdf5 import Hdf5File

from _hdf5_writer import write_hdf5

_DTYPES = ["<f4", "<f8", "<i1", "<i2", "<i4", "<i8", "<u1", "<u2", "<u4", "<u8"]


def _array(draw, rank):
    dt = np.dtype(draw(st.sampled_from(_DTYPES)))
    shape = tuple(
        draw(st.integers(min_value=1, max_value=9)) for _ in range(rank)
    )
    n = int(np.prod(shape))
    if dt.kind == "f":
        vals = draw(
            st.lists(
                st.floats(
                    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
                ),
                min_size=n, max_size=n,
            )
        )
    else:
        info = np.iinfo(dt)
        vals = draw(
            st.lists(
                st.integers(min_value=int(info.min), max_value=int(info.max)),
                min_size=n, max_size=n,
            )
        )
    return np.array(vals, dtype=dt).reshape(shape)


@st.composite
def _layout(draw):
    rank = draw(st.integers(min_value=1, max_value=3))
    arr = _array(draw, rank)
    chunked = draw(st.booleans())
    cdims = None
    if chunked:
        # chunk dims deliberately allowed to EXCEED the data extent
        # (clip path) and to tile unevenly (edge-chunk padding path)
        cdims = tuple(
            draw(st.integers(min_value=1, max_value=s + 3))
            for s in arr.shape
        )
    shuffle = chunked and draw(st.booleans())
    deflate = draw(st.sampled_from([None, 1, 6, 9])) if chunked else None
    sbver = draw(st.sampled_from([0, 1, 2, 3]))
    return arr, cdims, shuffle, deflate, sbver


@settings(max_examples=150, deadline=None)
@given(_layout())
def test_roundtrip_random_layouts(layout):
    arr, cdims, shuffle, deflate, sbver = layout
    blob = write_hdf5(
        {"x": arr},
        chunk_dims={"x": cdims} if cdims else None,
        deflate_level=deflate,
        shuffle=shuffle,
        superblock_version=sbver,
    )
    f = Hdf5File(blob)
    got = f.read("x")
    assert got.dtype == arr.dtype
    assert got.shape == arr.shape
    np.testing.assert_array_equal(got, arr)


def test_roundtrip_multiple_datasets_and_deep_btree():
    """3 datasets in one file; one has enough chunks to force a 2-level
    chunk B-tree (internal-node traversal path)."""
    rng = np.random.default_rng(7)
    big = rng.integers(-1000, 1000, size=(12, 11), dtype=np.int32)
    vec = rng.standard_normal(17).astype("<f8")
    flat = rng.integers(0, 255, size=33, dtype=np.uint8)
    blob = write_hdf5(
        {"big": big, "vec": vec, "flat": flat},
        chunk_dims={"big": (2, 3), "vec": (4,)},
        deflate_level=6,
        shuffle=True,
        btree_fanout=4,  # 6x4=24 chunks for `big` -> internal level
    )
    f = Hdf5File(blob)
    np.testing.assert_array_equal(f.read("big"), big)
    np.testing.assert_array_equal(f.read("vec"), vec)
    np.testing.assert_array_equal(f.read("flat"), flat)  # contiguous


def test_roundtrip_edge_chunks_use_fill_clipping():
    """Chunk grid overhangs the data on both axes; the reader must clip
    the padded edge chunks exactly."""
    arr = np.arange(35, dtype="<f4").reshape(5, 7)
    blob = write_hdf5({"x": arr}, chunk_dims={"x": (3, 4)}, deflate_level=9)
    np.testing.assert_array_equal(Hdf5File(blob).read("x"), arr)


@pytest.mark.parametrize("level", [None, 1, 9])
def test_roundtrip_deflate_levels(level):
    arr = np.zeros((4, 4, 4), dtype="<i8")  # max-compressible
    blob = write_hdf5({"x": arr}, chunk_dims={"x": (4, 4, 4)},
                      deflate_level=level)
    np.testing.assert_array_equal(Hdf5File(blob).read("x"), arr)


@pytest.mark.parametrize("sbver", [0, 1, 2, 3])
def test_roundtrip_superblock_versions(sbver):
    """All four superblock prefixes the reader parses: v0/v1 carry a
    root symbol-table entry (v1 shifts every field by the 4-byte
    indexed-storage K), v2/v3 a direct root object-header address —
    previously exercised only by the six committed CDS files."""
    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    blob = write_hdf5(
        {"x": arr}, chunk_dims={"x": (2, 3)}, deflate_level=6,
        shuffle=True, superblock_version=sbver,
    )
    assert blob[8] == sbver
    np.testing.assert_array_equal(Hdf5File(blob).read("x"), arr)
