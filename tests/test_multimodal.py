"""Multimodal plumbing: metadata pass, feature extraction, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from big_data_in_agriculture_spark.operators import multimodal


@pytest.fixture()
def assets(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG-fake-bytes-0123456789")),
        (2, "image", "image/png", bytearray(b"\x89PNG-other")),
    ]
    return spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)


def test_metadata_is_jvm_side(assets):
    out = multimodal.asset_metadata(assets).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 26
    assert by_id[2]["payload_sha"] == hashlib.sha256(b"\x89PNG-other").hexdigest()


def test_extract_features_with_injected_kernel(assets):
    def kernel(raw: bytes):
        return (len(raw), 2, [float(raw[0]), float(len(raw))])

    out = {r["asset_id"]: r for r in multimodal.extract_features(assets, kernel).collect()}
    assert out[1]["width"] == 26 and out[1]["height"] == 2
    assert out[1]["feature"] == [137.0, 26.0]
    assert out[1]["payload_sha"] == hashlib.sha256(b"\x89PNG-fake-bytes-0123456789").hexdigest()
    assert "payload" not in multimodal.extract_features(assets, kernel).columns


def test_default_decode_is_stubbed(assets):
    with pytest.raises(Exception, match="image codec"):
        multimodal.extract_features(assets).collect()


def test_sample_frames_fanout(assets):
    out = multimodal.sample_frames(assets, every_n=5).collect()
    per_asset = {}
    for r in out:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert len(per_asset[1]) == 5
    # frames are deterministic slices of the payload
    joined = b"".join(bytes(r["frame"]) for r in sorted(per_asset[1], key=lambda r: r["frame_idx"]))
    assert b"\x89PNG-fake" in joined


def test_resize_images_plumbing(spark):
    from big_data_in_agriculture_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 10)), (2, bytearray(b"y" * 50))],
        "asset_id LONG, payload BINARY",
    )
    out = {r["asset_id"]: r for r in
           resize_images(df, width=4, height=5).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r["width"], r["height"]) == (4, 5)
        assert len(r["payload"]) == 20  # truncated/padded to w*h
    assert bytes(out[1]["payload"]).startswith(b"xxxxxxxxxx\0")  # padded

    # injectable kernel replaces the stub (the real-codec path)
    tagged = resize_images(
        df, width=2, height=2,
        resize_fn=lambda p, w, h: b"RSZ" + bytes([w, h]),
    ).collect()
    assert all(bytes(r["payload"]) == b"RSZ\x02\x02" for r in tagged)
