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


class TestPhashNearDup:
    def _features(self, spark, patterns):
        # feature[i] = +1 if bit i (MSB-first) set else -1 → mean ≈ 0,
        # so the aHash reproduces the pattern exactly
        rows = []
        for aid, bits in patterns.items():
            assert len(bits) == 64
            rows.append((aid, [1.0 if b == "1" else -1.0 for b in bits]))
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("asset_id", T.LongType()),
                T.StructField("feature", T.ArrayType(T.FloatType())),
            ]
        )
        return spark.createDataFrame(rows, schema)

    def test_phash_reproduces_bit_pattern(self, spark):
        from big_data_in_agriculture_spark.operators import multimodal as mm

        bits = "1010" * 16
        df = self._features(spark, {1: bits})
        got = mm.perceptual_hash(df).first()["phash"]
        expect = int(bits, 2) - (1 << 64 if bits[0] == "1" else 0)
        assert got == expect

    def test_neardup_within_three_bits_found(self, spark):
        from big_data_in_agriculture_spark.operators import multimodal as mm

        base = "1010" * 16
        flip2 = base[:10] + ("0" if base[10] == "1" else "1") + base[11:]
        flip2 = flip2[:40] + ("0" if flip2[40] == "1" else "1") + flip2[41:]
        far = "1100" * 16  # distance 32
        df = self._features(spark, {1: base, 2: flip2, 3: far})
        rows = mm.phash_neardup(df, max_distance=3).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [
            (1, 2, 2)
        ]

    def test_identical_assets_distance_zero(self, spark):
        from big_data_in_agriculture_spark.operators import multimodal as mm

        bits = "0011" * 16
        df = self._features(spark, {7: bits, 9: bits})
        rows = mm.phash_neardup(df).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [
            (7, 9, 0)
        ]

    def test_distance_cap_guard(self, spark):
        import pytest as _pytest

        from big_data_in_agriculture_spark.operators import multimodal as mm

        df = self._features(spark, {1: "0" * 64})
        with _pytest.raises(ValueError):
            mm.phash_neardup(df, max_distance=5)
