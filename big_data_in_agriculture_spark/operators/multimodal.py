"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data lake carries image/audio/video as ``binary``
columns beside typed metadata, processed by Arrow-batched Python
islands (``mapInPandas``) — the decode libraries do the per-item work;
Spark does partitioning, batching, and shuffle-free column plumbing.

This container ships no image/audio codecs, so the decode kernels are
STUBS: the Spark-side plumbing (schemas, batch shapes, partition
behavior, UDF signatures) is real and tested with deterministic fake
kernels; ``default_image_decode`` raises a clearly-marked
NotImplementedError exactly like ``sources.netcdf.default_decoder``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: An asset row: opaque payload + the metadata a lake keeps queryable.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),   # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

#: Feature rows produced by decode/extract kernels.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def asset_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash.

    No Python island needed — these run in whole-stage codegen, so a
    metadata-only pass over 100 TB of binaries never starts a Python
    worker.
    """
    return df.withColumn("n_bytes", F.length(payload_col).cast("long")).withColumn(
        "payload_sha", F.sha2(payload_col, 256)
    )


def default_image_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode an image payload → (width, height, feature vector).

    Requires an image codec (Pillow/OpenCV), absent from this
    container — STUB per the build contract; inject a kernel instead.
    """
    raise NotImplementedError(
        "image decode requires an image codec (e.g. Pillow), which is not "
        "installed in this environment. Pass decode_fn=... to "
        "extract_features; the Spark plumbing around the kernel is real."
    )


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, list[float]]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in, one out; the payload column is dropped on
    output so the (huge) binaries never re-shuffle after this stage —
    downstream similarity search joins on ``asset_id``.
    """
    kernel = decode_fn or default_image_decode

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    # NULL payload (failed fetch/decode upstream): keep
                    # the asset row visible with NULL features — the
                    # quarantine-not-crash contract, and what the SQL
                    # twin's length(NULL)/sha(NULL) produce
                    out.append(
                        {
                            "asset_id": int(aid),
                            "n_bytes": None,
                            "payload_sha": None,
                            "width": None,
                            "height": None,
                            "feature": None,
                        }
                    )
                    continue
                raw = bytes(payload)
                w, h, feat = kernel(raw)
                out.append(
                    {
                        "asset_id": int(aid),
                        "n_bytes": len(raw),
                        "payload_sha": hashlib.sha256(raw).hexdigest(),
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.select(id_col, payload_col).mapInPandas(_run, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame,
    every_n: int = 10,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    frame_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video → sampled frame payloads (1 row per kept frame).

    ``frame_fn(payload, every_n)`` returns the kept frames; the default
    deterministic stub slices the payload into ``every_n`` chunks so the
    fan-out shape (one input row → many output rows, bounded memory per
    batch) is exercised without a video codec.
    """
    def _default(payload: bytes, n: int) -> list[bytes]:
        if not payload:
            return []
        step = max(1, len(payload) // n)
        return [payload[i : i + step] for i in range(0, len(payload), step)][:n]

    kernel = frame_fn or _default
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in enumerate(kernel(bytes(payload), every_n)):
                    rows.append({"asset_id": int(aid), "frame_idx": i, "frame": frame})
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return assets.select(id_col, payload_col).mapInPandas(_run, schema=schema)


def resize_images(
    assets: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image → fixed-size image payload (the pre-training resize pass).

    ``resize_fn(payload, w, h)`` returns the re-encoded image; with no
    codec installed the default deterministic stub truncates/pads the
    payload to ``w*h`` bytes — the plumbing under test is the real
    part: binary-in/binary-out mapInPandas, declared output schema with
    the target dims attached as typed metadata columns, one Arrow batch
    per chunk so a 100 TB image column streams through bounded memory.
    """
    def _default(payload: bytes, w: int, h: int) -> bytes:
        target = w * h
        return payload[:target].ljust(target, b"\0")

    kernel = resize_fn or _default
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf[id_col].astype("int64"),
                "width": width,
                "height": height,
                "payload": [
                    kernel(bytes(p), width, height) for p in pdf[payload_col]
                ],
            }
            yield pd.DataFrame(out, columns=["asset_id", "width", "height", "payload"])

    return assets.select(id_col, payload_col).mapInPandas(_run, schema=schema)


def perceptual_hash(
    features: DataFrame,
    feature_col: str = "feature",
    id_col: str = "asset_id",
) -> DataFrame:
    """64-bit average-hash (aHash) from a decoded feature vector.

    The image near-dup key: bit i = (feature[i] > mean of the first 64
    components). Runs entirely JVM-side on the `extract_features`
    output — the binary payload is long gone by this stage, so hashing
    100 TB of images shuffles nothing and decodes nothing twice.
    MSB-first accumulation (acc·2 + bit) packs the bits into one long
    (Java wrap-around on the top bit is deterministic).
    """
    padded = F.slice(
        F.concat(
            F.transform(F.col(feature_col), lambda x: x.cast("double")),
            F.array_repeat(F.lit(0.0), 64),
        ),
        1,
        64,
    )
    mean = F.aggregate(padded, F.lit(0.0), lambda a, x: a + x) / F.lit(64.0)

    def _pack(vals: Column) -> Column:
        # acc·2 + bit over ≤32 bits — stays far below long overflow
        # (ANSI mode rejects the wrap a full 64-bit fold would hit)
        return F.aggregate(
            vals,
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(2).cast("long")
            + F.when(x > mean, 1).otherwise(0).cast("long"),
        )

    hi = _pack(F.slice(padded, 1, 32))
    lo = _pack(F.slice(padded, 33, 32))
    phash = F.shiftleft(hi, 32).bitwiseOR(lo)
    return features.select(F.col(id_col), phash.alias("phash"))


def phash_neardup(
    features: DataFrame,
    max_distance: int = 3,
    feature_col: str = "feature",
    id_col: str = "asset_id",
) -> DataFrame:
    """Image near-dup pairs by Hamming distance on the 64-bit aHash.

    Banding with a PIGEONHOLE GUARANTEE instead of a probabilistic
    S-curve: the hash splits into 4 disjoint 16-bit bands, and any two
    hashes within Hamming distance 3 must agree on at least one whole
    band — so candidate generation (equi-join on (band, value)) has
    100% recall for max_distance ≤ 3, with exact `bit_count(xor)`
    verification after. Same shuffle shape as MinHash-LSH: map-only
    band explode, one uniform-key join, no cross join anywhere.
    """
    if max_distance > 3:
        raise ValueError(
            "4-band pigeonhole guarantees recall only for max_distance <= 3"
        )
    hashes = perceptual_hash(features, feature_col, id_col)
    banded = hashes.select(
        F.col(id_col).alias("id"),
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("phash"), 16 * j)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "phash", "bb.band", "bb.val")
    a = banded.select(
        F.col("id").alias("id_a"), F.col("phash").alias("_ha"), "band", "val"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("phash").alias("_hb"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        )
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )
