"""Similarity search: brute-force and LSH kNN over embedding arrays."""

from __future__ import annotations

import math

import pytest

from big_data_in_agriculture_spark.operators import similarity

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [1.0, 0.0, 0.0, 0.0]),    # identical to 0
    (2, [0.9, 0.1, 0.0, 0.0]),    # close to 0
    (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
    (4, [0.0, 0.0, 1.0, 0.0]),
]


@pytest.fixture()
def emb(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_bruteforce_ranks_by_cosine(emb):
    q = emb.filter("vec_id = 0")
    out = [(r["neighbor_id"], r["cosine_sim"], r["rank"])
           for r in similarity.knn_bruteforce(emb, q, k=3).collect()]
    assert out[0][0] == 1 and out[0][1] == pytest.approx(1.0)
    assert out[1][0] == 2
    assert out[1][1] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    # orthogonal vectors rank last among the top-3
    assert out[2][1] == pytest.approx(0.0, abs=1e-6)


def test_bruteforce_excludes_self(emb):
    q = emb.filter("vec_id = 0")
    assert all(r["neighbor_id"] != 0 for r in similarity.knn_bruteforce(emb, q, k=4).collect())


def test_bruteforce_tie_break_deterministic(emb):
    # ids 3 and 4 are both orthogonal to the query → equal sim; the
    # tie must break on neighbor_id, so rank order is stable.
    q = emb.filter("vec_id = 0")
    out = similarity.knn_bruteforce(emb, q, k=4).collect()
    tied = [r["neighbor_id"] for r in out if abs(r["cosine_sim"]) < 1e-9]
    assert tied == sorted(tied)


def test_lsh_finds_identical_vector(emb):
    q = emb.filter("vec_id = 0")
    out = similarity.knn_lsh(emb, q, dim=4, k=2, num_tables=4, num_bits=2).collect()
    assert out and out[0]["neighbor_id"] == 1
    assert out[0]["cosine_sim"] == pytest.approx(1.0)


def test_norm_stats(spark):
    df = spark.createDataFrame(
        [("x", [3.0, 4.0]), ("x", [6.0, 8.0]), ("y", [1.0, 0.0])],
        ["label", "embedding"],
    )
    out = {r["label"]: r for r in similarity.norm_stats_by_label(df).collect()}
    assert out["x"]["n_vectors"] == 2
    assert out["x"]["min_norm"] == pytest.approx(5.0)
    assert out["x"]["max_norm"] == pytest.approx(10.0)
    assert out["y"]["avg_norm"] == pytest.approx(1.0)
