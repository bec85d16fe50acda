"""Contamination recovery, vocab coverage, rolling z-score, ANN recall."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.operators.llm import (
    contamination,
    vocab_coverage,
)
from big_data_in_agriculture_spark.operators.timeseries import rolling_zscore


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_finds_planted_overlap(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight"),
        (3, "totally unrelated words nothing shared here at all"),
    ])
    ev = _docs(spark, [
        (100, "alpha beta gamma delta epsilon"),      # half of doc 1
        (200, "completely different eval content ok"),
    ])
    out = {r["train_id"]: r for r in contamination(train, ev, min_common=3).collect()}
    assert set(out) == {1}
    assert out[1]["n_eval_docs"] == 1
    assert out[1]["max_common"] >= 3


def test_contamination_excludes_eval_ids_from_train(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    train = _docs(spark, [(1, shared), (2, "other words entirely here")])
    ev = _docs(spark, [(1, shared)])  # same id AND same text
    out = contamination(train, ev, min_common=3).collect()
    assert out == []  # id 1 is eval itself, not a contaminated train doc


def test_vocab_coverage_full_vocab_is_one(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b d")])
    row = vocab_coverage(docs, vocab_size=100).collect()[0]
    assert row["total_tokens"] == 6
    assert row["n_distinct_tokens"] == 4
    assert row["covered_tokens"] == 6
    assert row["coverage"] == pytest.approx(1.0)


def test_vocab_coverage_topn_prefers_frequent(spark):
    docs = _docs(spark, [(1, "a a a b"), (2, "a a c d")])
    row = vocab_coverage(docs, vocab_size=1).collect()[0]
    assert row["covered_tokens"] == 5  # vocab = {a}
    assert row["coverage"] == pytest.approx(5 / 8)


def test_rolling_zscore_flags_spike_not_baseline(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("k", base + dt.timedelta(days=i), 10.0 + (i % 2)) for i in range(7)]
    rows.append(("k", base + dt.timedelta(days=7), 100.0))  # spike
    daily = spark.createDataFrame(rows, ["key", "day", "value"])
    out = rolling_zscore(daily, days=7, min_points=3, z_thresh=2.5).collect()
    assert len(out) == 1
    assert out[0]["day"] == base + dt.timedelta(days=7)
    assert out[0]["zscore"] > 2.5


def test_rolling_zscore_needs_min_points_and_variance(spark):
    base = dt.datetime(2024, 1, 1)
    constant = [("c", base + dt.timedelta(days=i), 5.0) for i in range(5)]
    sparse = [("s", base, 1.0), ("s", base + dt.timedelta(days=1), 99.0)]
    daily = spark.createDataFrame(constant + sparse, ["key", "day", "value"])
    # constant series: sd = 0 → no flags; sparse: n < min_points → none
    assert rolling_zscore(daily, days=7, min_points=3).collect() == []


def test_ann_recall_on_planted_neighbors(spark):
    # The driver's embeddings are random — every pair sits near cosine
    # 0, so "top-10 of noise" is not a retrievable target for ANY ann
    # index. The meaningful recall question is over genuinely-near
    # vectors: plant 5 noisy copies (cos ≈ 0.999) of each query and
    # require the approximate paths to retrieve them.
    import numpy as np

    from big_data_in_agriculture_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_ivfpq,
        knn_lsh,
        knn_pq,
        knn_rp,
        knn_sq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.filter(F.col("vec_id") < 10).collect()}
    rng = np.random.default_rng(7)
    planted_rows, planted = [], {}
    for vid, v in base.items():
        ids = []
        for j in range(5):
            noisy = v + 0.03 * np.linalg.norm(v) / 8.0 * rng.standard_normal(v.size)
            pid = 10_000 + vid * 10 + j
            ids.append(pid)
            planted_rows.append((pid, noisy.astype(float).tolist(), "planted"))
        planted[vid] = set(ids)
    corpus = emb.select("vec_id", "embedding", "label").unionByName(
        spark.createDataFrame(planted_rows, ["vec_id", "embedding", "label"])
    )
    queries = emb.filter(F.col("vec_id") < 10)
    k = 8

    def found(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = found(knn_bruteforce(corpus, queries, k=k))
    for q, ids in planted.items():
        assert ids <= exact[q]  # cos≈0.999 beats any random pair

    for approx_df, floor in [
        (knn_lsh(corpus, queries, dim=64, k=k, num_tables=8, num_bits=8), 0.8),
        # round 8: trained coarse centroids (kmeans_fit) lifted the
        # floor 0.6 -> 0.8 (measured 1.0 on this corpus)
        (knn_ivf(corpus, queries, k=k, n_centroids=8, n_probe=3), 0.8),
        # planted cos≈0.999 neighbors survive any JL projection — the
        # projected cosine of near-identical vectors stays near 1
        (knn_rp(corpus, queries, dim=64, k=k, out_dim=32,
                n_candidates=50), 0.9),
        # near-identical vectors land in (almost) the same code word
        # per subspace, so their ADC distance is near the minimum
        (knn_pq(corpus, queries, dim=64, k=k, n_candidates=50), 0.8),
        # near-identical vectors share a coarse cell AND a code word;
        # round 8: trained cells + residual codes, floor 0.6 -> 0.8
        # (measured 1.0 on this corpus)
        (knn_ivfpq(corpus, queries, dim=64, k=k, n_centroids=8,
                   n_probe=3, n_candidates=50), 0.8),
        # 256 levels per dim: reconstruction error << the planted
        # noise, so the ADC screen is near-exact on these neighbors
        (knn_sq(corpus, queries, dim=64, k=k, n_candidates=50), 0.9),
    ]:
        got = found(approx_df)
        recalls = [
            len(planted[q] & got.get(q, set())) / len(planted[q])
            for q in planted
        ]
        assert sum(recalls) / len(recalls) >= floor
