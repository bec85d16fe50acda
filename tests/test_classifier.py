"""Hashing-trick linear classifier: training separates planted classes,
scoring is map-only and deterministic, buckets are engine-portable."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.operators import llm


def _corpus(spark, n=60):
    # Planted separable classes: spam docs carry marker tokens.
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((f"d{i:03d}", f"buy cheap pills now offer {i} click win", 1))
        else:
            rows.append((f"d{i:03d}", f"the committee reviewed the annual {i} budget report", 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def test_train_separates_planted_classes(spark):
    docs = _corpus(spark)
    w, b = llm.classifier_train(docs, F.col("y"), dim=64, iters=30, lr=2.0)
    scored = llm.classifier_score(docs, w, b, dim=64).join(
        docs.select("doc_id", "y"), "doc_id"
    )
    rows = scored.collect()
    spam = [r["score"] for r in rows if r["y"] == 1]
    ham = [r["score"] for r in rows if r["y"] == 0]
    assert min(spam) > max(ham)  # perfectly separable marker vocab
    acc = sum((s > 0.5) == (y == 1) for s, y in
              [(r["score"], r["y"]) for r in rows]) / len(rows)
    assert acc == 1.0


def test_train_deterministic_under_repartition(spark):
    docs = _corpus(spark)
    w1, b1 = llm.classifier_train(docs, F.col("y"), dim=32, iters=5)
    w2, b2 = llm.classifier_train(
        docs.repartition(7), F.col("y"), dim=32, iters=5
    )
    # float reduction order may differ across partitionings; the model
    # must agree to well beyond the decision scale
    assert b1 == pytest.approx(b2, abs=1e-9)
    assert w1 == pytest.approx(w2, abs=1e-9)


def test_score_matches_manual_margin(spark):
    # One doc, dim=4, hand-computed margin from the md5 bucket formula.
    import hashlib

    text = "alpha beta alpha"
    dim = 4
    w = [0.5, -1.0, 2.0, 0.25]
    b = 0.125

    def bucket(tok):
        return int(hashlib.md5(tok.lower().encode()).hexdigest()[:8], 16) % dim

    toks = text.split(" ")
    margin = sum(w[bucket(t)] for t in toks) / len(toks) + b
    want = 1.0 / (1.0 + math.exp(-margin))
    docs = spark.createDataFrame([("d1", text)], ["doc_id", "text"])
    got = llm.classifier_score(docs, w, b, dim=dim).first()["score"]
    assert got == pytest.approx(want, rel=1e-12)


def test_score_handles_empty_and_weights_validation(spark):
    docs = spark.createDataFrame([("d1", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        llm.classifier_score(docs, [0.0] * 3, dim=4)
