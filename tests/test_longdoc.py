"""Giant-document linearity guards (the --longdoc adversarial axis).

Round-6 finds: higher-order-function lambdas that reference an
expression tree (instead of a let-bound lambda variable) re-evaluate
it PER ELEMENT — interpreted HOFs share no subexpressions — which
made word_shingles, repetition_filter's grams, _dsir_grams, and the
classifier gradient explode O(n_tokens²) per document (minutes per
20k-token doc; OOM for the classifier). These tests run exactly those
paths on a 30k-token document: with the let-bound forms they finish
in seconds; a quadratic regression turns each into ~minutes of wall
clock and fails the suite by timeout/hang, which is loud enough.

Correctness of the SAME code on normal-sized docs is covered by the
oracle sweeps; these tests only pin the long-doc behavior (values on
the planted doc are also asserted where cheap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_in_agriculture_spark.functions import text as TX
from big_data_in_agriculture_spark.operators import llm


@pytest.fixture(scope="module")
def long_docs(spark):
    # 30k tokens cycling over an 11-word sentence + one 2k-char
    # single token + one 20k-repeat word doc
    sent = "the quick brown fox jumps over the lazy dog again today "
    return spark.createDataFrame(
        [
            (1, (sent * 2728).strip(), "en", "t", 0),
            (2, "x" * 2000, "en", "t", 0),
            (3, ("spam " * 20000).strip(), "en", "t", 0),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_word_shingles_linear_on_long_doc(long_docs):
    out = long_docs.select(
        "doc_id", F.size(TX.word_shingles("text", 3)).alias("n")
    ).collect()
    by_id = {r["doc_id"]: r["n"] for r in out}
    # 11-word cycle -> 11 distinct 3-shingles; single token -> 1;
    # repeated word -> 1
    assert by_id == {1: 11, 2: 1, 3: 1}


def test_repetition_filter_linear_on_long_doc(long_docs):
    out = llm.repetition_filter(long_docs).collect()
    by_id = {r["doc_id"]: r["reason"] for r in out}
    # every planted doc is pure repetition -> each trips a gram rule
    assert set(by_id) == {1, 2, 3}
    assert by_id[1] != "ok" and by_id[3] != "ok"


def test_dsir_grams_linear_on_long_doc(long_docs, spark):
    n = (
        long_docs.filter("doc_id = 3")
        .select(F.size(llm._dsir_grams(F.col("text"), 1024)).alias("n"))
        .collect()[0]["n"]
    )
    assert n == 20000 + 19999  # unigrams + bigrams, duplicates kept


def test_classifier_trains_on_long_docs(long_docs):
    # the gradient explode must not carry the buckets array through
    # Generate (OOM'd a 1 GB heap pre-fix on 20k-token docs)
    w, b = llm.classifier_train(
        long_docs, (F.col("doc_id") % 2 == 0), dim=16, iters=2, quantize=6
    )
    assert len(w) == 16


def test_top_ngram_and_dup_line_fractions_long_doc(long_docs):
    out = long_docs.select(
        "doc_id",
        TX.top_ngram_char_fraction("text", 2).alias("f2"),
        TX.dup_line_char_fraction("text").alias("fd"),
    ).collect()
    f2 = {r["doc_id"]: r["f2"] for r in out}
    # doc 3 is ONE distinct bigram with 19999 overlapping occurrences:
    # coverage = 19999 * len("spam spam") / 99999 chars = 1.79998...
    # (>1 by design — occurrences overlap; the gate only compares > T)
    assert f2[3] == pytest.approx(19999 * 9 / 99999, abs=1e-9)
