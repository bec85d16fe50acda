"""Deterministic sampling, tf-idf ranking, constraint checks, transitions."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from big_data_in_agriculture_spark.operators.analytics import event_transitions
from big_data_in_agriculture_spark.operators.llm import (
    group_sample,
    stratified_sample,
    tfidf_top_terms,
)
from big_data_in_agriculture_spark.operators.profile import check_constraints


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(spark, [
        (1, "en", "the cat sat"),
        (2, "en", "the dog ran"),
        (3, "en", "the cat ran"),
    ])
    out = tfidf_top_terms(docs, k=1).collect()
    # "the" appears in every doc → idf = ln(3/3) = 0, never top
    top = {r["doc_id"]: r["token"] for r in out}
    assert top[1] == "sat" and top[2] == "dog"
    r1 = [r for r in out if r["doc_id"] == 1][0]
    assert math.isclose(r1["tfidf"], 1 * math.log(3 / 1), rel_tol=1e-6)


def test_tfidf_tie_breaks_by_token(spark):
    docs = _docs(spark, [(1, "en", "b a"), (2, "en", "c d")])
    out = tfidf_top_terms(docs, k=2).collect()
    d1 = [r["token"] for r in sorted(out, key=lambda r: r["rank"])
          if r["doc_id"] == 1]
    assert d1 == ["a", "b"]  # equal scores → lexicographic


def test_stratified_sample_deterministic_and_rate(spark):
    docs = _docs(spark, [(i, "en" if i % 2 else "de", f"t{i}")
                         for i in range(1000)])
    rates = {"en": 0.3, "de": 1.0}
    a = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(7), rates).collect()}
    assert a == b  # partitioning-independent
    n_de = sum(1 for i in a if i % 2 == 0)
    n_en = len(a) - n_de
    assert n_de == 500  # rate 1.0 keeps everything
    assert 100 < n_en < 200  # ~150 expected, loose 3-sigma-ish band


def test_stratified_sample_drops_unlisted_stratum(spark):
    docs = _docs(spark, [(1, "en", "x"), (2, "fr", "y")])
    kept = stratified_sample(docs, {"en": 1.0}).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_group_sample_exact_k_and_stable(spark):
    docs = _docs(spark, [(i, "en" if i % 2 else "de", f"t{i}")
                         for i in range(100)])
    out = group_sample(docs, group_col="lang", k=5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 5, "de": 5}
    again = {r["doc_id"] for r in
             group_sample(docs.repartition(9), "lang", 5).collect()}
    assert again == {r["doc_id"] for r in out.collect()}


def test_check_constraints_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 200.0)], ["id", "v"]
    )
    out = {r["check_name"]: r for r in check_constraints(
        df, {"v_small": F.col("v") < 100, "id_pos": F.col("id") > 0}
    ).collect()}
    assert out["v_small"]["n_violations"] == 2  # NULL + 200
    assert out["id_pos"]["n_violations"] == 0
    assert out["v_small"]["n_rows"] == 3
    assert math.isclose(out["v_small"]["violation_rate"], 2 / 3)


def test_event_transitions_counts_and_probs(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    ev = spark.createDataFrame(
        [
            (1, t(0), 10, "view"), (2, t(1), 10, "click"),
            (3, t(2), 10, "view"), (4, t(3), 10, "click"),
            (5, t(0), 20, "view"), (6, t(1), 20, "purchase"),
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )
    out = {(r["from_type"], r["to_type"]): r for r in
           event_transitions(ev).collect()}
    assert out[("view", "click")]["n"] == 2
    assert out[("view", "purchase")]["n"] == 1
    assert out[("click", "view")]["n"] == 1
    assert math.isclose(out[("view", "click")]["p_transition"], 2 / 3)


def test_event_transitions_tie_broken_by_event_id(spark):
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(2, t0, 1, "b"), (1, t0, 1, "a")],
        ["event_id", "ts", "user_id", "event_type"],
    )
    out = event_transitions(ev).collect()
    assert len(out) == 1
    assert (out[0]["from_type"], out[0]["to_type"]) == ("a", "b")


def test_correlation_matrix_perfect_and_inverse(spark):
    from big_data_in_agriculture_spark.operators.profile import correlation_matrix

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(20)],
        ["a", "b", "c"],
    )
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)
    assert len(out) == 3


def test_quantile_bins_equal_frequency(spark):
    from big_data_in_agriculture_spark.operators.profile import quantile_bins

    df = spark.createDataFrame([(float(i),) for i in range(400)], ["v"])
    out = quantile_bins(df, "v", bins=4).collect()
    assert [r["bin_id"] for r in out] == [0, 1, 2, 3]
    assert all(95 <= r["n"] <= 105 for r in out)  # ~100 each
    assert out[0]["bin_min"] == 0.0


def test_lang_confusion_diagonal_dominates(spark):
    from big_data_in_agriculture_spark.operators.llm import lang_confusion

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat and the dog of it"),
            (2, "en", "it is the best of all"),
            (3, "de", "der hund und die katze das"),
            (4, "fr", "le chat et la maison de"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = {(r["lang_label"], r["lang_pred"]): r
           for r in lang_confusion(docs).collect()}
    assert out[("en", "en")]["n"] == 2
    assert out[("en", "en")]["rate"] == pytest.approx(1.0)
    assert ("de", "de") in out and ("fr", "fr") in out


def test_winsorize_clips_both_tails(spark):
    from big_data_in_agriculture_spark.operators.profile import winsorize

    df = spark.createDataFrame([(float(i),) for i in range(101)], ["v"])
    out = [r["v"] for r in winsorize(df, "v", 0.10, 0.90).collect()]
    assert min(out) == 10.0 and max(out) == 90.0
    assert len(out) == 101  # clipping, not filtering
    assert sorted(out)[50] == 50.0  # interior untouched


def test_impute_group_mean_fills_only_nulls(spark):
    from big_data_in_agriculture_spark.operators.profile import impute_group_mean

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, None), (2, None), (2, None)],
        ["g", "v"],
    )
    out = impute_group_mean(df, "g", "v").collect()
    g1 = sorted(r["v"] for r in out if r["g"] == 1)
    assert g1 == [10.0, 15.0, 20.0]  # null -> group mean
    # all-null group stays null
    assert all(r["v"] is None for r in out if r["g"] == 2)


def test_token_entropy_uniform_vs_repetitive(spark):
    from big_data_in_agriculture_spark.operators.llm import token_entropy

    docs = _docs(spark, [
        (1, "en", "a b c d"),      # uniform: entropy = ln(4)
        (2, "en", "a a a a"),      # degenerate: entropy = 0
    ])
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert out[1]["entropy"] == pytest.approx(math.log(4), rel=1e-6)
    assert out[2]["entropy"] == pytest.approx(0.0, abs=1e-7)
    assert out[1]["n_tokens"] == 4


def test_bpe_merge_step_finds_dominant_pair(spark):
    from big_data_in_agriculture_spark.operators.llm import bpe_merge_step

    docs = _docs(spark, [
        (1, "en", "new york new york new york"),
        (2, "en", "san francisco new york"),
        (3, "en", "solo"),
    ])
    out = bpe_merge_step(docs, k=2).collect()
    assert out[0]["pair"] == "new york" and out[0]["n"] == 4
    # "york new" (2) beats the singles; ties would break lexically
    assert out[1]["pair"] == "york new" and out[1]["n"] == 2


def test_bpe_train_textbook_sequence(spark):
    from big_data_in_agriculture_spark.operators.llm import bpe_train

    # Sennrich et al.'s canonical example: low x5, lower x2,
    # newest x6, widest x3 — first merges must be (e,s) then (es,t)
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2
                      + ["newest"] * 6 + ["widest"] * 3))],
        ["doc_id", "text"],
    )
    merges = bpe_train(docs, n_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges[2:] and ("lo", "w") in merges[2:]


def test_bpe_train_deterministic_under_repartition(spark):
    from big_data_in_agriculture_spark.operators.llm import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bpe_train(docs, n_merges=3)
    b = bpe_train(docs.repartition(7), n_merges=3)
    assert a == b and len(a) == 3


def test_mixture_sample_hits_target_proportions(spark):
    from big_data_in_agriculture_spark.operators.llm import mixture_sample

    # 400/200/100 docs; targets 1:1:2 -> src2 binds (100/0.5=200 total):
    # expect ~50/50/100 kept
    rows = (
        [(i, "a", "s0") for i in range(400)]
        + [(i + 1000, "a", "s1") for i in range(200)]
        + [(i + 2000, "a", "s2") for i in range(100)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = mixture_sample(
        docs, {"s0": 0.25, "s1": 0.25, "s2": 0.5}, strata_col="source"
    )
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["s2"] == 100                      # binding domain kept whole
    assert abs(got["s0"] - 50) <= 15             # md5-Bernoulli around rate
    assert abs(got["s1"] - 50) <= 15
    # determinism + append-stability: same draw on a reshuffled frame
    again = mixture_sample(
        docs.repartition(13), {"s0": 0.25, "s1": 0.25, "s2": 0.5},
        strata_col="source",
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_mixture_sample_absent_domain_dropped(spark):
    from big_data_in_agriculture_spark.operators.llm import mixture_sample

    docs = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], ["doc_id", "text", "source"]
    )
    out = mixture_sample(docs, {"a": 1.0}, strata_col="source")
    assert [r["doc_id"] for r in out.collect()] == [1]


class TestTemperatureSample:
    def _docs(self, spark):
        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(50)
        ]
        return spark.createDataFrame(rows, ["doc_id", "source"])

    def test_alpha_one_is_identity(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        docs = self._docs(spark)
        assert llm.temperature_sample(docs, alpha=1.0).count() == 450

    def test_alpha_zero_equalizes(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        out = llm.temperature_sample(self._docs(spark), alpha=0.0)
        by = {r["source"]: r["n"] for r in out.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
        # smallest domain binds and is kept whole; big thinned to ~50
        assert by["small"] == 50
        assert 30 <= by["big"] <= 70  # Bernoulli band around 50

    def test_intermediate_alpha_monotone(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        out = llm.temperature_sample(self._docs(spark), alpha=0.5)
        by = {r["source"]: r["n"] for r in out.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert by["small"] == 50
        # sqrt flattening: big/small target ratio = sqrt(400/50) ≈ 2.83
        assert 100 <= by["big"] <= 185  # around 0.354*400 ≈ 141

    def test_bad_alpha_raises(self, spark):
        import pytest as _pytest

        from big_data_in_agriculture_spark.operators import llm

        with _pytest.raises(ValueError):
            llm.temperature_sample(self._docs(spark), alpha=1.5)


class TestWeightedTopkSample:
    def test_exact_k_and_partition_stable(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 9 + 1).cast("double").alias("w"),
        )
        a = llm.weighted_topk_sample(docs, "w", k=40).collect()
        b = llm.weighted_topk_sample(docs.repartition(11), "w", k=40).collect()
        assert len(a) == 40
        assert [(r["doc_id"], r["sample_key"]) for r in a] == [
            (r["doc_id"], r["sample_key"]) for r in b
        ]

    def test_heavier_weights_oversampled(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        # half the docs weight 10, half weight 1 → heavy docs dominate
        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 1000, 10.0).otherwise(1.0).alias("w"),
        )
        out = llm.weighted_topk_sample(docs, "w", k=200).collect()
        heavy = sum(1 for r in out if r["weight"] == 10.0)
        assert heavy > 150  # ≫ the 100 a uniform draw would give

    def test_nonpositive_weights_excluded(self, spark):
        from big_data_in_agriculture_spark.operators import llm

        docs = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0)], ["doc_id", "w"]
        )
        rows = llm.weighted_topk_sample(docs, "w", k=10).collect()
        assert [r["doc_id"] for r in rows] == [1]
