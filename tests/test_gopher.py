"""Gopher rule-gate: each published rule fires on a planted violator,
clean prose passes, and rule priority is deterministic."""

from __future__ import annotations

import pytest

from big_data_in_agriculture_spark.operators import llm

CLEAN = (
    "the quick brown fox jumps over the lazy dog and runs on through "
    "the quiet field while a second fox follows close behind it"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = llm.gopher_filter(df, min_words=10, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_each_rule_fires(spark):
    got = _run(
        spark,
        [
            ("clean", CLEAN),
            ("short", "only four words here"),
            ("symbols", "#### " * 6 + CLEAN),
            ("bullets", "\n".join(f"- the bullet item number {i} appears" for i in range(8))),
            (
                "ellipsis",
                "\n".join(
                    f"the line number {i} goes on and on before it simply trails away..."
                    for i in range(5)
                ),
            ),
            ("numeric", " ".join(str(1000 + i) for i in range(30)) + " the and"),
            ("nostops", " ".join(f"w{i}rd" for i in range(30))),
        ],
    )
    assert got["clean"]["reason"] == "ok" and got["clean"]["keep"] == 1
    assert got["short"]["reason"] == "too_few_words"
    assert got["symbols"]["reason"] == "symbol_spam"
    assert got["bullets"]["reason"] == "bullet_heavy"
    assert got["ellipsis"]["reason"] == "ellipsis_heavy"
    assert got["numeric"]["reason"] == "non_alpha"
    assert got["nostops"]["reason"] == "no_stopwords"
    assert all(got[k]["keep"] == 0 for k in got if k != "clean")


def test_word_length_windows(spark):
    got = _run(
        spark,
        [
            ("terse", " ".join(["an", "it", "to", "we", "of"] * 4)),
            ("sesqui", " ".join(["incomprehensibilities"] * 12) + " the of"),
        ],
    )
    assert got["terse"]["reason"] == "short_words"
    assert got["sesqui"]["reason"] == "long_words"


def test_rule_priority_first_failure_wins(spark):
    # violates BOTH word-count and alpha rules: word count is first
    got = _run(spark, [("both", "1 2 3")])
    assert got["both"]["reason"] == "too_few_words"


def test_signal_values_exact(spark):
    got = _run(spark, [("clean", CLEAN)])
    r = got["clean"]
    n_nonspace = len(CLEAN.replace(" ", ""))
    nt = len(CLEAN.split(" "))
    assert r["n_words"] == nt
    assert r["mean_word_len"] == pytest.approx(n_nonspace / nt, rel=1e-6)
    assert r["alpha_ratio"] == 1.0 and r["symbol_ratio"] == 0.0
