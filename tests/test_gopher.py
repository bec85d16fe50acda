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


# --- repetition rules ------------------------------------------------------

def _rep(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in llm.repetition_filter(df, **kw).collect()}


def test_repetition_rules_fire(spark):
    got = _rep(
        spark,
        [
            ("clean", CLEAN),
            ("duplines", "unique opening line\n" + "the same exact line\n" * 4 + "a closing line"),
            ("loop2", "buy now " * 20 + "the quick brown fox runs far"),
        ],
    )
    assert got["clean"]["reason"] == "ok"
    assert got["duplines"]["reason"] == "dup_lines"
    assert got["duplines"]["dup_line_frac"] > 0.3
    assert got["loop2"]["reason"] == "top_2gram"


def test_repetition_fraction_values_exact(spark):
    # 3 lines, "dup\n" twice: dup chars = 2*3=6 of len(text)
    text = "dup\nsolo line\ndup"
    got = _rep(spark, [("d", text)])
    assert got["d"]["dup_line_frac"] == pytest.approx(6 / len(text), rel=1e-6)
    # top 2-gram of "a b a b a" -> "a b" occurs 2x (coverage 6 chars)
    t2 = "a b a b a"
    got2 = _rep(spark, [("e", t2)])
    assert got2["e"]["top_2gram_frac"] == pytest.approx(6 / len(t2), rel=1e-6)


def test_single_line_no_dup(spark):
    got = _rep(spark, [("s", CLEAN)])
    assert got["s"]["dup_line_frac"] == 0.0
