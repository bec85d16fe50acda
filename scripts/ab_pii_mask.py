"""Interleaved A/B: mask_pii's checksum folds vs a size()==0 guard.

Round-8 question (VERDICT #5): bench pii_scan doubled when the two
checksum classes landed (real work — two regexp_extract_all candidate
passes + checksum folds + masking folds per row). Does short-circuiting
the masking FOLD when a doc has no card/IBAN candidates buy anything?

Hypothesis going in: no — ``F.aggregate(candidates, t, fold)`` over an
EMPTY candidate list already runs zero fold iterations, so the guarded
form ``when(size(candidates) == 0, t).otherwise(aggregate(...))`` pays
the same extraction scan plus a size() and, on candidate-bearing docs,
a SECOND extraction (HOFs have no CSE). The A/B exists because the
hypothesis is about interpreted-expression overhead, which this repo
measures rather than assumes (see the knn_rp wide-row and domain-cap
salting precedents).

Both variants are checked for byte-identical output before timing.

Usage: python scripts/ab_pii_mask.py [docs] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from big_data_in_agriculture_spark.functions import text as TX
from big_data_in_agriculture_spark.session import get_spark


def corpus(spark, docs: int):
    """Same shape as scale_probe.probe_pii_1m: ~14% contact blocks,
    ~8% card+IBAN docs, the rest clean — 'most real docs carry no
    card/IBAN candidates', which is the regime the guard targets."""
    words = F.transform(
        F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(30)) + 10),
        lambda i: F.concat(
            F.lit("tok"), (F.xxhash64(F.col("id"), i) % 2000).cast("string")
        ),
    )
    base = F.array_join(words, " ")
    with_contact = F.concat(
        base,
        F.lit(" contact user"), F.col("id").cast("string"),
        F.lit("@example.com ip 10.0.0."),
        (F.col("id") % 256).cast("string"),
        F.lit(" tel 555-123-4567 acct 123456789"),
    )
    with_bank = F.concat(
        base,
        F.lit(" card 4111 1111 1111 1111 iban GB82WEST12345698765432 ref 9"),
    )
    return spark.range(docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 0, with_contact)
        .when(F.col("id") % 11 == 0, with_bank)
        .otherwise(base)
        .alias("text"),
    )


def mask_guarded(text) -> F.Column:
    """mask_pii with the size()==0 short-circuit around each checksum
    fold (candidate-free docs return the let-bound text directly)."""
    c = F.col(text) if isinstance(text, str) else text
    chain = list(TX.PII_PATTERNS)
    regex_head, regex_tail = chain[:2], chain[2:]
    for _, pat, rep in regex_head:
        c = F.regexp_replace(c, pat, rep)
    c = TX._let_array(
        c,
        lambda t: F.when(
            F.size(TX._iban_candidates(t)) == 0, t
        ).otherwise(
            F.aggregate(
                TX._iban_candidates(t), t,
                lambda acc, x: F.replace(acc, x, F.lit("<IBAN>")),
            )
        ),
    )
    c = TX._let_array(
        c,
        lambda t: F.when(
            F.size(TX._card_candidates(t)) == 0, t
        ).otherwise(
            F.aggregate(
                TX._card_candidates(t), t,
                lambda acc, x: F.replace(acc, x, F.lit("<CARD>")),
            )
        ),
    )
    for _, pat, rep in regex_tail:
        c = F.regexp_replace(c, pat, rep)
    return c


def main() -> int:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("ab-pii", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark, docs)

    variants = {
        "current": lambda d: d.select(TX.mask_pii("text").alias("m")),
        "guarded": lambda d: d.select(mask_guarded("text").alias("m")),
    }

    # identity check first (both masks must produce identical bytes)
    sums = {}
    for name, fn in variants.items():
        sums[name] = tuple(
            fn(df.limit(50_000)).agg(
                F.sum(F.length("m")), F.sum(F.crc32("m"))
            ).first()
        )
    assert sums["current"] == sums["guarded"], sums
    print(f"identity check OK on 50k docs: {sums['current']}")

    # warmup each variant once, then interleave reps
    for fn in variants.values():
        fn(df).agg(F.sum(F.length("m"))).collect()
    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(df).agg(F.sum(F.length("m"))).collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s "
            f"runs {[round(t, 3) for t in ts]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
