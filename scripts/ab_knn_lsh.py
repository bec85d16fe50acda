"""One-session interleaved A/B: knn_lsh with vs without vec_is_valid.

Round 6 added the forall() validity filter at every vector operator's
entry and knn_lsh was the one touched-and-regressed bench pair
(+16%/156 ms cross-session). Cross-session bench deltas on this VM
carry ±10-40% noise (SCALE.md), so the only admissible attribution is
an interleaved A/B inside ONE session: alternate filter-on /
filter-off executions of the exact bench query (same noop sink, same
session) and compare medians. A second mode scales the corpus 10× to
check the delta's growth with data size.

Usage: python scripts/ab_knn_lsh.py [sf_dir] [reps] [--x10]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from big_data_in_agriculture_spark.operators import similarity  # noqa: E402
from big_data_in_agriculture_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 10
    x10 = "--x10" in sys.argv

    import __spark_entry__ as entry

    spark = get_spark("ab-knn-lsh", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    if x10:
        emb = entry._t(spark, sf_dir, "embeddings")
        n = emb.count()
        corpus = (
            emb.crossJoin(spark.range(10).select(F.col("id").alias("_rep")))
            .select(
                (F.col("vec_id") + F.col("_rep") * n).alias("vec_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )
        queries = corpus.filter(F.col("vec_id") < 10)

        def build():
            return similarity.knn_lsh(
                corpus, queries, dim=64, k=3, num_tables=4, num_bits=8
            )
    else:
        q = entry.queries()["knn_lsh"]

        def build():
            return q(spark, sf_dir)

    real = similarity.vec_is_valid

    def passthrough(col):  # noqa: ARG001 — signature match
        return F.lit(True)

    def run() -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both variants (JIT, UDF workers) outside timing
    for fn in (real, passthrough, real, passthrough):
        similarity.vec_is_valid = fn
        run()

    on: list[float] = []
    off: list[float] = []
    try:
        for _ in range(reps):
            similarity.vec_is_valid = real
            on.append(run())
            similarity.vec_is_valid = passthrough
            off.append(run())
    finally:
        similarity.vec_is_valid = real

    m_on, m_off = statistics.median(on), statistics.median(off)
    label = "x10" if x10 else sf_dir
    print(f"[{label}] filter-on : {[round(x, 3) for x in on]}  median {m_on:.3f}s")
    print(f"[{label}] filter-off: {[round(x, 3) for x in off]}  median {m_off:.3f}s")
    delta = (m_on - m_off) / m_off * 100 if m_off else float("nan")
    print(f"[{label}] filter cost: {m_on - m_off:+.3f}s ({delta:+.1f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
