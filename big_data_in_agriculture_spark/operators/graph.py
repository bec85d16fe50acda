"""Distributed graph algorithms over edge-list DataFrames.

PageRank is the canonical "importance over a web-scale link graph"
primitive — at 100 TB the link graph of a crawl corpus is the input to
harvest-rate crawl scheduling and to quality priors for document
filtering (the original use of PageRank in a training-data pipeline:
sample high-rank pages first). The implementation is the standard
synchronous power iteration laid out the Pregel-on-MapReduce way:

- the edge list is materialized ONCE (``localCheckpoint``) — every
  iteration joins against it, and without the checkpoint each round
  would re-run the full upstream edge *generator*;
- one iteration = one equi-join (ranks ⋈ edges on src) + one hash
  aggregate (sum of shares by dst) — a single shuffle keyed on the
  node id, the minimum any message-passing round costs;
- the rank table is one row per node; per-round driver traffic is one
  1-row dangling-mass aggregate (broadcast back via crossJoin), never
  the rank vector itself.

Determinism contract (the two-engine oracle): ranks are LONG integers
in units of 1e-12 of total mass, every per-edge share is an integer
division, and every aggregation is a LONG sum — order-free bit-exact
on both engines, unlike a DOUBLE sum whose value depends on partition
reduce order. Spark's ``div`` and DuckDB's ``//`` agree on all
non-negative operands (truncating vs floor division differ only below
zero, and mass is non-negative throughout).

Semantics (fixed ``iterations``, damping ``d`` = damping_pct/100):

    rank_0(v)    = M div N                    (M = 1e12, uniform)
    share_t(u)   = rank_t(u) div outdeg(u)    (u with out-edges)
    dangling_t   = sum of rank_t(u) over u with NO out-edges
    rank_{t+1}(v)= (100-d)*(M div N) div 100
                   + d*(inflow_t(v) + dangling_t div N) div 100

Dangling mass is redistributed uniformly (the standard stochastic-
matrix completion), so bipartite / DAG-shaped graphs don't leak rank.
Total mass is conserved up to the deterministic div-truncation dust
(< N units per round), which both engines lose identically.

The reference has no graph stage (its 920-LoC scope is CDS NetCDF →
parquet marts → Postgres, flows/ has no joins at all); this module is
part of the LLM-pipeline extension surface, the same tier as the
connected-components clustering in operators/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total mass in rank units — 1e12 gives ~12 significant decimal
#: digits of rank while keeping 100 * rank far inside LONG range.
MASS = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns one row per node: ``(node, rank_e12)`` where ``rank_e12``
    is the LONG rank in units of 1e-12 of total mass (divide by 1e12
    for the conventional probability; the integer is returned so the
    result hashes bit-exactly). Parallel edges should be deduplicated
    by the caller if unwanted — each occurrence carries one share.

    ``iterations`` is fixed (not convergence-tested) so runs are
    bit-replayable; 5–10 rounds rank-order a power-law web graph's head
    correctly (Page et al. 1999 report useful orderings long before
    numeric convergence). ``damping_pct`` is an integer percentage so
    the damping multiply stays in LONG arithmetic.

    Scale shape: iterations × (one join + one aggregate) shuffled on
    the node key; the rank table is node-sized, the join edge-sized.
    The only driver-side values are the node count and the per-round
    1-row dangling aggregate.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_e12", F.lit(0).cast("long"))

    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("od")
    )
    base = MASS // n  # uniform share of total mass, LONG
    teleport = (100 - damping_pct) * base // 100

    # static per-node frame: node, outdeg (0 => dangling). The rank
    # table CARRIES od so no per-round ranks ⋈ deg join is needed —
    # each iteration costs exactly two node-keyed shuffles (the edge
    # join's and the deg ⋈ inflow rebuild's).
    deg = (
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("od", F.lit(0)).alias("od"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.withColumn("rank_e12", F.lit(base).cast("long"))
    for _ in range(iterations):
        # dangling mass: 1-row LONG aggregate, broadcast back below
        dangling = (
            ranks.filter(F.col("od") == 0)
            .agg(F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("_dm"))
        )
        shares = (
            ranks.filter(F.col("od") > 0)
            .select("node", F.expr("rank_e12 div od").alias("share"))
        )
        inflow = (
            e.join(shares, e.src == shares.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            deg.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "od",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inflow, 0)"
                        f" + (_dm div {n}))) div 100"
                    )
                ).cast("long").alias("rank_e12"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank_e12")


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    max_depth: int = 20,
) -> DataFrame:
    """Multi-source BFS: ``(node, level)`` — the minimum hop count
    from any source node, for every node reachable within
    ``max_depth`` hops (sources themselves at level 0).

    Frontier expansion, the other classic message-passing workload
    beside :func:`pagerank`: each round joins the CURRENT FRONTIER
    (not the whole visited set) against the edge list, anti-joins the
    visited table, and stamps survivors with the next level — so a
    round's cost is proportional to the frontier's out-edges, and the
    loop stops as soon as a frontier comes back empty (the driver
    reads only that per-round count). Levels are exact integers; no
    float anywhere, so the DuckDB twin (a depth-bounded recursive CTE
    taking min(level)) replays it without any quantization contract.

    ``max_depth`` bounds the walk: nodes whose true distance exceeds
    it are absent from the result (the SQL twin applies the identical
    bound). Unreachable nodes are likewise absent — left-join the node
    universe downstream if a row per node is needed.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    visited = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
