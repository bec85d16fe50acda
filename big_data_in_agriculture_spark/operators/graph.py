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

import os
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import pin_iter


def _trace(op: str, rnd: int, changed: int, t0: float) -> None:
    """Per-round observability for the iterative operators, gated on
    SPARK_GRAFT_GRAPH_TRACE=1 (off by default — zero cost in
    production). Prints round index, churn count and wall seconds so
    a slow convergence tail is diagnosable without a UI."""
    if os.environ.get("SPARK_GRAFT_GRAPH_TRACE") == "1":
        print(
            f"[graph-trace] {op} round={rnd} changed={changed} "
            f"{time.perf_counter() - t0:.2f}s",
            file=sys.stderr,
            flush=True,
        )

#: total mass in rank units — 1e12 gives ~12 significant decimal
#: digits of rank while keeping 100 * rank far inside LONG range.
MASS = 1_000_000_000_000


#: Node-count floor for the narrow (frontier-restricted) round shape in
#: core_numbers / label_propagation. A narrow round's cost is dominated
#: by FIXED plumbing — ~6 broadcast-hash joins + 3 delta-sized pins per
#: round — independent of how little work it saves; a full-recompute
#: round on a small graph is one cheap node-keyed shuffle. Measured on
#: the sf0.1 gate graph (1880 nodes): narrow tail rounds 1.6-3.1 s vs
#: wide rounds 1.0-1.3 s — the restriction was a net LOSS below ~1e5
#: nodes. At the 5M-edge SCALE.md geometry (1M nodes) the narrow tail
#: is what beats the 141 s full form, so the floor changes nothing
#: there. Pure cost-model refinement: wide and narrow rounds compute
#: bit-identical states (documented invariant), so the switch never
#: affects results at any size.
_NARROW_MIN_NODES = 100_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    residual_out: list | None = None,
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

    ``residual_out``: pass a list to receive one LONG per round —
    ``sum(abs(rank_t − rank_{t−1}))`` in 1e-12 mass units — the
    evidence a 100 TB user reads to pick ``iterations`` (stop when the
    residual falls below the rank granularity they care about).
    Diagnostic ONLY: it adds a node-keyed join + 1-row aggregate per
    round against tables the iteration already materialized, never
    changes the ranks, and stays OFF (None) in the oracle path so
    registered hashes are untouched.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
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
        .localCheckpoint(eager=False)
    )
    ranks = deg.withColumn("rank_e12", F.lit(base).cast("long"))
    for _rnd in range(iterations):
        prev = ranks
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
        )
        # per-round pin with periodic stats reset: localCheckpoint
        # PRESERVES plan statistics, which SQUARE per round and cross
        # BigInteger's bit ceiling near iteration ~40 (_util.py note)
        ranks = pin_iter(ranks, _rnd, eager=False)
        if residual_out is not None:
            residual_out.append(
                ranks.join(
                    prev.select(
                        "node", F.col("rank_e12").alias("_prev")
                    ),
                    "node",
                )
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("rank_e12") - F.col("_prev"))),
                        F.lit(0),
                    ).alias("_res")
                )
                .first()[0]
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
        .localCheckpoint(eager=False)
    )
    visited = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        # per-round pins with periodic stats reset: visited joins
        # frames derived from its own previous checkpoint every round
        # (_util.pin_iter note)
        nxt = pin_iter(
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(depth).cast("long")),
            depth,
            eager=False,
        )
        if nxt.isEmpty():
            break
        visited = pin_iter(visited.unionByName(nxt), depth, eager=False)
        frontier = nxt
    return visited


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank: importance RELATIVE to a source set.

    The crawl-scheduling / data-curation variant of :func:`pagerank`
    (Page et al. 1999 §6; the "random surfer teleports home"): all
    teleport mass and all dangling mass return to the SOURCE nodes
    instead of spreading uniformly, so ranks measure proximity to the
    sources — the primitive behind seed-expanded corpus selection
    ("find pages like these") and trust propagation.

    Same determinism contract as :func:`pagerank` — LONG 1e-12 mass
    units, integer division everywhere, order-free LONG sums, fixed
    iterations — so the DuckDB twin replays it bit-exactly:

        S        = source set, S_n = |S|
        rank_0(v)= M div S_n  if v ∈ S else 0
        rank_t+1 = [(100-d)·(M div S_n) div 100  if v ∈ S else 0]
                 + d·(inflow_t(v) + [dangling_t div S_n if v ∈ S]) div 100

    Scale shape identical to pagerank: per round one edge equi-join +
    one node-keyed sum + a 1-row dangling broadcast; rank rows carry
    (od, is_src) so no per-round membership join; stats-free pins keep
    the iteration safe at any round count.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=False)
    )
    s = sources.select(F.col(source_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(s)
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("od")
    )
    deg = (
        nodes.join(outdeg, "node", "left")
        .join(s.withColumn("_is_src", F.lit(1)), "node", "left")
        .select(
            "node",
            F.coalesce("od", F.lit(0)).alias("od"),
            F.coalesce("_is_src", F.lit(0)).alias("is_src"),
        )
        .localCheckpoint(eager=False)
    )
    s_n = deg.filter(F.col("is_src") == 1).count()
    if s_n == 0:
        return deg.select("node").limit(0).withColumn(
            "rank_e12", F.lit(0).cast("long")
        )
    base_s = MASS // s_n
    teleport = (100 - damping_pct) * base_s // 100

    ranks = deg.withColumn(
        "rank_e12",
        F.when(F.col("is_src") == 1, F.lit(base_s))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    for _rnd in range(iterations):
        dangling = ranks.filter(F.col("od") == 0).agg(
            F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("_dm")
        )
        shares = ranks.filter(F.col("od") > 0).select(
            "node", F.expr("rank_e12 div od").alias("share")
        )
        inflow = (
            e.join(shares, e.src == shares.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = pin_iter(
            deg.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "od",
                "is_src",
                (
                    F.when(F.col("is_src") == 1, F.lit(teleport))
                    .otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_pct} * (coalesce(inflow, 0)"
                        f" + (case when is_src = 1 then _dm div {s_n}"
                        " else 0 end))) div 100"
                    )
                ).cast("long").alias("rank_e12"),
            ),
            _rnd,
            eager=False,
        )
    return ranks.select("node", "rank_e12")


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """k-core of an undirected graph: ``(node, core_degree)`` for the
    maximal subgraph where every node keeps degree ≥ k.

    The classic graph-density filter (Seidman 1983) — in a curation
    pipeline it prunes link-farm fringes and isolates the densely
    cross-linked cores a crawl scheduler prioritizes. Iterative
    peeling: drop nodes with current degree < k, recompute degrees on
    the survivors, repeat to fixpoint. Each round is one degree
    aggregate + one semi-join of the edge list against the surviving
    node set — edge-keyed shuffles, node-sized state, stats-free pins.

    Two modes, one code path:

    - ``rounds=None`` (default): peel to the true fixpoint, verified
      (raises after ``max_iter`` non-converged rounds).
    - ``rounds=R``: exactly R peels — partial (still deterministic)
      if R is too small. This is the SQL-replayable form: the oracle
      unrolls R chained CTEs, and the registered query pins an R the
      tests prove sufficient for the testdata graph, with the
      fixpoint mode asserted equal in pytest.

    Edges are symmetrized and self-loops dropped, so ``degree`` means
    distinct-neighbor count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    alive_edges = und
    n_iter = max_iter if rounds is None else rounds
    converged = rounds is not None
    # |alive_edges| after the previous round. Fixpoint mode seeds it
    # with |und| (materializing the pin round 1 reads anyway) so an
    # already-stable graph still converges inside round 1; fixed-rounds
    # mode skips the seed — its worst case is one non-skipped round.
    prev_n = und.count() if rounds is None else None
    for _rnd in range(n_iter):
        degs = alive_edges.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = degs.filter(F.col("_d") >= k).select("u")
        nxt = pin_iter(
            alive_edges.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v"),
            _rnd,
            eager=False,
        )
        # one count per round in BOTH modes (r12): it materializes the
        # lazy pin the next round needs anyway, and peeling only ever
        # REMOVES edges (nxt ⊆ alive), so an unchanged count means an
        # unchanged edge SET — a fixpoint. In fixed-rounds mode every
        # remaining round then recomputes the identity, so stopping is
        # bit-identical (the core_numbers r11 argument; the oracle's
        # extra unrolled CTEs are identities for the same reason). The
        # sf0.1 gate graph peels its empty 3-core in 2 rounds and was
        # paying 10 no-op rounds of pure job overhead.
        n = nxt.count()
        alive_edges = nxt
        if n == prev_n or n == 0:
            converged = True
            break
        prev_n = n
    if not converged:
        raise RuntimeError(
            f"kcore did not converge in {max_iter} peeling rounds; raise "
            "max_iter (each round removes at least one node, so this "
            "means a pathologically deep peel order)"
        )
    return (
        alive_edges.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Full core decomposition of an undirected graph: ``(node, core)``
    where ``core`` is the largest k such that the node is in the
    k-core — :func:`kcore` answers ONE k, this answers all of them in
    one pass, the standard graph-density feature for corpus curation
    (rank crawl nodes by coreness, drop the 1-core fringe, keep the
    densely linked backbone).

    Algorithm: the h-index fixpoint (Lü, Zhou, Zhang & Stanley, "The
    H-index of a node and its application", Nat. Commun. 7:10168,
    2016): start every node at its degree, then repeatedly replace
    each node's value with the H-INDEX of its neighbors' values (the
    largest h such that ≥ h neighbors hold value ≥ h). The sequence is
    monotone non-increasing and converges exactly to coreness. Unlike
    peeling (whose round count is the peel depth PER k, nested over
    all k), every node updates every round, and convergence on real
    graphs takes a handful of rounds.

    One round = one edge equi-join (neighbor values) + one node-keyed
    window sort + one aggregate — all shuffles on the node key, state
    is one LONG per node, hubs cost their degree linearly (a window
    partition, never a candidate-pair join). All-integer arithmetic:
    the per-node H-index is ``max(least(row_number DESC-by-value,
    value))``, invariant to tie order among equal neighbor values, so
    both engines replay it bit-exactly with no quantization contract.

    At 100 TB: a node's value can move only if a neighbor's value
    CHANGED last round (the update is a pure function of neighbor
    values — a node with no changed neighbor recomputes to its current
    value, so skipping it leaves every per-round state bit-identical
    to the full-recompute form; the fixed-rounds/SQL-unroll contract
    is unchanged). The restriction is applied ADAPTIVELY: while the
    churn frontier is wide (> ~5% of nodes) a round does the plain
    full recompute — the delta plumbing (edges-out-of-changed join +
    distinct) costs MORE than it saves when nearly every neighborhood
    is touched anyway (measured on a 5M-edge Poisson graph: pure
    delta 226 s vs 141 s full, because Poisson frontiers at 5% of
    nodes still reach ~40% of neighborhoods) — and switches to
    frontier-restricted recompute once the frontier is narrow, which
    is where the ~20-round h-index tail lives (rounds ×
    |changed-neighborhood| instead of rounds × |E|). The switch reads
    one count on the already-pinned delta per round.

    Two modes, the :func:`kcore` contract:

    - ``rounds=None``: iterate to the verified fixpoint (raises after
      ``max_iter`` non-converged rounds; the per-round cost of the
      check is one node-keyed join + isEmpty).
    - ``rounds=R``: at most R updates — the SQL-replayable form (the
      oracle unrolls R window-CTEs; tests pin an R proven to reach the
      true fixpoint on every shipped graph). The loop stops EARLY the
      first round whose delta is empty: the update is a pure
      synchronous function of the value table, so an empty delta is a
      fixpoint and every remaining round recomputes the identity —
      skipping them is bit-identical (r11 measurement at the sf0.1
      gate: settle at round 4 of 24, so 20 no-op rounds of pure job
      overhead dropped). No extra action: the churn count the
      adaptive switch already reads detects the fixpoint for free.
    """
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    c = (
        und.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    n_iter = max_iter if rounds is None else rounds
    converged = rounds is not None
    w = Window.partitionBy("u").orderBy(F.col("cv").desc())
    # churn frontier: nodes whose value changed last round. Round 1 is
    # always full (initialization counts as a change). A delta round
    # pays off only once the frontier's NEIGHBORHOOD is a small slice
    # of the graph; on Poisson-ish degree d a frontier of fraction f
    # touches ~1-(1-f)^d of neighborhoods, so the cutover is
    # deliberately low: frontier < 5% of nodes.
    n_nodes = c.count()
    # Value state is BASE + OVERLAY: ``base`` is the full pinned
    # (node, c) table as of the last wide round; ``overlay`` holds
    # only the values that changed since (None = empty). current(n) =
    # coalesce(overlay, base). Wide rounds fold the overlay into base
    # and pin the full recompute (one node-sized pin, the r10 cost);
    # NARROW rounds never materialize a node-sized frame at all —
    # their pins are delta-sized, which is what makes a 30-round
    # sub-1% churn tail cost ~|changed-neighborhood| per round
    # instead of |V| (measured: the eager full-table pin alone was
    # ~2 s/round at 1M nodes — more than the tail's actual compute).
    base = c
    overlay = None
    changed = c.select("node")
    changed_cnt = n_nodes
    for _rnd in range(n_iter):
        _t0 = time.perf_counter()
        if changed_cnt * 20 > n_nodes or n_nodes < _NARROW_MIN_NODES:
            # wide frontier — or a graph small enough that a full
            # round is cheaper than the narrow path's fixed plumbing
            # (_NARROW_MIN_NODES): plain full recompute (one edge
            # join, one window pass). Fold any overlay in first so
            # the join sees current values.
            if overlay is not None:
                base = pin_iter(
                    base.join(
                        overlay.select("node", F.col("c").alias("_ov")),
                        "node",
                        "left",
                    ).select("node", F.coalesce("_ov", "c").alias("c")),
                    _rnd,
                    eager=False,
                )
                overlay = None
            nbr = und.join(base, und.v == base.node).select(
                und.u.alias("u"), F.col("c").alias("cv")
            )
            # full recompute covers every node (the node set IS
            # derived from und), so it becomes the new base directly
            new_base = pin_iter(
                nbr.withColumn("rn", F.row_number().over(w).cast("long"))
                .groupBy(F.col("u").alias("node"))
                .agg(F.max(F.least("rn", "cv")).alias("c")),
                _rnd,
                eager=False,
            )
            # delta = nodes whose value moved (monotone non-increasing,
            # so != means strictly decreased); both sides pinned
            delta = pin_iter(
                new_base.join(
                    base.select("node", F.col("c").alias("_old")), "node"
                )
                .filter(F.col("c") != F.col("_old"))
                .select("node", "c"),
                _rnd,
                eager=False,
            )
            base = new_base
        else:
            # narrow frontier: recompute only nodes with >= 1 changed
            # neighbor. Every frontier-derived frame is EXPLICITLY
            # broadcast (guarded by an absolute cap — at billion-node
            # scale a 5% frontier is not driver-collectable, and there
            # the planner's own sort-merge choice is correct anyway):
            # derived distinct/join outputs have no usable size stats,
            # and without the hint Catalyst sort-merges und⋈affected
            # and SHUFFLES the node-sized base every round (measured:
            # the tail rounds cost nearly as much as full rounds).
            # With the hints, und and base are only ever SCANNED
            # map-side behind broadcast-hash joins — no round touches
            # a shuffle bigger than the frontier's neighborhood.
            bc = (
                F.broadcast
                if changed_cnt <= 2_000_000
                else (lambda df: df)
            )
            affected = (
                und.join(
                    bc(changed.select(F.col("node").alias("_chg"))),
                    und.v == F.col("_chg"),
                )
                .select("u")
                .distinct()
            )
            und_aff = und.join(bc(affected), "u")
            # restrict base to the needed neighbor values via a
            # broadcast semi-join BEFORE the value join, so base is
            # map-scanned, never shuffled
            vset = und_aff.select("v").distinct()
            base_vals = base.join(
                bc(vset), base.node == F.col("v")
            ).select(F.col("node").alias("_vn"), F.col("c").alias("_cv0"))
            nbr0 = und_aff.join(
                bc(base_vals), und_aff.v == F.col("_vn")
            ).select(F.col("u"), F.col("v"), F.col("_cv0"))
            if overlay is not None:
                nbr = nbr0.join(
                    bc(
                        overlay.select(
                            F.col("node").alias("_on"),
                            F.col("c").alias("_ovv"),
                        )
                    ),
                    nbr0.v == F.col("_on"),
                    "left",
                ).select("u", F.coalesce("_ovv", "_cv0").alias("cv"))
            else:
                nbr = nbr0.select("u", F.col("_cv0").alias("cv"))
            # pin the (frontier-sized) recompute ONCE: it feeds both
            # the delta filter and the overlay merge, and an unpinned
            # broadcast would re-execute the whole restricted pipeline
            # per consumer
            # coalesce(8): frontier-sized frames pinned at the parent
            # partition count spawn ~shuffle_partitions near-empty
            # tasks in EVERY downstream job — at a sub-1% frontier the
            # task-launch overhead dominated the actual work (traced)
            recomputed = pin_iter(
                nbr.withColumn("rn", F.row_number().over(w).cast("long"))
                .groupBy(F.col("u").alias("node"))
                .agg(F.max(F.least("rn", "cv")).alias("c"))
                .coalesce(8),
                _rnd,
                eager=False,
            )
            # stream base, broadcast the (small) recomputed values
            cur = base.join(
                bc(recomputed.select("node", F.col("c").alias("_new"))),
                "node",
            )
            if overlay is not None:
                cur = cur.join(
                    bc(overlay.select("node", F.col("c").alias("_o2"))),
                    "node",
                    "left",
                )
                old = F.coalesce("_o2", "c")
            else:
                old = F.col("c")
            delta = pin_iter(
                cur.filter(F.col("_new") != old)
                .select("node", F.col("_new").alias("c"))
                .coalesce(8),
                _rnd,
                eager=False,
            )
            overlay = pin_iter(
                (
                    delta
                    if overlay is None
                    else delta.unionByName(
                        overlay.join(
                            delta.select("node"), "node", "left_anti"
                        )
                    )
                ).coalesce(8),
                _rnd,
                eager=False,
            )
        changed = delta.select("node")
        changed_cnt = delta.count()
        _trace("core_numbers", _rnd, changed_cnt, _t0)
        if changed_cnt == 0:
            # fixpoint — in BOTH modes. The update is a pure
            # synchronous function of the value table, so an empty
            # delta means state_{t+1} == state_t and every remaining
            # fixed round recomputes the identity; skipping them is
            # bit-identical to running them (the oracle's extra
            # unrolled CTEs are identities for the same reason).
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"core_numbers did not converge in {max_iter} h-index "
            "rounds; raise max_iter (convergence is guaranteed — the "
            "sequence is monotone non-increasing over LONG values)"
        )
    if overlay is not None:
        base = base.join(
            overlay.select("node", F.col("c").alias("_ov")), "node", "left"
        ).select("node", F.coalesce("_ov", "c").alias("c"))
    return base.select("node", F.col("c").alias("core"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Community detection by label propagation: ``(node, community)``.

    The near-linear community baseline (Raghavan, Albert & Kumara,
    Phys. Rev. E 76:036106, 2007): every node starts in its own
    community (label = its own id) and each round adopts the label
    held by the MOST voters in its closed neighborhood. Two
    determinism deviations from the classic randomized form:

    - ties — both the random tie-break and the asynchronous update
      order — are replaced by "smallest label wins";
    - the node's OWN current label joins the vote (the self-inclusion
      variant): pure synchronous LPA is known to oscillate (Raghavan
      §IV discuss bipartite flip-flop — Spark GraphX's own
      LabelPropagation documents the same caveat), and label inertia
      damps it. Measured on the co-purchase gate graphs: the pure form
      was still churning 1677/1880 labels per round at round 12, the
      self-vote form reaches a true fixpoint in 4-6 rounds.

    Because the update is a deterministic pure function of the label
    table, two equal consecutive rounds ARE a fixpoint. Two modes,
    the :func:`kcore` contract: ``rounds=None`` iterates to that
    verified fixpoint (raises after ``max_iter``, since self-inclusion
    damps but does not PROVE termination); ``rounds=R`` runs at most R
    updates — deterministic at any R, the SQL-replayable form the
    registered oracle unrolls, with tests pinning an R proven settled
    on every shipped graph. Both modes stop EARLY the first round
    whose delta is empty: an empty delta under this pure synchronous
    update is a fixpoint, so the skipped rounds are identities and
    the result is bit-identical (r11: the sf0.1 gate settles at round
    4 of 8 — the free churn count turns the dead tail into zero jobs).

    One round = one edge equi-join (fetch neighbor labels) + one
    (node, label) count aggregate + one per-node argmax (row_number
    over count DESC, label ASC) — node-keyed shuffles, one LONG of
    state per node, hubs cost their degree linearly.

    At 100 TB: a node's vote can move only if its CLOSED neighborhood
    changed — a neighbor's label last round, or its own (the
    self-vote makes own-label part of the electorate) — and skipping
    unaffected nodes leaves every per-round state bit-identical to
    the full form (fixed-rounds/SQL-unroll contract unchanged). Like
    :func:`core_numbers`, the restriction is ADAPTIVE: wide churn
    frontier (> ~5% of nodes) → plain full re-vote (the delta
    plumbing costs more than it saves when most neighborhoods are
    touched); narrow frontier → re-vote only affected nodes, so the
    settle tail costs the churn frontier's edges, not |E|. The switch
    reads one count on the already-pinned delta per round. All counts
    and labels are integers: no quantization contract.

    In a curation pipeline LPA is the cheap community pass that
    groups a crawl graph into topical clusters for mixture balancing
    — where connected components over-merge (one stray link joins
    two topics), LPA's majority rule keeps dense regions separate.
    """
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    lab = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("community", F.col("node"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("node").orderBy(
        F.col("_cnt").desc(), F.col("community").asc()
    )
    n_iter = max_iter if rounds is None else rounds
    converged = rounds is not None
    # Label state is BASE + OVERLAY, the core_numbers discipline:
    # ``base`` is the full pinned (node, community) table as of the
    # last wide round, ``overlay`` only the labels changed since
    # (None = empty); current(n) = coalesce(overlay, base). Narrow
    # rounds (churn < 5% of nodes) never materialize a node-sized
    # frame — their pins are delta-sized.
    n_nodes = lab.count()
    base = lab
    overlay = None
    changed = lab.select("node")
    changed_cnt = n_nodes
    for _rnd in range(n_iter):
        _t0 = time.perf_counter()
        if changed_cnt * 20 > n_nodes or n_nodes < _NARROW_MIN_NODES:
            # wide frontier — or a graph below the narrow path's
            # fixed-cost floor (_NARROW_MIN_NODES): plain full re-vote
            # (fold the overlay in first so the vote join sees
            # current labels)
            if overlay is not None:
                base = pin_iter(
                    base.join(
                        overlay.select(
                            "node", F.col("community").alias("_ov")
                        ),
                        "node",
                        "left",
                    ).select(
                        "node",
                        F.coalesce("_ov", "community").alias("community"),
                    ),
                    _rnd,
                    eager=False,
                )
                overlay = None
            votes = (
                und.join(base, und.v == base.node)
                .select(und.u.alias("node"), "community")
                .unionByName(base.select("node", "community"))
            )
            # the full re-vote covers every node (each casts its own
            # self-vote), so it becomes the new base directly
            new_base = pin_iter(
                votes.groupBy("node", "community")
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("node", "community"),
                _rnd,
                eager=False,
            )
            delta = pin_iter(
                new_base.join(
                    base.select("node", F.col("community").alias("_old")),
                    "node",
                )
                .filter(F.col("community") != F.col("_old"))
                .select("node", "community"),
                _rnd,
                eager=False,
            )
            base = new_base
        else:
            # narrow frontier: re-vote only nodes whose closed
            # neighborhood changed (a neighbor's label, or their own
            # — the self-vote). Frontier frames are explicitly
            # broadcast (size-capped), the core_numbers discipline:
            # und and base are only map-scanned behind broadcast-hash
            # joins, never shuffled in a tail round.
            bc = (
                F.broadcast
                if changed_cnt <= 2_000_000
                else (lambda df: df)
            )
            affected = (
                und.join(
                    bc(changed.select(F.col("node").alias("_chg"))),
                    und.v == F.col("_chg"),
                )
                .select("u")
                .unionByName(changed.select(F.col("node").alias("u")))
                .distinct()
            )
            und_aff = und.join(bc(affected), "u")
            # closed neighborhood as (u, v) pairs: edges + the self
            # loop, so ONE label lookup serves both vote sources
            closed = und_aff.unionByName(
                affected.select("u", F.col("u").alias("v"))
            )
            vset = closed.select("v").distinct()
            base_vals = base.join(
                bc(vset), base.node == F.col("v")
            ).select(
                F.col("node").alias("_vn"),
                F.col("community").alias("_lb0"),
            )
            both = closed.join(
                bc(base_vals), closed.v == F.col("_vn")
            ).select(F.col("u"), F.col("v"), F.col("_lb0"))
            if overlay is not None:
                votes = both.join(
                    bc(
                        overlay.select(
                            F.col("node").alias("_on"),
                            F.col("community").alias("_ovv"),
                        )
                    ),
                    both.v == F.col("_on"),
                    "left",
                ).select(
                    F.col("u").alias("node"),
                    F.coalesce("_ovv", "_lb0").alias("community"),
                )
            else:
                votes = both.select(
                    F.col("u").alias("node"),
                    F.col("_lb0").alias("community"),
                )
            # pinned once, the core_numbers rationale: an unpinned
            # broadcast re-executes the restricted pipeline per use
            revoted = pin_iter(
                votes.groupBy("node", "community")
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("node", "community")
                .coalesce(8),
                _rnd,
                eager=False,
            )
            # stream base, broadcast the (small) re-voted labels
            cur = base.join(
                bc(
                    revoted.select(
                        "node", F.col("community").alias("_new")
                    )
                ),
                "node",
            )
            if overlay is not None:
                cur = cur.join(
                    bc(
                        overlay.select(
                            "node", F.col("community").alias("_o2")
                        )
                    ),
                    "node",
                    "left",
                )
                old = F.coalesce("_o2", "community")
            else:
                old = F.col("community")
            delta = pin_iter(
                cur.filter(F.col("_new") != old)
                .select("node", F.col("_new").alias("community"))
                .coalesce(8),
                _rnd,
                eager=False,
            )
            overlay = pin_iter(
                (
                    delta
                    if overlay is None
                    else delta.unionByName(
                        overlay.join(
                            delta.select("node"), "node", "left_anti"
                        )
                    )
                ).coalesce(8),
                _rnd,
                eager=False,
            )
        changed = delta.select("node")
        changed_cnt = delta.count()
        _trace("label_propagation", _rnd, changed_cnt, _t0)
        if changed_cnt == 0:
            # fixpoint — in BOTH modes (see core_numbers: an empty
            # delta under a pure synchronous update makes every
            # remaining fixed round an identity, so skipping them is
            # bit-identical).
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"label_propagation did not reach a fixpoint in {max_iter} "
            "rounds; the graph may sustain a synchronous oscillation — "
            "use fixed `rounds` (deterministic at any value) or raise "
            "max_iter"
        )
    if overlay is not None:
        base = base.join(
            overlay.select("node", F.col("community").alias("_ov")),
            "node",
            "left",
        ).select(
            "node", F.coalesce("_ov", "community").alias("community")
        )
    return base


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    source_col: str = "node",
    max_hops: int = 10,
) -> DataFrame:
    """Single/multi-source shortest paths with non-negative LONG
    weights, bounded at ``max_hops`` edges: ``(node, dist)``.

    Distributed Bellman-Ford: each round relaxes every edge out of the
    current distance table — one edge equi-join + one node-keyed min —
    and stops early when a round improves nothing. ``max_hops`` bounds
    the walk EXACTLY like bfs_levels' depth bound (the SQL twin
    enumerates paths of ≤ max_hops edges and takes the min, which
    after ≤ max_hops relaxation rounds is the identical function);
    unreached nodes are absent. Weights are LONG (caller casts), sums
    are LONG — no float anywhere, so no quantization contract.

    At 100 TB: each round relaxes ONLY edges out of nodes whose
    distance improved last round (the ``bfs_levels`` frontier
    discipline) — identical results to full relaxation, because a
    non-improved node's best label was already propagated the round it
    last improved, so re-relaxing its edges re-derives candidates the
    min already absorbed. Per-round cost therefore tracks the
    improved-frontier's out-edges, not graph size: on a bounded walk
    total work is ~|E| once the wave passes, vs hops × |E| for the
    naive form. The early exit (empty frontier) keeps round count at
    the true shortest-path hop diameter ≤ max_hops. Stats-free pins
    (_util.py) keep long walks safe.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        ).filter(F.col("w") >= 0)
        .localCheckpoint(eager=False)
    )
    dist = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = dist  # round 0: every source just "improved" to 0
    for _rnd in range(max_hops):
        relaxed = (
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("_cand"))
            .groupBy("node")
            .agg(F.min("_cand").alias("_cand"))
        )
        # least() skips NULLs (full join: either side may be absent).
        # r12: the improved flag is computed IN the relaxation join —
        # the old form re-joined nxt against dist just to recover the
        # old distance this join already had on its left side, costing
        # a second node-keyed join + a second pin every round. Same
        # flag by definition: least(d, c) < d ⟺ c < d, and a node
        # absent from dist (NULL d) is improved iff relaxed reached it.
        step = pin_iter(
            dist.join(relaxed, "node", "full")
            .select(
                "node",
                F.least("dist", "_cand").alias("_nd"),
                (
                    F.col("dist").isNull()
                    | (F.col("_cand") < F.col("dist"))
                ).alias("_imp"),
            )
            .select("node", F.col("_nd").alias("dist"), "_imp"),
            _rnd,
        )
        # frontier and the new dist are plan branches over the SAME
        # pinned frame — cheap scans, no recompute
        frontier = step.filter(F.col("_imp")).select("node", "dist")
        done = frontier.isEmpty()
        dist = step.select("node", "dist")
        if done:
            break
    return dist


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_wedges: int | None = 1_000_000_000,
) -> DataFrame:
    """Per-node local clustering coefficient on an undirected graph:
    ``(node, degree, n_triangles, coeff)`` with coeff = 2T/(d(d−1)).

    The community-density companion to ``triangle_participation``
    (Watts & Strogatz 1998): how close each node's neighborhood is to
    a clique — on a co-purchase graph, high-coefficient nodes sit in
    tightly bundled product families, low-coefficient high-degree
    nodes are hubs. Exact counts; the only float op is the final
    division, identical one-rounding IEEE on both engines (6 dp).

    Triangle enumeration is DEGREE-ORDERED compact-forward (Latapy
    2008): every edge is oriented from its lower-(degree, id) endpoint
    to the higher, wedges pair the out-neighbors of each node, and a
    semi-join against the oriented edges closes them. Ordering by id
    alone leaves Σ deg(u)² wedges — a single 10⁶-degree hub is 10¹²
    candidates; ordering by degree first bounds each node's OUT-degree
    by O(√m) (arboricity), so the hub's edges all point INTO it and it
    generates zero wedges. Each triangle is still produced exactly
    once (by its smallest corner in the total order), so counts — and
    the registered oracle hash — are unchanged.

    ``max_wedges`` is the degenerate-geometry circuit breaker (the
    DBSCAN ``max_cell_pts`` pattern): one 1-row aggregate computes the
    exact post-orientation wedge count Σ C(outdeg, 2) and raises with
    a cost model instead of launching an unpayable join. ``None``
    disables the check.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    # orient each edge low-(degree, id) endpoint -> high; carry the
    # out-neighbor's degree so wedge pairs can be ordered by the same
    # total order without another join
    ed = e.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("_da")),
        "a",
    ).join(
        deg.select(F.col("node").alias("b"), F.col("degree").alias("_db")),
        "b",
    )
    lo_first = F.struct(F.col("_da"), F.col("a")) < F.struct(
        F.col("_db"), F.col("b")
    )
    o = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    ).localCheckpoint(eager=False)
    if max_wedges is not None:
        est = (
            o.groupBy("u").agg(F.count(F.lit(1)).alias("_od"))
            .agg(F.sum(F.expr("_od * (_od - 1) div 2")))
            .first()[0]
            or 0
        )
        if est > max_wedges:
            raise ValueError(
                f"clustering_coefficient: degree-oriented wedge count is "
                f"{est} (> max_wedges={max_wedges}); the triangle join "
                "would stream that many candidate rows. This graph is "
                "pathologically dense even after orientation — raise "
                "max_wedges deliberately or pre-filter the edge list."
            )
    o2 = o.select(
        F.col("u"),
        F.col("v").alias("w"),
        F.col("dv").alias("dw"),
    )
    close = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    # wedge (v, w) out of u with (dv,v) < (dw,w): the closing edge, if
    # present, is oriented v -> w by construction — one semi-join
    tris = (
        o.join(o2, "u")
        .filter(
            F.struct(F.col("dv"), F.col("v"))
            < F.struct(F.col("dw"), F.col("w"))
        )
        .join(close, ["v", "w"], "left_semi")
        .select(
            F.col("u").alias("a"), F.col("v").alias("b"), F.col("w").alias("c")
        )
        # pin ONCE: the 3-way corner union below is three consumers of
        # this frame — unpinned, the wedge join (the dominant cost)
        # re-executes per corner (round-9 verdict finding #1,
        # PLANS.md's old tree showed the subtree three times)
        .localCheckpoint(eager=False)
    )
    tcount = (
        tris.select(F.col("a").alias("node"))
        .unionByName(tris.select(F.col("b").alias("node")))
        .unionByName(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    t = F.coalesce("n_triangles", F.lit(0))
    d = F.col("degree")
    return deg.join(tcount, "node", "left").select(
        "node",
        "degree",
        t.cast("long").alias("n_triangles"),
        F.when(
            d >= 2,
            F.round(
                F.lit(2.0) * t.cast("double") / (d * (d - 1)).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )


def transitivity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_wedges: int | None = 1_000_000_000,
) -> DataFrame:
    """GLOBAL clustering coefficient of an undirected graph — one row:
    ``(n_nodes, n_triangles, n_wedges, transitivity)`` with
    transitivity = 3·T / W (Wasserman & Faust 1994; a.k.a. the
    triangle density). The whole-graph companion to
    :func:`clustering_coefficient`'s per-node ratio: the single number
    a crawl-corpus health dashboard tracks round over round (a link
    farm collapses it; organic community structure holds it up).

    Pure composition: the per-node frame already carries everything —
    Σ n_triangles = 3T (each triangle counts at 3 corners) and
    W = Σ C(degree, 2) — so this is ONE aggregate over
    :func:`clustering_coefficient`'s output; it inherits the
    degree-ordered compact-forward enumeration, the single pinned
    wedge join, and the ``max_wedges`` breaker. All counts exact
    LONGs; the one float op is the final division, rounded 6 dp.
    """
    per_node = clustering_coefficient(
        edges, src=src, dst=dst, max_wedges=max_wedges
    )
    t3 = F.sum("n_triangles")  # = 3 * T, exact
    wedges = F.sum(F.expr("degree * (degree - 1) div 2"))
    return per_node.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("sum(n_triangles) div 3").cast("long").alias("n_triangles"),
        wedges.cast("long").alias("n_wedges"),
        F.when(
            wedges > 0,
            F.round(t3.cast("double") / wedges.cast("double"), 6),
        ).alias("transitivity"),
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    max_wedges: int | None = 1_000_000_000,
) -> DataFrame:
    """Neighborhood-overlap link prediction on an undirected graph:
    for every NON-edge pair with ≥ ``min_common`` common neighbors,
    ``(node_a, node_b, common_neighbors, jaccard, adamic_adar)``.

    The classic triad of local similarity scores (Liben-Nowell &
    Kleinberg 2003): common-neighbor count, Jaccard of neighborhoods,
    and Adamic-Adar (Σ 1/ln(deg(u)) over shared neighbors u — rare
    shared neighbors weigh more). On a co-purchase graph these rank
    "products that SHOULD be bought together but aren't yet" — the
    candidate generator for recommendation and for crawl frontier
    scoring.

    Scale shape: candidates come from the WEDGE join (two edge-table
    equi-joins through the shared neighbor — the same compact bound as
    triangle counting: Σ_u deg(u)²), aggregated per pair; existing
    edges are removed with one anti-join; degrees ride a broadcast-
    eligible node aggregate. ``min_common`` bounds the emitted pair
    set (1-common-neighbor pairs are noise at any scale).

    Determinism contract: counts and degrees are exact integers;
    Adamic-Adar terms are quantized to LONG micros per NEIGHBOR
    (half-away, the repo's `_quantize` contract — ln() is a libm call
    the two engines could disagree on in the last ulp, so the sum must
    be over pre-rounded integers, the lm_backoff_ppl pattern) and the
    LONG sum is order-free; jaccard divides two exact ints, one IEEE
    rounding, rounded 6 dp.

    Unlike triangle counting, the wedge here is IRREDUCIBLY centered
    on the shared neighbor (the score is about the endpoints of the
    wedge, so degree orientation can't shrink it): the candidate
    stream is exactly Σ C(deg(u), 2), quadratic in any hub's degree.
    ``max_wedges`` is therefore a circuit breaker, not an optimization
    (the DBSCAN ``max_cell_pts`` pattern): one 1-row aggregate
    computes the exact wedge count and raises with a cost model
    instead of launching an unpayable join — a planted 10⁶-degree hub
    alone is 5·10¹¹ candidates. Callers on hub-heavy graphs should
    pre-cap degrees (drop or sample hub adjacency) explicitly; ``None``
    disables the check.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=False)
    if max_wedges is not None:
        est = (
            deg.agg(F.sum(F.expr("deg * (deg - 1) div 2"))).first()[0] or 0
        )
        if est > max_wedges:
            raise ValueError(
                f"link_prediction: the shared-neighbor wedge join would "
                f"stream {est} candidate pairs (> max_wedges="
                f"{max_wedges}); Σ C(deg, 2) is quadratic in hub degree "
                "and cannot be oriented away for this score. Pre-cap hub "
                "degrees (drop or sample adjacency of the hottest nodes) "
                "or raise max_wedges deliberately."
            )
    # Adamic-Adar term per potential shared neighbor, LONG micros.
    # deg == 1 would make ln(deg) = 0 → Inf → ANSI cast error, but a
    # SHARED neighbor always has deg ≥ 2 (adjacent to both endpoints),
    # so the guard only silences rows that can never match a wedge.
    aa_term = F.when(
        F.col("deg") >= 2,
        F.floor(
            F.lit(1_000_000.0) / F.log(F.col("deg").cast("double"))
            + F.lit(0.5)
        ).cast("long"),
    )
    mid = deg.select(
        F.col("node").alias("u"),
        aa_term.alias("_aa"),
    )
    # wedges: (x, u), (u, y) with x < y — each unordered candidate
    # pair generated once per shared neighbor
    left = und.select(F.col("b").alias("u"), F.col("a").alias("x"))
    right = und.select(F.col("a").alias("u"), F.col("b").alias("y"))
    wedges = (
        left.join(right, "u")
        .filter(F.col("x") < F.col("y"))
        .join(mid, "u")
    )
    cand = (
        wedges.groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b"))
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("_aa").alias("_aa_sum"),
        )
        .filter(F.col("common_neighbors") >= min_common)
        # existing edges are not predictions
        .join(
            e.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
            ["node_a", "node_b"],
            "left_anti",
        )
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("deg").alias("_db"))
    return (
        cand.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (
                    F.col("_da") + F.col("_db") - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(F.col("_aa_sum").cast("double") / F.lit(1e6), 6).alias(
                "adamic_adar"
            ),
        )
    )
