"""PageRank semantics on hand-computable graphs.

The full operator is oracle-checked against the unrolled DuckDB CTE
twin (`pagerank_trade`) by scripts/selfcheck.py; these tests pin the
integer-mass arithmetic — teleport, damping, share division, dangling
redistribution — on graphs small enough to compute by hand.
"""

from __future__ import annotations

import pytest

from big_data_in_agriculture_spark.operators.graph import MASS, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ranks(df) -> dict[int, int]:
    return {r["node"]: r["rank_e12"] for r in df.collect()}


def test_two_node_chain_one_iteration(spark):
    # 1 -> 2. N=2, base = MASS div 2. Node 2 is dangling.
    # teleport = 15 * base div 100
    # share(1) = base div 1 = base; dangling = rank(2) = base
    # rank'(1) = teleport + 85 * (0    + base div 2) div 100
    # rank'(2) = teleport + 85 * (base + base div 2) div 100
    out = _ranks(pagerank(_edges(spark, [(1, 2)]), iterations=1))
    base = MASS // 2
    tele = 15 * base // 100
    assert out[1] == tele + (85 * (0 + base // 2)) // 100
    assert out[2] == tele + (85 * (base + base // 2)) // 100


def test_mass_conserved_within_truncation_dust(spark):
    # every div truncates; per round the loss is < N units per div
    # site (shares, dangling split, damping) — total drift stays tiny
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    out = _ranks(pagerank(_edges(spark, pairs), iterations=5))
    assert abs(sum(out.values()) - MASS) < 100 * len(out)


def test_symmetric_cycle_is_uniform(spark):
    # 3-cycle: perfectly symmetric, every node keeps base mass exactly
    out = _ranks(pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]),
                          iterations=4))
    base = MASS // 3
    # uniform at every round; per-round div truncation bleeds a few
    # units of dust, so the value sits just below base, never above
    assert len(set(out.values())) == 1
    val = next(iter(out.values()))
    assert base - 10 <= val <= base


def test_dangling_only_graph_redistributes_uniformly(spark):
    # 1 -> 2, 3 -> 2: node 2 absorbs, then its mass teleports back out
    # through the dangling term — no rank leaks to zero.
    out = _ranks(pagerank(_edges(spark, [(1, 2), (3, 2)]), iterations=3))
    assert all(v > 0 for v in out.values())
    assert out[2] > out[1] == out[3]


def test_damping_zero_is_pure_teleport(spark):
    out = _ranks(pagerank(_edges(spark, [(1, 2), (2, 3)]),
                          iterations=2, damping_pct=0))
    base = MASS // 3
    assert set(out.values()) == {100 * base // 100}


def test_damping_hundred_has_no_teleport(spark):
    # star into node 2 with damping 1.0: source nodes keep only
    # dangling-redistributed mass (no teleport floor)
    out = _ranks(pagerank(_edges(spark, [(1, 2)]), iterations=1,
                          damping_pct=100))
    base = MASS // 2
    assert out[1] == (100 * (base // 2)) // 100
    assert out[2] == (100 * (base + base // 2)) // 100


def test_zero_iterations_is_uniform_base(spark):
    out = _ranks(pagerank(_edges(spark, [(1, 2), (3, 4)]), iterations=0))
    assert set(out.values()) == {MASS // 4}


def test_empty_graph_returns_empty(spark):
    df = _edges(spark, [(1, 2)]).filter("src > 99")
    out = pagerank(df, iterations=2)
    assert out.count() == 0
    assert out.columns == ["node", "rank_e12"]


def test_parallel_edges_carry_multiple_shares(spark):
    # duplicate edge 1->2 beside 1->3: outdeg(1)=3, node 2 gets two
    # shares — parallel edges are honored, not deduplicated
    out = _ranks(pagerank(
        _edges(spark, [(1, 2), (1, 2), (1, 3)]), iterations=1))
    assert out[2] > out[3]


def test_invalid_params_raise(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)


# ---------------------------------------------------------------------------
# bfs_levels
# ---------------------------------------------------------------------------

from big_data_in_agriculture_spark.operators.graph import bfs_levels  # noqa: E402


def _srcs(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def _levels(df) -> dict[int, int]:
    return {r["node"]: r["level"] for r in df.collect()}


def test_bfs_chain_levels(spark):
    out = _levels(bfs_levels(
        _edges(spark, [(1, 2), (2, 3), (3, 4)]), _srcs(spark, [1])))
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_level_wins_on_multiple_paths(spark):
    # 1->4 directly and 1->2->3->4: node 4 is level 1, not 3
    out = _levels(bfs_levels(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)]),
        _srcs(spark, [1])))
    assert out[4] == 1


def test_bfs_multi_source_takes_nearest(spark):
    out = _levels(bfs_levels(
        _edges(spark, [(1, 2), (2, 3), (9, 3)]), _srcs(spark, [1, 9])))
    assert out == {1: 0, 9: 0, 2: 1, 3: 1}


def test_bfs_cycle_terminates(spark):
    out = _levels(bfs_levels(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), _srcs(spark, [1])))
    assert out == {1: 0, 2: 1, 3: 2}


def test_bfs_unreachable_and_depth_bound(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (8, 9)])
    out = _levels(bfs_levels(e, _srcs(spark, [1]), max_depth=2))
    assert out == {1: 0, 2: 1, 3: 2}  # 4 beyond bound, 8/9 unreachable


def test_bfs_direction_respected(spark):
    # edge 2->1 does not make 2 reachable FROM 1
    out = _levels(bfs_levels(_edges(spark, [(2, 1)]), _srcs(spark, [1])))
    assert out == {1: 0}


def test_bfs_zero_depth_is_sources_only(spark):
    out = _levels(bfs_levels(
        _edges(spark, [(1, 2)]), _srcs(spark, [1]), max_depth=0))
    assert out == {1: 0}


def test_bfs_negative_depth_raises(spark):
    with pytest.raises(ValueError):
        bfs_levels(_edges(spark, [(1, 2)]), _srcs(spark, [1]), max_depth=-1)


def test_supplier_offset_clears_custkeys_at_all_shipped_sfs():
    # _PR_SUPP_OFFSET is a static literal (oracle_sql() strings cannot
    # depend on data), so its no-collision guarantee is an SF ceiling:
    # custkeys reach 150_000*SF, crossing 10M near SF 66. Pin the
    # invariant on every shipped testdata SF so a bigger generation
    # fails loudly instead of silently merging customer and supplier
    # nodes on both engines (round-8 ADVICE).
    import glob

    import duckdb

    import __spark_entry__ as entry

    dirs = sorted(glob.glob("/root/testdata/sf*/orders.parquet"))
    assert dirs, "no shipped testdata found"
    con = duckdb.connect()
    for p in dirs:
        mx = con.sql(f"SELECT max(o_custkey) FROM read_parquet('{p}')").fetchone()[0]
        assert mx < entry._PR_SUPP_OFFSET, (p, mx)
