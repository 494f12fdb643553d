"""Personalized PageRank golden tests (SURVEY §5.2: golden-value pins
for non-SQL kernels — fixed point on a hand-checkable toy graph vs an
independent numpy power iteration)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_and_spark_spark.operators import graph as G

# Toy graph (FIXTURES.md §4): 5 nodes, node 3 dangling (no out-edges),
# node 4 has an edge to nonexistent node 9 (mass vanishes → swept to
# source).
TOY = [
    (0, [1, 2]),
    (1, [2]),
    (2, [0, 3]),
    (3, []),
    (4, [0, 9]),
]
SOURCES = (0, 4)
ALPHA = 0.15


def numpy_ppr(iters: int) -> np.ndarray:
    """Independent reference: per-source power iteration with all
    missing mass (dangling + out-of-graph) returned to the source."""
    nids = [n for n, _ in TOY]
    idx = {n: i for i, n in enumerate(nids)}
    ranks = np.zeros((len(SOURCES), len(nids)))
    for si, s in enumerate(SOURCES):
        ranks[si][idx[s]] = 1.0
    for _ in range(iters):
        new = np.zeros_like(ranks)
        for n, adj in TOY:
            if not adj:
                continue
            share = ranks[:, idx[n]] / len(adj)
            for m in adj:
                if m in idx:
                    new[:, idx[m]] += share
        for si, s in enumerate(SOURCES):
            missing = 1.0 - new[si].sum()
            new[si] = (1 - ALPHA) * new[si]
            new[si][idx[s]] += ALPHA + (1 - ALPHA) * missing
        ranks = new
    return ranks


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_ppr_matches_numpy(spark, iters):
    gdf = spark.createDataFrame(TOY, "nid int, adj array<int>")
    got = G.personalized_pagerank(
        gdf, sources=SOURCES, alpha=ALPHA, iterations=iters
    )
    rows = {r.nid: r.ranks for r in got.collect()}
    want = numpy_ppr(iters)
    nids = [n for n, _ in TOY]
    for si in range(len(SOURCES)):
        for i, n in enumerate(nids):
            assert rows[n][si] == pytest.approx(want[si][i], abs=1e-12)
        # probability mass conserved per source
        assert sum(rows[n][si] for n in nids) == pytest.approx(1.0, abs=1e-9)


def test_adjacency_parser(spark):
    lines = spark.createDataFrame(
        [("1 2 3",), ("2",), ("  ",), ("3 1",)], ["value"]
    )
    rows = {r.nid: r.adj for r in G.parse_adjacency(lines).collect()}
    assert rows == {1: [2, 3], 2: [], 3: [1]}


def test_top_nodes_per_source(spark):
    gdf = spark.createDataFrame(TOY, "nid int, adj array<int>")
    ranks = G.personalized_pagerank(gdf, sources=SOURCES, iterations=5)
    top = G.top_nodes_per_source(ranks, k=3).collect()
    by_src = {}
    for r in top:
        by_src.setdefault(r.source_idx, []).append(r.rank)
    for si, vals in by_src.items():
        assert vals == sorted(vals, reverse=True)
        assert len(vals) == 3
    # source node dominates its own personalized ranking
    assert top[0].nid == SOURCES[0]


def test_ppr_query_runs(spark, sf_dir):
    df = G.personalized_pagerank_query(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == G.PR_NUM_NODES
    s0 = sum(r.rank_s0 for r in rows)
    assert s0 == pytest.approx(1.0, abs=1e-3)


def test_ppr_observed_metrics(spark):
    """A14: the Observation channel reports graph size and per-source
    mass conservation without any extra job (the reference's
    accumulator counters, RunPersonalizedPageRankBasic.java:80-82)."""
    from pyspark.sql import Observation

    gdf = spark.createDataFrame(TOY, "nid int, adj array<int>")
    graph_obs, mass_obs = Observation(), Observation()
    out = G.personalized_pagerank(
        gdf,
        sources=SOURCES,
        alpha=ALPHA,
        iterations=3,
        graph_obs=graph_obs,
        mass_obs=mass_obs,
    )
    out.collect()
    g = graph_obs.get
    assert g["n_nodes"] == len(TOY)
    assert g["n_edges"] == sum(len(adj) for _, adj in TOY)
    m = mass_obs.get
    assert m["n_nodes"] == len(TOY)
    for j in range(len(SOURCES)):
        assert m[f"mass_{j}"] == pytest.approx(1.0, abs=1e-9)


def test_pagerank_top_nodes_query_consistent(spark, sf_dir):
    """The registered extraction query must agree with a driver-side
    top-10 selection over the round6-ROUNDED converged ranks — the
    same sort key the window (and the DuckDB oracle) uses, so
    summation-order ulps on structurally tied nodes cannot flip the
    comparison at the 10/11 boundary."""
    from conftest import py_round6 as r6

    ranks = G.personalized_pagerank(
        G.lineitem_graph(spark, sf_dir), partitions=4, gather_partitions=4
    ).collect()
    got = [
        (r.source_idx, r.nid)
        for r in G.pagerank_top_nodes_query(spark, sf_dir).collect()
    ]
    want = []
    for si in range(len(G.PR_SOURCES)):
        top = sorted(ranks, key=lambda r: (-r6(r.ranks[si]), r.nid))[:10]
        want += [(si, r.nid) for r in top]
    assert got == want


def test_converged_ranks_computed_once_per_corpus(spark, sf_dir):
    """The two registered queries share ONE converged-ranks
    computation per (session, corpus) — the reference's stored-output
    handoff (ExtractTopPersonalizedPageRankNodes reads phase-1's HDFS
    output instead of re-iterating)."""
    a = G.converged_lineitem_ranks(spark, sf_dir)
    b = G.converged_lineitem_ranks(spark, sf_dir)
    assert a is b
    # and both registered queries go through the memo
    G.personalized_pagerank_query(spark, sf_dir).collect()
    G.pagerank_top_nodes_query(spark, sf_dir).collect()
    assert G.converged_lineitem_ranks(spark, sf_dir) is a


def test_ppr_vs_unrolled_oracle(spark, sf_dir):
    """The registered PPR pair matches the 10-step unrolled-CTE DuckDB
    oracle exactly (round6-portable presentation): the driver-gate
    comparison, run in-suite so an arithmetic drift in either the
    operator or the oracle generator is caught before the round ends."""
    from hadoop_and_spark_spark.oracle import compare
    from hadoop_and_spark_spark.operators import graph as G

    for name, fn in (
        ("personalized_pagerank", G.personalized_pagerank_query),
        ("pagerank_top_nodes", G.pagerank_top_nodes_query),
    ):
        ok, msg = compare(spark, sf_dir, fn, G.ORACLE_SQL[name])
        assert ok, f"{name}: {msg}"


def test_graph_triangles_vs_oracle(spark, sf_dir):
    from hadoop_and_spark_spark.oracle import compare
    from hadoop_and_spark_spark.operators import graph as G

    ok, msg = compare(
        spark, sf_dir, G.graph_triangles, G.ORACLE_SQL["graph_triangles"]
    )
    assert ok, msg


def test_graph_triangles_matches_bruteforce(spark, sf_dir):
    """The degree-oriented count equals a driver-side brute-force
    enumeration over the same derived graph (validates the
    orientation algebra, not just cross-engine agreement)."""
    from hadoop_and_spark_spark.operators import graph as G

    adj: dict[int, set] = {}
    for r in G.lineitem_graph(spark, sf_dir).collect():
        for d in r.adj:
            if d != r.nid:
                adj.setdefault(min(r.nid, d), set()).add(max(r.nid, d))
    und = {(a, b) for a, bs in adj.items() for b in bs}
    nbrs: dict[int, set] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    # each triangle {x<y<z} is counted exactly once: at edge (x, y)
    # via the common neighbor z > y
    tri = sum(
        sum(1 for z in nbrs[a] & nbrs[b] if z > b) for a, b in und
    )
    row = G.graph_triangles(spark, sf_dir).collect()[0]
    assert row.n_edges == len(und)
    assert row.n_triangles == tri
