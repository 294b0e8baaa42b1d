"""training/graph.py — integer micro-unit PageRank."""

import pytest

from openeo_processes_dask_spark.training.graph import SCALE, pagerank


def _python_pagerank(edges, iterations, damping_pct=85):
    """Independent replay of the documented integer update rule."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    init = SCALE // n
    base = ((100 - damping_pct) * init) // 100
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for u, v in edges:
            inc[v] += rank[u] // outdeg[u]
        rank = {v: base + (damping_pct * inc[v]) // 100 for v in nodes}
    return rank


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1),
    # 6 is dangling (inbound only); 7 links out but nothing links in
    (2, 6), (7, 1),
]


def test_pagerank_matches_python_replay(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    assert got == _python_pagerank(EDGES, 4)


def test_pagerank_partitioning_invariant(spark):
    df1 = spark.createDataFrame(EDGES, ["src", "dst"]).repartition(7)
    df2 = spark.createDataFrame(EDGES, ["src", "dst"]).coalesce(1)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, iterations=3).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(df2, iterations=3).collect()}
    assert r1 == r2


def test_pagerank_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=0).collect()}
    n = len({u for u, _ in EDGES} | {v for _, v in EDGES})
    assert set(got.values()) == {SCALE // n}


def test_pagerank_authority_ordering(spark):
    # node 3 collects the most inbound links, and hands ALL of it to its
    # only out-neighbor 1, so 1 > 3 > everything else; the no-inbound
    # nodes 4/5/7 share the pure-base minimum
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    ranked = sorted(got, key=lambda v: -got[v])
    assert ranked[:2] == [1, 3]
    assert got[4] == got[5] == got[7] == min(got.values())


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)


def test_pagerank_long_chain_checkpoints(spark):
    # 12 iterations crosses two checkpoint intervals; the chain graph
    # also exercises rank flow over distance
    chain = [(i, i + 1) for i in range(10)] + [(10, 0)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=12).collect()}
    assert got == _python_pagerank(chain, 12)
