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

# --- triangle_counts ---------------------------------------------------

from openeo_processes_dask_spark.training.graph import triangle_counts  # noqa: E402


def _python_triangles(edges):
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {v: 0 for v in adj}
    for a, b in canon:
        for c in adj[a] & adj[b]:
            if c > b:
                out[a] += 1
                out[b] += 1
                out[c] += 1
    return out


def test_triangles_known_graph(spark):
    # K4 on {1..4} (every node in C(3,2)=3 triangles) plus a pendant 5
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangles_dedup_loops_and_reversals(spark):
    # duplicates, reversed duplicates, and self-loops must not inflate
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_matches_python_on_random_graph(spark):
    # deterministic pseudo-random graph incl. a hub (node 0) to exercise
    # the degree orientation
    edges = [((i * i) % 23, (i * 7 + 2) % 23) for i in range(80)]
    edges += [(0, i) for i in range(1, 15)]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(5)
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == _python_triangles(edges)


def test_triangles_triangle_free(spark):
    # even cycle: no triangles anywhere
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(cyc, ["src", "dst"])
    rows = triangle_counts(df).collect()
    assert len(rows) == 8 and all(r["triangles"] == 0 for r in rows)
