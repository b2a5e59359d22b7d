"""connected_components vs a union-find ground truth."""

import random

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min node of the group
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items() for v in members}


@pytest.mark.parametrize("seed,n,m", [(1, 40, 30), (2, 80, 120), (3, 25, 5)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.range(n).select(F.col("id").alias("node"))
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == _union_find(n, edges)


def test_cc_long_chain_converges(spark):
    # worst case for label propagation: a path graph (diameter = n-1)
    n = 12
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, max_iter=n + 2).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_cc_empty_edges_singletons(spark):
    ndf = spark.range(5).select(F.col("id").alias("node"))
    empty = spark.createDataFrame([], "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(empty, nodes=ndf).collect()
    }
    assert got == {i: i for i in range(5)}


def test_dedup_cluster_assignments(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (0, 2)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster"], r["is_canonical"])
        for r in dedup_cluster_assignments(pairs, docs).collect()
    }
    assert rows == {
        0: (0, True), 2: (0, False),
        1: (1, True), 3: (1, False), 5: (1, False),
        4: (4, True),
    }


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _numpy_pagerank(n, edges, iterations, d):
    import numpy as np

    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[out_deg == 0].sum()
        nxt = np.full(n, (1.0 - d) / n + d * dangling / n)
        for s, t in edges:
            nxt[t] += d * r[s] / out_deg[s]
        r = nxt
    return r


@pytest.mark.parametrize("seed", [0, 1])
def test_pagerank_matches_numpy(spark, seed):
    """Random graph incl. dangling nodes and parallel edges."""
    import numpy as np

    from lightcrawler_spark.operators.graph import pagerank

    rng = np.random.default_rng(seed)
    n, m = 40, 120
    edges = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)]
    edges.append(edges[0])  # force a parallel edge
    nodes_df = spark.range(n).select(F.col("id").alias("node"))
    e_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e_df, nodes=nodes_df, iterations=5, damping=0.85).collect()
    }
    exp = _numpy_pagerank(n, edges, iterations=5, d=0.85)
    assert len(got) == n
    for i in range(n):
        assert abs(got[i] - exp[i]) < 1e-12, (i, got[i], exp[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_dyadic_graph_exact(spark):
    """Power-of-two graph: every intermediate is a dyadic rational, so
    doubles are EXACT and independent of summation order — the property
    the link_pagerank oracle relies on."""
    from fractions import Fraction

    from lightcrawler_spark.operators.graph import pagerank

    n = 64
    edges = [(i, (2 * i + 1) % n) for i in range(n)]
    edges += [(i, i // 2) for i in range(0, n, 2)]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    nodes_df = spark.range(n).select(F.col("id").alias("node"))
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e_df, nodes=nodes_df, iterations=3, damping=0.5).collect()
    }

    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = {i: Fraction(1, n) for i in range(n)}
    for _ in range(3):
        nxt = {i: Fraction(1, 2 * n) for i in range(n)}
        for s, t in edges:
            nxt[t] += Fraction(1, 2) * r[s] / out_deg[s]
        r = nxt
    for i in range(n):
        assert got[i] == float(r[i]), (i, got[i], r[i])


def test_pagerank_empty_graph(spark):
    from lightcrawler_spark.operators.graph import pagerank

    e_df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e_df, iterations=2).count() == 0
