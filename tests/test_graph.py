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
