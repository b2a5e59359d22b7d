"""operators/clustering.py — distributed Lloyd's k-means in exact int64
micro-units. The determinism contract is the whole point: results must
be bit-identical at ANY partitioning (local[4] fixture here, 1000
executors in production), which these tests pin directly by comparing a
1-partition run against a 7-partition run, alongside the semantic
pins (argmin ties → lowest cid, empty clusters keep their previous
centroid, SemDeDup blocking never pairs across clusters)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _toy(spark, parts: int):
    # two tight blobs far apart + one outlier, fixed layout
    rows = [
        (0, [0.10, 0.20]),
        (1, [0.11, 0.19]),
        (2, [0.12, 0.21]),
        (3, [5.00, 5.00]),
        (4, [5.01, 4.99]),
        (5, [-9.0, -9.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def test_partitioning_invariance(spark):
    from lightcrawler_spark.operators.clustering import kmeans_centroids

    a = kmeans_centroids(_toy(spark, 1), k=3, iters=4).collect()
    b = kmeans_centroids(_toy(spark, 7), k=3, iters=4).collect()
    assert sorted((r["cid"], list(r["centroid"])) for r in a) == sorted(
        (r["cid"], list(r["centroid"])) for r in b
    )


def test_converged_centroids_are_cluster_means(spark):
    from lightcrawler_spark.operators.clustering import kmeans_centroids

    cents = {
        r["cid"]: list(r["centroid"])
        for r in kmeans_centroids(_toy(spark, 3), k=3, iters=4).collect()
    }
    # init = 3 smallest ids (all in blob A); after convergence the three
    # centroids must partition {blob A, blob B, outlier}. Exact int64
    # means: blob B = floor((5000000+5010000)/2), floor((5000000+4990000)/2)
    assert sorted(cents.values()) == sorted(
        [
            [110000, 200000],  # mean of blob A (0.10,0.11,0.12 / …)
            [5005000, 4995000],  # mean of blob B
            [-9000000, -9000000],  # the outlier alone
        ]
    )


def test_empty_cluster_keeps_previous_centroid(spark):
    from lightcrawler_spark.operators.clustering import kmeans_centroids

    # k=2 over two identical points: centroid 1 wins nothing after
    # iteration 1 (ties go to cid 0) and must keep its init vector.
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = {
        r["cid"]: list(r["centroid"])
        for r in kmeans_centroids(df, k=2, iters=2).collect()
    }
    assert cents[0] == [1000000, 1000000]
    assert cents[1] == [1000000, 1000000]  # retained, not NULL/zeroed


def test_assignment_tie_breaks_to_lowest_cid(spark):
    from lightcrawler_spark.operators.clustering import kmeans_assignments

    cents = spark.createDataFrame(
        [(0, [0, 0]), (1, [0, 0]), (2, [10_000_000, 0])],
        "cid int, centroid array<bigint>",
    )
    df = spark.createDataFrame(
        [(7, [0.001, 0.0])], "vec_id long, embedding array<float>"
    )
    row = kmeans_assignments(df, cents).collect()[0]
    assert row["cid"] == 0  # equidistant from cid 0 and 1 → lowest
    assert row["dist"] == 1000 * 1000


def test_bcast_assignment_matches_inlined(spark):
    from lightcrawler_spark.operators.clustering import (
        kmeans_assignments,
        kmeans_assignments_bcast,
        kmeans_centroids,
    )

    df = _toy(spark, 5)
    cents = kmeans_centroids(df, k=3, iters=2)
    a = sorted(map(tuple, kmeans_assignments(df, cents).collect()))
    b = sorted(map(tuple, kmeans_assignments_bcast(df, cents).collect()))
    assert a == b

    # tie-break parity: equidistant centroids resolve to the lowest cid
    # in BOTH paths regardless of centroid-row order
    tie = spark.createDataFrame(
        [(2, [0, 0]), (0, [0, 0]), (1, [10_000_000, 0])],
        "cid int, centroid array<bigint>",
    )
    pt = spark.createDataFrame(
        [(7, [0.001, 0.0])], "vec_id long, embedding array<float>"
    )
    row = kmeans_assignments_bcast(pt, tie).collect()[0]
    assert (row["cid"], row["dist"]) == (0, 1000 * 1000)


def test_bcast_assignment_large_k(spark):
    # k=2048 × dim=16: far beyond the inlined path's comfort zone —
    # the broadcast-data path must plan and run without literal
    # pressure, and every vector must pick its true argmin centroid.
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.clustering import (
        kmeans_assignments_bcast,
    )

    k, dim = 2048, 16
    cents = spark.range(k).select(
        F.col("id").cast("int").alias("cid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.col("id") * 1000 + i).cast("long"),
        ).alias("centroid"),
    )
    # vectors sitting exactly ON centroid c = 3*c for a few c values
    pts = spark.range(0, 30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: ((F.col("id") * 3 * 1000 + i).cast("double")
                       / F.lit(1000000.0)),
        ).alias("embedding"),
    )
    got = {r["vec_id"]: r for r in kmeans_assignments_bcast(pts, cents).collect()}
    assert len(got) == 30
    for v in range(30):
        assert got[v]["cid"] == 3 * v
        assert got[v]["dist"] == 0


def test_empty_centroids_raise(spark):
    from lightcrawler_spark.operators.clustering import kmeans_assignments

    cents = spark.createDataFrame([], "cid int, centroid array<bigint>")
    df = spark.createDataFrame(
        [(0, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="centroid"):
        kmeans_assignments(df, cents)


def test_empty_corpus_yields_empty_pairs(spark):
    from lightcrawler_spark.operators.clustering import (
        kmeans_block_pairs,
        semantic_dedup_kmeans,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    pairs = kmeans_block_pairs(empty, k=4, iters=1)
    assert pairs.columns == ["id_a", "id_b", "sim"]
    assert pairs.count() == 0
    assert semantic_dedup_kmeans(empty, k=4, iters=1).count() == 0


def test_semantic_dedup_blocks_by_cluster(spark):
    from lightcrawler_spark.operators.clustering import (
        kmeans_assignments,
        kmeans_centroids,
        semantic_dedup_kmeans,
    )

    # blob A: three near-identical vectors (cosine ≈ 1) + blob B far
    # away but also mutually similar; k=2 separates them, so dedup
    # groups never span blobs even at threshold 0.
    rows = [
        (0, [1.0, 0.01]),
        (1, [1.0, 0.02]),
        (2, [1.0, 0.015]),
        (10, [-1.0, -0.01]),
        (11, [-1.0, -0.02]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r
        for r in semantic_dedup_kmeans(
            df, k=2, iters=2, threshold=0.9
        ).collect()
    }
    assert len(got) == 5
    assert got[0]["cluster"] == got[1]["cluster"] == got[2]["cluster"] == 0
    assert got[10]["cluster"] == got[11]["cluster"] == 10
    assert got[0]["is_canonical"] and got[10]["is_canonical"]
    assert not got[1]["is_canonical"] and not got[11]["is_canonical"]

    # the blocking really is the k-means assignment: every pair inside
    # a dedup group shares a kmeans cid
    cents = kmeans_centroids(df, k=2, iters=2)
    cids = {
        r["vec_id"]: r["cid"]
        for r in kmeans_assignments(df, cents).collect()
    }
    for a in got:
        for b in got:
            if got[a]["cluster"] == got[b]["cluster"]:
                assert cids[a] == cids[b]
