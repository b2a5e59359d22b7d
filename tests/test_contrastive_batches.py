"""contrastive_batches: dedup-cluster-aware batch layout.

Pins the operator's whole contract: the conflict-free guarantee (no two
same-cluster rows in one batch), the batch-size bounds, the feasibility
growth path when a mega-cluster exceeds ceil(N/B), NULL-cluster
singleton semantics, physical-partitioning invariance, and the edge
cases (empty input, bad batch_size).
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.chunking import contrastive_batches


def _fixture(spark, n=300, mega=40):
    return spark.range(n).select(
        F.col("id").alias("image_id"),
        F.when(F.col("id") < mega, F.lit(1000))
        .when(F.col("id") < 200, F.col("id") % 13)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("cluster_id"),
    )


def _collect(df):
    return sorted(
        (r["image_id"], r["cluster_key"], r["cluster_size"],
         r["layout_rank"], r["batch_idx"])
        for r in df.collect()
    )


def test_no_same_cluster_pair_in_any_batch(spark):
    out = contrastive_batches(
        _fixture(spark), batch_size=8, id_col="image_id"
    )
    rows = out.select("batch_idx", "cluster_key").collect()
    seen = set()
    for r in rows:
        key = (r["batch_idx"], r["cluster_key"])
        assert key not in seen, f"duplicate cluster in batch: {key}"
        seen.add(key)


def test_batch_sizes_bounded_and_balanced(spark):
    out = contrastive_batches(
        _fixture(spark), batch_size=8, id_col="image_id"
    )
    counts = [
        r["n"] for r in
        out.groupBy("batch_idx").agg(F.count("*").alias("n")).collect()
    ]
    # N=300, max cluster 40 > ceil(300/8)=38 -> n_batches=40;
    # every batch gets floor/ceil(300/40) = 7 or 8 rows, <= batch_size
    assert len(counts) == 40
    assert set(counts) <= {7, 8}
    assert sum(counts) == 300


def test_mega_cluster_forces_batch_count_growth(spark):
    out = contrastive_batches(
        _fixture(spark), batch_size=8, id_col="image_id"
    )
    n_batches = out.agg(F.countDistinct("batch_idx")).first()[0]
    assert n_batches == 40  # max cluster size, not ceil(300/8)=38
    mega = out.filter(F.col("cluster_key") == "c:1000")
    assert mega.count() == 40
    assert mega.agg(F.countDistinct("batch_idx")).first()[0] == 40


def test_normal_path_uses_ceil_n_over_b(spark):
    # no mega-cluster: 300 rows, biggest cluster 13 <= ceil(300/16)=19
    df = _fixture(spark, mega=0)
    out = contrastive_batches(df, batch_size=16, id_col="image_id")
    n_batches = out.agg(F.countDistinct("batch_idx")).first()[0]
    assert n_batches == 19
    per = [
        r["n"] for r in
        out.groupBy("batch_idx").agg(F.count("*").alias("n")).collect()
    ]
    assert max(per) <= 16


def test_null_clusters_are_singletons(spark):
    out = contrastive_batches(
        _fixture(spark), batch_size=8, id_col="image_id"
    )
    singles = out.filter(F.col("cluster_id").isNull())
    assert singles.count() == 100
    assert singles.filter(
        ~F.col("cluster_key").startswith("s:")
    ).count() == 0
    assert singles.filter(F.col("cluster_size") != 1).count() == 0


def test_partitioning_invariance(spark):
    df = _fixture(spark)
    a = _collect(contrastive_batches(
        df, batch_size=8, id_col="image_id", num_partitions=2))
    b = _collect(contrastive_batches(
        df.repartition(13), batch_size=8, id_col="image_id",
        num_partitions=13))
    assert a == b


def test_layout_rank_is_a_permutation(spark):
    out = contrastive_batches(
        _fixture(spark), batch_size=8, id_col="image_id"
    )
    ranks = sorted(r["layout_rank"] for r in out.collect())
    assert ranks == list(range(300))


def test_empty_input(spark):
    df = _fixture(spark).filter(F.lit(False))
    out = contrastive_batches(df, batch_size=8, id_col="image_id")
    assert out.count() == 0
    assert "batch_idx" in out.columns


def test_bad_batch_size_raises(spark):
    with pytest.raises(ValueError):
        contrastive_batches(_fixture(spark), batch_size=0)
