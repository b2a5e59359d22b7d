"""crossmodal_topk / crossmodal_recall: the CLIP retrieval eval.

Pins: perfect-alignment recall@1 = 1.0 (injected vectors), recall
monotone in K and = 1.0 at K = |corpus| for aligned spaces,
undecodable-image semantics (dropped from the corpus, still counted as
a query), and the encoder swap seam.
"""

import numpy as np
from pyspark.sql import functions as F

from lightcrawler_spark.operators.clipscore import (
    CLIP_DIM,
    caption_vec_expr,
    crossmodal_recall,
    crossmodal_topk,
    make_image_encoder_udf,
)


def _pairs_df(spark, n=12):
    # distinct captions -> distinct hashed-BoW vectors (verified below)
    return spark.range(n).select(
        F.format_string("img_%03d", F.col("id")).alias("image_id"),
        F.format_string(
            "sample caption number %d token%d", F.col("id"), F.col("id")
        ).alias("caption"),
    )


def test_perfectly_aligned_space_recall_at_1(spark):
    # image vector := own caption's text vector -> cosine(query, own) = 1.
    # recall@1 = 1.0 is guaranteed only for queries whose vector is not
    # PARALLEL to another image's (a tie at sim 1.0 can rank a smaller
    # id first), so keep the pairwise-non-parallel subset — hashed BoW
    # in 8 dims does collide (that's the point of the filter).
    df = _pairs_df(spark).withColumn(
        "ivec", caption_vec_expr(F.col("caption"), dim=CLIP_DIM)
    )
    vecs = {r["image_id"]: tuple(r["ivec"]) for r in df.collect()}

    def parallel(v, w):
        dot = sum(a * b for a, b in zip(v, w))
        return dot * dot == sum(a * a for a in v) * sum(b * b for b in w)

    keep = [
        i for i, v in vecs.items()
        if not any(parallel(v, w) for j, w in vecs.items() if j != i)
    ]
    assert len(keep) >= 8  # fixture sanity: most captions are distinct
    sub = df.filter(F.col("image_id").isin(keep))
    out = crossmodal_recall(sub, ks=(1, 3), image_vec_col="ivec").collect()
    by_k = {r["k"]: r for r in out}
    assert by_k[1]["recall"] == 1.0
    assert by_k[1]["n_queries"] == len(keep)
    assert by_k[3]["recall"] == 1.0


def test_recall_monotone_and_full_at_corpus_size(spark):
    from lightcrawler_spark.fixtures import make_images

    rows = make_images(16)
    df = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]),
          r["caption"] + " " + r["image_id"]) for r in rows],
        "image_id string, bytes binary, caption string",
    )
    out = {r["k"]: r["recall"]
           for r in crossmodal_recall(df, ks=(1, 4, 16)).collect()}
    assert out[1] <= out[4] <= out[16]
    assert out[16] == 1.0  # own image always inside top-|corpus|


def test_undecodable_image_dropped_from_corpus_not_queries(spark):
    df = _pairs_df(spark, n=6).withColumn(
        "ivec",
        F.when(
            F.col("image_id") == "img_000", F.lit(None)
        ).otherwise(caption_vec_expr(F.col("caption"), dim=CLIP_DIM)),
    )
    topk = crossmodal_topk(df, k=6, image_vec_col="ivec")
    assert topk.filter(F.col("neighbor_id") == "img_000").count() == 0
    out = {r["k"]: r for r in
           crossmodal_recall(df, ks=(6,), image_vec_col="ivec").collect()}
    assert out[6]["n_queries"] == 6   # the broken image still queries
    assert out[6]["n_hits"] == 5      # ...but can never be retrieved


def test_topk_rank_contract(spark):
    df = _pairs_df(spark, n=8).withColumn(
        "ivec", caption_vec_expr(F.col("caption"), dim=CLIP_DIM)
    )
    topk = crossmodal_topk(df, k=3, image_vec_col="ivec")
    per_q = topk.groupBy("query_id").agg(
        F.count("*").alias("n"), F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).collect()
    for r in per_q:
        assert (r["n"], r["lo"], r["hi"]) == (3, 1, 3)


def test_encoder_swap_seam(spark):
    from lightcrawler_spark.fixtures import make_images

    rows = make_images(8)
    df = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]), r["caption"])
         for r in rows],
        "image_id string, bytes binary, caption string",
    )

    def constant_kernel(arr: np.ndarray) -> list[int]:
        return [1] * CLIP_DIM

    enc = make_image_encoder_udf(constant_kernel)
    out = crossmodal_topk(df, k=2, image_encoder=enc)
    assert out.columns == ["query_id", "neighbor_id", "sim", "rank"]
    # constant image vectors: every query's ranking ties on sim, so
    # rank-1 is always the lexicographically smallest image id
    top1 = out.filter(F.col("rank") == 1).select("neighbor_id").distinct()
    assert [r["neighbor_id"] for r in top1.collect()] == ["img_000000000000"]


def test_null_caption_scores_zero(spark):
    df = spark.createDataFrame(
        [("a", "real caption"), ("b", None)],
        "image_id string, caption string",
    ).withColumn(
        "ivec", caption_vec_expr(F.coalesce(F.col("caption"), F.lit("")))
    )
    topk = crossmodal_topk(df, k=2, image_vec_col="ivec")
    b_rows = topk.filter(F.col("query_id") == "b").collect()
    assert all(r["sim"] == 0.0 for r in b_rows)  # zero vec -> sim 0.0
