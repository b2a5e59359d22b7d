"""CLIP-style image+caption alignment scoring (deterministic stand-in).

Public technique: CLIP-score filtering (Radford et al. 2021; the
LAION-400M/5B curation recipe, Schuhmann et al. 2021) keeps an
(image, caption) pair iff cosine(text_embedding, image_embedding)
clears a threshold. Together with the resolution/caption gates
(operators/images.py:filter_image_caption_pairs) this is the other
half of the canonical web-scale image-corpus filter — the graft analog
of the reference's per-page content gate (SpiderHtml extraction gate,
SURVEY.md §2.2 F13) applied to the image+caption payload.

No pretrained vision/text model ships in this sandbox, so both
encoders are DETERMINISTIC STAND-INS, clearly labeled:

- text: hashed bag-of-words (feature hashing, Weinberger et al. 2009)
  — each whitespace token md5-hashes to one of ``dim`` buckets with a
  ±1 sign bit; the embedding is the signed bucket-count vector. This
  side is a pure JVM expression tree (split → aggregate/zip_with), no
  Python.
- image: channel-statistics vector (per-channel mean/std, edge
  density, a constant bias term) in integer micro-units, produced by
  ONE Arrow decode pass (`clip_image_vec_udf`). Swap this pandas UDF
  for an ONNX CLIP encoder in production — nothing else changes; the
  batching, schema, and scoring plan are the real thing.

Determinism contract (what makes the DuckDB oracle exact):
- text vector entries are INTEGERS (signed counts);
- image vector entries are INTEGER micro-units (×10⁻⁴), pinned by the
  shared `clip_image_vec_micro` kernel;
- so dot = Σ tᵢfᵢ and the two squared norms are exact int64, and
  score = dot / sqrt(double(t2·f2)) is one IEEE-defined division of
  identical inputs in both engines → bit-equal before the round(6).

Scale shape at 100 TB: the caption side is whole-stage codegen over
the scan; the image side is one mapInPandas/Arrow batch pass; the
score is a row-local expression (caption and image live in the SAME
row per the input_hint schema — no join, no shuffle anywhere).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from lightcrawler_spark.imagecodec import decode_image

__all__ = [
    "CLIP_DIM",
    "clip_image_vec_micro",
    "clip_image_vec_udf",
    "make_image_encoder_udf",
    "caption_vec_expr",
    "clip_scores",
    "crossmodal_topk",
    "crossmodal_recall",
]

CLIP_DIM = 8
_SALT = "clip"


def clip_image_vec_micro(arr: np.ndarray) -> list[int]:
    """8-component image vector in integer micro-units (×10⁻⁴):
    [mean_r, mean_g, mean_b, std_r, std_g, std_b, edge, bias]/255-ish
    normalizations. Shared by the Spark UDF and the oracle generator so
    both sides see literally the same integers."""
    a = arr.astype(np.float64)
    mean = a.reshape(-1, 3).mean(axis=0) / 255.0
    std = a.reshape(-1, 3).std(axis=0) / 128.0
    gray = a.mean(axis=2)
    gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
    edge = min((gx + gy) / 64.0, 1.0)
    comps = [mean[0], mean[1], mean[2], std[0], std[1], std[2], edge, 1.0]
    return [int(round(c * 10000)) for c in comps]


@pandas_udf(T.ArrayType(T.LongType()))
def clip_image_vec_udf(data: pd.Series) -> pd.Series:
    """One Arrow pass: decode → stand-in embedding (micro-int vector).
    None for undecodable blobs (scored 0 / rejected downstream)."""
    out = []
    for b in data:
        try:
            out.append(clip_image_vec_micro(decode_image(bytes(b))))
        except Exception:
            out.append(None)
    return pd.Series(out)


def make_image_encoder_udf(kernel):
    """THE ENCODER SWAP SEAM: wrap any ``np.ndarray(H,W,3) -> list[int]``
    kernel (a real CLIP vision tower exported to ONNX, a mock in tests)
    in the production pandas-UDF contract — one Arrow batch pass,
    decode via imagecodec, per-row null on undecodable blobs. The
    default stand-in is exactly ``make_image_encoder_udf(
    clip_image_vec_micro)``; ``clip_scores(..., image_encoder=...)``
    accepts the result, and NOTHING else in the plan changes (asserted
    by tests/test_clip_seam.py)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _enc(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            try:
                out.append(kernel(decode_image(bytes(b))))
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _enc


def caption_vec_expr(caption_col: Column, dim: int = CLIP_DIM,
                     salt: str = _SALT) -> Column:
    """Signed hashed-BoW caption embedding as array<long>, pure JVM.

    token bucket = first 32 md5 bits of token‖salt mod dim; sign = +1
    iff the 9th hex digit < 8. One `aggregate` over the token array
    with a vector accumulator (zip_with add of a one-hot) — each token
    is evaluated exactly once, so the expression stays pushdown-safe
    (no outer-array capture; see the repetition-stats lesson,
    SURVEY.md §11)."""
    toks = F.filter(
        F.split(F.lower(caption_col), " "), lambda t: t != F.lit("")
    )

    def one_hot(tok: Column) -> Column:
        h = F.md5(F.concat(tok, F.lit(salt)))
        bucket = F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
        )
        sign = F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("long") < 8, F.lit(1)
        ).otherwise(F.lit(-1)).cast("long")
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == bucket, sign).otherwise(F.lit(0)).cast("long"),
        )

    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return F.aggregate(
        toks, zero, lambda acc, tok: F.zip_with(acc, one_hot(tok), lambda a, b: a + b)
    )


def clip_scores(
    df: DataFrame,
    threshold: float = 0.2,
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    dim: int = CLIP_DIM,
    image_vec_col: str | None = None,
    image_encoder=None,
) -> DataFrame:
    """Adds ``clip_score`` (cosine, rounded to 6 places) and ``keep``
    (score ≥ threshold). Pass `image_vec_col` to reuse a precomputed
    embedding column (e.g. persisted from a prior pass) and skip the
    decode; pass `image_encoder` (a pandas UDF from
    `make_image_encoder_udf`, e.g. wrapping a real ONNX CLIP vision
    tower) to replace the stand-in encoder — the plan shape is
    identical either way; otherwise `clip_image_vec_udf(bytes_col)`
    runs inline."""
    if image_vec_col:
        fvec = F.col(image_vec_col)
    elif image_encoder is not None:
        fvec = image_encoder(F.col(bytes_col))
    else:
        fvec = clip_image_vec_udf(F.col(bytes_col))
    tvec = caption_vec_expr(F.col(caption_col), dim=dim)
    out = df.withColumn("_fv", fvec).withColumn("_tv", tvec)
    dot = F.aggregate(
        F.zip_with(F.col("_tv"), F.col("_fv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = (
        out.withColumn("_dot", dot)
        .withColumn("_t2", sq(F.col("_tv")))
        .withColumn("_f2", sq(F.col("_fv")))
    )
    score = F.when(
        F.col("_fv").isNotNull() & (F.col("_t2") > 0) & (F.col("_f2") > 0),
        F.col("_dot") / F.sqrt((F.col("_t2") * F.col("_f2")).cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        out.withColumn("clip_score", F.round(score, 6))
        .withColumn("keep", F.col("clip_score") >= F.lit(float(threshold)))
        .drop("_fv", "_tv", "_dot", "_t2", "_f2")
    )


def crossmodal_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
    dim: int = CLIP_DIM,
    image_vec_col: str | None = None,
    image_encoder=None,
) -> DataFrame:
    """Caption→image retrieval top-k over an (image, caption) pair table
    — the scoring half of the standard CLIP retrieval eval (Recall@K on
    COCO/Flickr30k; the same protocol LAION reports for its released
    models). Each row's caption is a query against ALL images.

    Same encoder seams as `clip_scores` (pass `image_vec_col` to reuse a
    persisted embedding, `image_encoder` to swap in a real vision
    tower); same determinism contract — exact int64 dot/norms, one
    IEEE-defined division, round(6) — so a DuckDB oracle reproduces
    every score bit-for-bit.

    Scale shape: this is the EVAL harness, run on a bounded eval slice
    (a few thousand pairs), not the corpus — the caption side is
    broadcast and the cross join costs |eval|². At corpus scale,
    retrieval goes through the LSH/IVF paths (similarity.py);
    undecodable images are dropped from the retrieval corpus (they
    cannot be retrieved; their captions still count as queries).

    Returns ``(query_id, neighbor_id, sim, rank)`` with rank 1..k per
    query (ties: sim DESC, neighbor_id ASC).
    """
    if image_vec_col:
        fvec = F.col(image_vec_col)
    elif image_encoder is not None:
        fvec = image_encoder(F.col(bytes_col))
    else:
        fvec = clip_image_vec_udf(F.col(bytes_col))
    caps = F.broadcast(
        df.select(
            F.col(id_col).alias("query_id"),
            # NULL caption -> zero vector -> t2 = 0 -> sim 0.0 (the
            # clip_scores null contract), not a null-ordering hazard
            caption_vec_expr(
                F.coalesce(F.col(caption_col), F.lit("")), dim=dim
            ).alias("_tv"),
        )
    )
    imgs = df.select(
        F.col(id_col).alias("neighbor_id"), fvec.alias("_fv")
    ).filter(F.col("_fv").isNotNull())

    dot = F.aggregate(
        F.zip_with(F.col("_tv"), F.col("_fv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        caps.crossJoin(imgs)
        .withColumn("_dot", dot)
        .withColumn("_t2", sq(F.col("_tv")))
        .withColumn("_f2", sq(F.col("_fv")))
        .withColumn(
            "sim",
            F.round(
                F.when(
                    (F.col("_t2") > 0) & (F.col("_f2") > 0),
                    F.col("_dot")
                    / F.sqrt((F.col("_t2") * F.col("_f2")).cast("double")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def crossmodal_recall(
    df: DataFrame,
    ks: tuple[int, ...] = (1, 3, 5),
    **topk_kwargs,
) -> DataFrame:
    """Recall@K of caption→image retrieval: the fraction of captions
    whose OWN image appears in their top-K — the headline number of the
    CLIP eval protocol, and the measurement loop that tells a curation
    pipeline whether its alignment gate (clip_scores) is driven by a
    usable embedding space. One ``crossmodal_topk`` pass at max(ks),
    then per-K conditional counts; everything after the top-k is
    query-count-sized. Returns ``(k, n_queries, n_hits, recall)``."""
    spark = df.sparkSession
    kmax = max(ks)
    topk = crossmodal_topk(df, k=kmax, **topk_kwargs)
    hits = topk.filter(F.col("query_id") == F.col("neighbor_id")).select(
        "query_id", "rank"
    )
    n_queries = df.count()  # driver scalar (eval-slice-sized input)
    ks_df = spark.createDataFrame([(int(k),) for k in ks], "k int")
    per_k = (
        ks_df.join(hits, hits["rank"] <= ks_df["k"], "left")
        .groupBy("k")
        .agg(F.count("query_id").alias("n_hits"))
    )
    return per_k.select(
        "k",
        F.lit(n_queries).cast("long").alias("n_queries"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(F.col("n_hits") / F.lit(n_queries), 6).alias("recall"),
    )
