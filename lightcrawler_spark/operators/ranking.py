"""Relevance ranking over the extracted-document corpus.

Downstream consumer of the S10 index sink (the reference hands ranking
to xunsearch — worker/IndexManager.class.php:41-132; a Spark-native
stack needs the scorer itself). BM25 (Robertson/Spärck Jones) over the
repo's alnum-token convention.

Scale shape: the corpus statistics BM25 needs (N, avgdl, per-term df for
the QUERY's terms only — never the full vocabulary) are one aggregate
job collapsing to a handful of driver-side scalars; the score is then a
single whole-stage-codegen'd map over the corpus with those scalars
inlined as literals. No join, no shuffle beyond the stats aggregate —
a 100 TB corpus scores in one scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "tfidf_keywords"]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^0-9a-z]+"),
        lambda x: F.length(x) > 0,
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query_terms``.

    score(D) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                 · tf_t·(k1+1) / (tf_t + k1·(1 - b + b·|D|/avgdl))

    Emits ``(id_col, dl, tf_<term>..., score)``; callers top-k with the
    salted two-stage rank (operators/sampling.py style) if they need a
    bounded result. The stats pass and the scoring pass each read the
    corpus once.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(text_col)
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("dl")
    )

    stat_exprs = [F.count("*").alias("_n"), F.avg("dl").alias("_avgdl")]
    for i, t in enumerate(query_terms):
        stat_exprs.append(
            F.sum(F.array_contains("_toks", t).cast("int")).alias(f"_df_{i}")
        )
    stats = base.agg(*stat_exprs).collect()[0]
    n, avgdl = stats["_n"], stats["_avgdl"]
    if not n:
        return base.select(id_col, "dl", F.lit(0.0).alias("score"))

    def _eq(term: str):
        # single-arg lambda on purpose: a two-arg callable would make the
        # HOF pass the element INDEX as the second argument
        return lambda x: x == F.lit(term)

    score = F.lit(0.0)
    out_cols = [F.col(id_col), F.col("dl")]
    for i, t in enumerate(query_terms):
        df_t = stats[f"_df_{i}"]
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        tf = F.size(F.filter("_toks", _eq(t)))
        out_cols.append(tf.alias(f"tf_{t}"))
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
        )
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
    return base.select(*out_cols, score.alias("score"))


def tfidf_keywords(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_k: int = 5) -> DataFrame:
    """Top-k keywords per document by TF-IDF — the per-document summary
    signal an index sink (S10) stores next to the BM25-ranked content
    (tags/keyword fields in the reference's product row:
    worker/XlegalLawContentRecord.class.php:11-28 carries hand-extracted
    `tags`; corpus scale derives them instead).

    score = tf · idf with the smooth idf ln((1+N)/(1+df)) + 1 (the
    sklearn convention: no zero idf, no division by zero). The idf is
    quantized to integer MICRO-units once per term, so the per-row score
    ``score_micro = tf × idf_micro`` is exact integer arithmetic — rank
    order is bit-deterministic across engines (a raw double product
    could rank-flip on a 1-ulp ln() difference between libms).

    Scale shape: groupBy(doc, term) term frequencies (map-side combine),
    groupBy(term) document frequencies, one hash-join back, and a rank
    window partitioned by doc. N collapses to a driver scalar (BM25
    pattern). Output: ``(id_col, term, tf, df, score_micro, rank)``.
    """
    from pyspark.sql import Window

    toks = _tokens(text_col)
    n_docs = docs.count()
    if n_docs == 0:
        return docs.select(
            F.col(id_col), F.lit("").alias("term"),
            F.lit(0).cast("long").alias("tf"),
            F.lit(0).cast("long").alias("df"),
            F.lit(0).cast("long").alias("score_micro"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf_micro = (
        F.round(
            F.log(
                F.lit(float(1 + n_docs)) / (F.lit(1) + F.col("df"))
            ) * F.lit(1e6),
            0,
        ).cast("long")
        + F.lit(1_000_000)
    )
    scored = tf.join(df_t, "term").withColumn(
        "score_micro", F.col("tf") * idf_micro
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "df", "score_micro",
                F.col("rank").cast("int").alias("rank"))
    )
