"""Distributed Lloyd's k-means over embedding columns — the trained
coarse quantizer that ``similarity.ivf_topk`` accepts (its ``centroids``
parameter) but nothing previously produced, and the paper-faithful
cluster stage for SemDeDup-style curation (Abbas et al. 2023 cluster
with k-means, then dedup within clusters;
``similarity.semantic_dedup_assignments`` uses SRP buckets as its
candidate blocks — this module supplies the k-means-block variant).

The reference crawler has no clustering; this belongs to the
training-data-pipeline axis of the brief (embedding similarity /
semantic dedup at corpus scale).

Determinism contract (the reason this is hash-checkable at all):
embeddings are quantized ONCE to int64 micro-units
(``round(x * 1e6)``); every distance is an exact int64
sum-of-squared-differences; centroid updates are exact int64 component
sums floor-divided by cluster counts; argmin ties break on the lowest
cid. No float ever accumulates across rows, so the result is
bit-identical at any partitioning or parallelism — and the DuckDB
oracle (unrolled per-iteration CTEs, independent relational algebra)
hash-matches. Micro-unit headroom: |x| ≤ ~9.2e3 fits the int64
distance sum at dim ≤ 10^4; unit-norm embeddings are far inside it.

Scale shape (10^9-10^10 vectors, coarse k):
- the ASSIGN stage is a pure projection: the k centroids are collected
  to the driver (k rows — the same O(k)-per-iteration driver hop
  MLlib's KMeans makes) and inlined as literal arrays, so scoring is
  whole-stage-codegen'd k×dim integer MACs per row — zero join, zero
  shuffle, no Python;
- the UPDATE stage is ONE map-side-combined shuffle per iteration:
  ``groupBy(cid).agg(count, sum(element_at(vec, i)) …)`` — every
  partition pre-reduces to ≤ k×(dim+1) int64s before the exchange
  (never a posexplode of the corpus: that would shuffle dim× the
  input);
- the per-iteration driver hop severs lineage, so each iteration is
  exactly one job over the quantized scan and nothing recomputes.
Literal-plan pressure bounds the inlined path at k×dim of a few
hundred thousand constants; coarse quantizers (k ≤ ~1024) sit well
inside it. Beyond that, use :func:`kmeans_assignments_bcast`: the
centroids travel as one broadcast data row instead of plan literals —
same exact arithmetic, same zero-shuffle projection shape, bounded by
executor memory rather than the constant pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MICRO",
    "quantize_micro_expr",
    "kmeans_centroids",
    "kmeans_assignments",
    "kmeans_assignments_bcast",
    "kmeans_block_pairs",
    "semantic_dedup_kmeans",
]

MICRO = 1_000_000


def quantize_micro_expr(col):
    """float array → exact int64 micro-units: round(x * 1e6) half away
    from zero, the same promotion+rounding DuckDB's
    ``CAST(round(x * 1000000) AS BIGINT)`` performs (float32 → float64
    is exact in both engines)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(MICRO))).cast("long")
    )


def _nearest_expr(qv_col, cents: list[tuple[int, list[int]]]):
    """(cid, dist) of the nearest centroid as ONE codegen'd expression:
    k inlined literal arrays, exact int64 squared-euclidean folds,
    lexicographic array_min over (dist, cid) structs — ties go to the
    lowest cid, matching the oracle's ``ORDER BY dist, cid`` rank."""
    structs = []
    for cid, cv in cents:
        lit_arr = F.array(*[F.lit(int(v)).cast("long") for v in cv])
        dist = F.aggregate(
            F.zip_with(qv_col, lit_arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(dist.alias("dist"), F.lit(int(cid)).cast("int").alias("cid"))
        )
    best = F.array_min(F.array(*structs))
    return best["cid"], best["dist"]


def _id_type(df: DataFrame, id_col: str) -> str:
    return df.schema[id_col].dataType.simpleString()


def _collect_centroids(centroids: DataFrame) -> list[tuple[int, list[int]]]:
    rows = centroids.select("cid", "centroid").collect()  # k rows — O(k) driver
    return sorted((int(r["cid"]), [int(v) for v in r["centroid"]]) for r in rows)


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train k centroids with ``iters`` Lloyd iterations. Deterministic
    throughout: init = the k rows with the smallest ids (cid 0..k-1 in
    id order — the convention any two engines can reproduce, unlike a
    random or kmeans|| seed), exact int64 micro-unit arithmetic, empty
    clusters keep their previous centroid. Determinism requires
    ``id_col`` values to be UNIQUE (duplicate smallest ids would make
    the init row choice a tie) — the same key-uniqueness precondition
    warc_records documents for its order column.

    Returns ``(cid int, centroid array<bigint>)`` in micro-units —
    feed to :func:`kmeans_assignments`, or dequantize
    (``transform(centroid, c -> c / 1e6)``) for ``ivf_topk``.
    """
    spark = df.sparkSession
    q = df.select(
        F.col(id_col).alias("_kid"),
        quantize_micro_expr(F.col(vec_col)).alias("_kq"),
    )
    # Deliberately NOT checkpointing q between iterations: an r5 A/B
    # (sf0.1, iters=3, best-of-3 warm) measured 5.9 s uncached vs
    # 5.5-5.7 s pinned — the leg is bound by iters+1 SERIAL job
    # latencies, not scan cost, so the pin buys noise here while at
    # 10^10-vector scale it would park the whole quantized corpus in
    # the block manager (production trains on a sample; the scan is
    # the cheap part of an iteration, the groupBy shuffle ships only
    # k×(dim+1) pre-combined int64s per partition either way).
    init_rows = q.orderBy("_kid").limit(k).collect()
    cents = [(i, [int(v) for v in r["_kq"]]) for i, r in enumerate(init_rows)]
    if not cents:
        return spark.createDataFrame([], "cid int, centroid array<bigint>")
    dim = len(cents[0][1])
    for _ in range(int(iters)):
        cid_expr, _ = _nearest_expr(F.col("_kq"), cents)
        agg = (
            q.select(cid_expr.alias("cid"), "_kq")
            .groupBy("cid")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("_kq", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
        )
        got = {int(r["cid"]): r for r in agg.collect()}  # ≤ k rows
        cents = [
            (
                cid,
                old
                if cid not in got
                else [int(got[cid][f"s{i}"]) // int(got[cid]["n"]) for i in range(dim)],
            )
            for cid, old in cents
        ]
    return spark.createDataFrame(
        [(cid, cv) for cid, cv in cents], "cid int, centroid array<bigint>"
    )


def kmeans_assignments(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest trained centroid. Pure
    projection (centroids inlined as literals — zero join, zero
    shuffle); returns ``(id_col, cid, dist)`` with dist the exact int64
    squared euclidean distance in micro-units².

    Preconditions: ``centroids`` must be non-empty, and input vectors
    must be non-null with the centroid dimensionality (a NULL vector
    yields a NULL distance on every centroid, and which cid the
    struct-min then emits is engine-defined — filter nulls upstream,
    as every registry caller does)."""
    cents = _collect_centroids(centroids)
    if not cents:
        raise ValueError("kmeans_assignments requires >=1 centroid")
    q = df.select(
        F.col(id_col), quantize_micro_expr(F.col(vec_col)).alias("_kq")
    )
    cid_expr, dist_expr = _nearest_expr(F.col("_kq"), cents)
    return q.select(
        F.col(id_col), cid_expr.alias("cid"), dist_expr.alias("dist")
    )


def kmeans_assignments_bcast(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Large-k assignment: same output contract as
    :func:`kmeans_assignments`, but the centroids travel as DATA — one
    broadcast row carrying ``array<struct<cid, centroid>>`` — instead
    of inlined plan literals, so k×dim is bounded by executor memory,
    not by codegen constant-pool pressure (the inlined path documents
    its ceiling at k ≤ ~1024; a 10^10-vector IVF wants k ≈ 4096–65536).

    Shape: a 1-row broadcast nested-loop join (the documented bounded
    crossing — the small side is exactly one row) followed by a pure
    projection: ``array_min(transform(cents, c → (dist, cid)))`` — all
    JVM higher-order expressions, zero shuffle, no Python. Results are
    bit-identical to the inlined path (same exact int64 arithmetic,
    same lowest-cid tie-break; pinned by tests/test_clustering.py)."""
    cents_row = centroids.agg(
        F.collect_list(
            F.struct(F.col("cid").cast("int").alias("cid"),
                     F.col("centroid").alias("centroid"))
        ).alias("_cents")
    )
    q = df.select(
        F.col(id_col), quantize_micro_expr(F.col(vec_col)).alias("_kq")
    ).crossJoin(F.broadcast(cents_row))
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("_kq"), c["centroid"],
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return q.select(
        F.col(id_col), best["cid"].alias("cid"), best["dist"].alias("dist")
    )


def kmeans_block_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate near-dup pairs under k-means blocking: train, assign,
    self-equi-join on cid (cost ∝ Σ cluster_size², never n²), keep
    rounded exact cosine ≥ ``threshold``. Returns (id_a, id_b, sim).
    ``threshold=-1.0`` keeps every same-block pair — the pure blocking
    output a recall evaluator measures against exact truth."""
    cents = kmeans_centroids(
        embeddings, k=k, iters=iters, vec_col=vec_col, id_col=id_col
    )
    cent_list = _collect_centroids(cents)
    if not cent_list:  # empty corpus → no blocks → no pairs
        return embeddings.sparkSession.createDataFrame(
            [], f"id_a {_id_type(embeddings, id_col)},"
                f" id_b {_id_type(embeddings, id_col)}, sim double"
        )
    from .similarity import cosine_expr

    q = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        quantize_micro_expr(F.col(vec_col)).alias("_kq"),
    )
    cid_expr, _ = _nearest_expr(F.col("_kq"), cent_list)
    tagged = q.select(F.col(id_col), F.col("_v"), cid_expr.alias("cid"))
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("v_a"), "cid"
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("v_b"), "cid"
    )
    return (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("sim") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup, paper-faithful blocking (Abbas et al. 2023): k-means
    the corpus, then near-dup ONLY within a cluster — candidate pairs
    come from a cid equi-join (cost ∝ Σ cluster_size², never n²), exact
    cosine ≥ ``threshold`` keeps a pair, min-label connected components
    collapse pairs into groups, the min-id row per group is canonical.

    Same output contract as ``similarity.semantic_dedup_assignments``
    (``(id, cluster, is_canonical)``) so callers can swap blocking
    strategies; differences in RECALL are exactly the blocking
    difference (SRP buckets split some true pairs; k-means blocks split
    others — ann_recall-style evals quantify either against the exact
    truth).

    Scale: assignment is the zero-shuffle projection above; the pair
    join shuffles on cid (cluster-skew bounded by k and the cosine
    filter); CC is one shuffle-bounded job per iteration over near-dup
    pairs only.
    """
    from .graph import dedup_cluster_assignments

    pairs = kmeans_block_pairs(
        embeddings, k=k, iters=iters, threshold=threshold,
        vec_col=vec_col, id_col=id_col,
    ).select("id_a", "id_b")
    return dedup_cluster_assignments(
        pairs, embeddings.select(id_col), id_col=id_col
    )
