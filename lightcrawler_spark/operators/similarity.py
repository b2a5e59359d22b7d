"""Embedding similarity search over the ``embeddings`` table
(vec_id, embedding array<float>, label).

- brute-force cosine top-k: the exactness baseline. The dot product is a
  JVM ``aggregate(zip_with(...))`` over the array columns — no Python,
  whole-stage codegen; top-k via window rank. Cross join is
  query-side-broadcast: fine for a bounded query set, the usual shape
  for "score K probes against the corpus".
- LSH-bucketed ANN (sign random projection): hyperplane weights are
  pseudo-random but DERIVED FROM md5 — both Spark and the ANSI-SQL
  oracle compute the identical weight w(b, i) = ascii(substr(md5(b‖i),1,1)) - 79,
  so bucket assignment is verifiable bit-for-bit. Candidates share all
  `bits` bucket bits; exact cosine re-ranks candidates only. At 100 TB
  scale the bucket join replaces the full cross product (cost ∝ bucket
  occupancy, tunable via n_bits), and the corpus side is bucketed once
  and reusable.

Float determinism: cosine is computed in float64 with a fixed
left-to-right summation (array order), rounded to 6 decimals so the
DuckDB oracle (which may re-order its own sums) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_expr", "brute_force_topk", "srp_bucket_expr", "lsh_topk",
           "ivf_topk", "cosine_near_dup_pairs", "semantic_dedup_assignments",
           "ann_recall", "hard_negatives"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k per query vector. `queries` is small → broadcast;
    the corpus is scanned once, scored JVM-side, ranked per query."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def srp_weight(b: int, i: int) -> int:
    """w(b, i) = ascii(first hex char of md5('b_i')) - 79 — a
    deterministic integer in [-31, 23] (hex chars are 0-9/a-f → ASCII
    48..57, 97..102) acting as a fixed pseudo-random hyperplane weight,
    identically computable in any SQL dialect with md5/ascii (the DuckDB
    oracles recompute it)."""
    import hashlib

    return ord(hashlib.md5(f"{b}_{i}".encode()).hexdigest()[0]) - 79


def srp_bucket_expr(vec_col, n_bits: int = 4, dim: int | None = None,
                    max_dim: int = 256):
    """Sign-random-projection bucket id as a string of n_bits sign bits:
    bit_b = (Σ_i vec[i] * w(b, i)) >= 0.

    The hyperplane weights depend only on (bit, position), so they are
    precomputed DRIVER-SIDE and embedded as literal arrays — the
    executor-side plan is one zip_with + aggregate per bit over
    constants, with NO per-row md5 evaluation (at dim=64, n_bits=4 the
    md5-in-lambda formulation evaluated 256 md5s per row). Vectors
    longer than max_dim fall back to... nothing: raise, bump max_dim.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if dim is not None:
        max_dim = dim

    def bit(b: int):
        weights = F.array(
            *[F.lit(float(srp_weight(b, i))) for i in range(1, max_dim + 1)]
        )
        prods = F.zip_with(
            v,
            F.slice(weights, 1, F.size(v)),
            lambda x, w_: x.cast("double") * w_,
        )
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(b) for b in range(n_bits)])


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             n_bits: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """ANN: candidates share the full SRP bucket; exact cosine re-rank
    within bucket. Recall < 1 by design (verified against brute force in
    tests with a recall floor, and against the SQL oracle exactly)."""
    bucket = srp_bucket_expr(vec_col, n_bits)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket.alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            bucket.alias("bucket"),
        )
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             n_centroids: int = 8, n_probe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path next to SRP-LSH.

    Coarse quantizer: ``n_centroids`` centroid rows (default: a
    deterministic sample — the first rows by id; any trained centroid
    table can be passed instead). Every corpus vector is assigned to its
    argmax-cosine centroid list (broadcast ×K scoring, then a per-vector
    rank — the standard linear assign pass); each query probes its
    ``n_probe`` nearest lists; exact cosine re-ranks candidates inside
    the probed lists only.

    Wholly relational — broadcast joins + per-id windows + one bucket
    equi-join, no Python, no crossJoin of corpus×corpus — so at 10^9
    vectors the candidate cost is corpus/K × n_probe per query, and the
    same algebra runs verbatim in the DuckDB oracle (recall < 1 by
    design, like lsh_topk, but the *result* is deterministic and
    hash-checked)."""
    if centroids is None:
        centroids = embeddings.orderBy(id_col).limit(n_centroids)
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("c_cent")
        )
    )

    def nearest(df, out_id, keep_vec, rank_limit):
        scored = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias(keep_vec)
        ).crossJoin(cents).withColumn(
            "csim", F.round(cosine_expr(F.col(keep_vec), F.col("c_cent")), 6)
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("csim").desc(), F.col("cid").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= rank_limit)
            .select(out_id, keep_vec, "cid")
        )

    lists = nearest(embeddings, "neighbor_id", "c_vec", 1)
    probes = nearest(queries, "query_id", "q_vec", n_probe)
    scored = (
        probes.join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35,
                          block_bits: int | None = None,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          allow_all_pairs: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-family member for
    vector payloads): all (id_a < id_b) pairs with rounded cosine >=
    threshold.

    block_bits=None → exact all-pairs self-join: the verifiable baseline,
    O(n²) scores but JVM-only (zip_with/aggregate inside codegen) — right
    for a candidate set that fits one shuffle (e.g. per-bucket refinement
    or small corpora). At 10^9-vector scale pass block_bits=k: candidates
    must share the k-bit SRP bucket (srp_bucket_expr), turning the join
    into an equi-join on bucket — recall < 1 by design, like the LSH
    top-k path. Unblocked calls are guarded above
    ALL_PAIRS_GUARD_ROWS input rows (no silent O(n²))."""
    if not block_bits:
        from .textdedup import guard_all_pairs

        guard_all_pairs(embeddings, "cosine_near_dup_pairs",
                        allow=allow_all_pairs)
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        *([srp_bucket_expr(vec_col, block_bits).alias("bucket")]
          if block_bits else []),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        *([srp_bucket_expr(vec_col, block_bits).alias("bucket")]
          if block_bits else []),
    )
    if block_bits:
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "sim", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6)
        )
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup_assignments(embeddings: DataFrame, threshold: float = 0.35,
                               block_bits: int | None = 4,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               allow_all_pairs: bool = False) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): collapse
    embedding-cosine near-duplicate PAIRS into CLUSTERS and flag the one
    canonical row per cluster — the vector-payload counterpart of
    ``textdedup.minhash`` → ``graph.dedup_cluster_assignments``.

    Stage shapes at 10^9 vectors: SRP-bucket equi-join for candidate
    pairs (never all-pairs — ``cosine_near_dup_pairs(block_bits=k)``),
    then one shuffle-bounded job per connected-components iteration
    (near-dup clusters have tiny diameters). Output:
    ``(vec_id, cluster, is_canonical)`` with cluster = min reachable id.
    """
    from .graph import dedup_cluster_assignments

    pairs = cosine_near_dup_pairs(
        embeddings, threshold=threshold, block_bits=block_bits,
        vec_col=vec_col, id_col=id_col, allow_all_pairs=allow_all_pairs,
    )
    return dedup_cluster_assignments(
        pairs, embeddings.select(id_col), id_col=id_col
    )


def ann_recall(exact: DataFrame, approx: DataFrame,
               query_col: str = "query_id",
               neighbor_col: str = "neighbor_id") -> DataFrame:
    """Recall of an ANN result against the exact top-k — the evaluation
    loop that justifies shipping LSH/IVF instead of brute force at
    corpus scale.

    Both inputs are per-query top-k tables (e.g. ``brute_force_topk``
    vs ``lsh_topk``/``ivf_topk``). Returns per query:
    ``(query_id, n_exact, n_hits, recall)`` with
    recall = |approx ∩ exact| / |exact| (|exact| may be < k on small
    corpora). Scale: inputs are k·Q rows — everything here is a
    broadcast-sized join regardless of corpus size."""
    ex = exact.select(
        F.col(query_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
    )
    ap = approx.select(
        F.col(query_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
        F.lit(1).alias("_hit"),
    )
    return (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        )
        .select(
            "query_id", "n_exact", "n_hits",
            F.round(F.col("n_hits") / F.col("n_exact"), 6).alias("recall"),
        )
    )


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization of an embedding column: scale =
    127/max|x| per vector, code_i = round(x_i * scale). At 100 TB an
    fp32 embedding store is 4x the memory/shuffle bytes of int8 codes
    with ~0.4% cosine error -- this is the standard ANN-store compression
    (IVF/SQ8); the IVF bucket join (ivf_assign/ivf_topk) runs unchanged
    over codes with one extra per-pair rescale.

    Determinism contract: every step is a single IEEE op on exactly
    reproducible inputs (float32 -> double casts are exact; one multiply;
    round half-away-from-zero matches across engines), so codes are
    bit-stable -- asserted by the DuckDB oracle recomputing them.
    Row-local expressions only: no shuffle, no Python.

    Adds `q_scale` (double), `q_codes` (array<int>), `q_max_abs`.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(xd, F.abs))
    scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0))
    return (
        df.withColumn("q_max_abs", maxabs)
        .withColumn("q_scale", scale)
        .withColumn(
            "q_codes",
            F.transform(xd, lambda x: F.round(x * F.col("q_scale")).cast("int")),
        )
    )


def quantized_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Approximate dot-product top-k over SQ8 codes
    (quantize_embeddings): score = int_dot(q_codes, c_codes) /
    (scale_q * scale_c). The inner loop is pure int64
    multiply-accumulate -- the form a 100 TB store actually scans (4x
    less memory bandwidth than fp32; SIMD-able int8 dot on real
    hardware) -- with ONE float rescale per candidate pair at the end.

    Same plan shape as brute_force_topk (broadcast query side, one
    corpus scan, per-query rank window); the integer dot is exact and
    the rescale is two IEEE ops, so scores are bit-reproducible.
    """
    qz = quantize_embeddings(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("embedding"))
    ).select("query_id", F.col("q_codes").alias("qc"),
             F.col("q_scale").alias("qs"))
    cz = quantize_embeddings(
        embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("embedding"))
    ).select("neighbor_id", F.col("q_codes").alias("cc"),
             F.col("q_scale").alias("cs"))
    int_dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("cc"),
                   lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(qz).crossJoin(cz)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("int_dot", int_dot)
        .withColumn(
            "sim_q",
            F.round(
                F.col("int_dot").cast("double")
                / (F.col("qs") * F.col("cs")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "int_dot", "sim_q", "rank")
    )


def hard_negatives(
    embeddings: DataFrame,
    k: int = 3,
    min_sim: float = 0.0,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the ``k``
    most-similar items with a DIFFERENT label — the near-misses a
    CLIP-style training batch needs (in-batch random negatives are
    mostly easy; retrieval-mined negatives with high cosine but a
    different class carry the gradient signal). An image+caption
    pipeline runs this after dedup: ``label`` is the dup-cluster /
    concept / source-class id, so same-label pairs (potential
    positives) are never emitted as negatives.

    ``min_sim`` floors the band (below it negatives are easy and
    worthless); pairs at or above it rank by (sim desc, neighbor id
    asc) — fully deterministic.

    NULL labels never pair (``label <> label`` is NULL-falsy on both
    sides): an unlabeled row yields no anchors and no negatives, the
    conservative default for unclustered strays — assign labels (e.g.
    dedup cluster ids) before mining if those rows must participate.

    Scale shape: candidates come from the SAME SRP-LSH bucket equi-join
    as ``lsh_topk`` — never all-pairs; recall is the standard LSH trade
    (a hard negative in another bucket is missed; ``ann_recall``
    measures it). The per-anchor rank window partitions on the ANCHOR
    id — maximal cardinality, bounded per-partition rows (≤ bucket
    size), so no mega-key collapse. One bucket shuffle + one window,
    both skew-safe by construction.
    """
    bucket = srp_bucket_expr(vec_col, n_bits)
    a = embeddings.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        F.col(label_col).alias("a_label"),
        bucket.alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("c_label"),
        bucket.alias("bucket"),
    )
    scored = (
        a.join(c, "bucket")
        .filter(F.col("a_label") != F.col("c_label"))
        .withColumn(
            "sim", F.round(cosine_expr(F.col("a_vec"), F.col("c_vec")), 6)
        )
        .filter(F.col("sim") >= F.lit(min_sim))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neighbor_id", "sim", "rank")
    )
