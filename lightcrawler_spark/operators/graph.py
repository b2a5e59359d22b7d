"""Connected components over near-duplicate pair graphs.

Corpus-scale dedup needs more than candidate PAIRS: to keep one
canonical document per duplicate group, the pair graph (minhash-LSH /
simhash / n-gram Jaccard edges) must be collapsed into CLUSTERS. This is
the standard third stage of a web-scale dedup pipeline (the reference
crawler dedups exact URL/product keys only — vendor
PHPCrawl_083/libs/UrlCache/PHPCrawlerSQLiteURLCache.class.php:104-131 —
so this operator is part of the LLM-training-data extension, not a
reference port).

Algorithm: iterative min-label propagation
    label(u) ← min(label(u), min_{v ∈ N(u)} label(v))
run to fixpoint. Each iteration is one shuffle-bounded Spark job:
edges ⋈ labels (hash join on node id) + a groupBy-min, materialized with
``localCheckpoint`` so plans never accrete lineage across iterations.
Convergence is detected with zero extra jobs: labels only ever
decrease, so ``sum(label)`` is strictly decreasing until the fixpoint —
an ``Observation`` on the checkpoint action reports the sum for free.

Iterations needed = graph diameter. Near-dup clusters are short chains
(diameter ≤ ~4 in practice), so the loop is shallow; for adversarial
long-chain graphs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) converges in O(log²) rounds and can be swapped in behind the
same signature. At 10^10 edges, pre-bucket the symmetrized edge table by
``src`` so the per-iteration join co-locates without re-shuffling the
(static) edge side every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_cluster_assignments", "pagerank"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id
    reachable from ``node`` (undirected).

    ``edges`` may be directed / duplicated — it is symmetrized here and
    duplicate edges cannot affect a min-aggregate. ``nodes`` (optional,
    one ``node`` column or the first column) adds isolated vertices so
    singleton documents keep a cluster of their own.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    labels = sym.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        first = nodes.columns[0]
        labels = labels.unionByName(
            nodes.select(F.col(first).alias("node"))
        ).distinct()
    labels = labels.select(
        "node", F.col("node").alias("component")
    ).localCheckpoint(eager=True)

    # labels only decrease ⇒ sum(component) strictly decreases until the
    # fixpoint; decimal(38,0) so 10^10 nodes × 10^10 ids cannot overflow
    prev_sum = None
    for _ in range(max_iter):
        neighbor = sym.join(
            labels, sym["dst"] == labels["node"], "inner"
        ).select(F.col("src").alias("node"), "component")
        obs = Observation()
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .observe(
                obs,
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        row = obs.get
        cur = row["s"]
        if cur is None or (prev_sum is not None and cur == prev_sum):
            break  # empty graph, or fixpoint reached
        prev_sum = cur
    return labels


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over the link graph — the frontier-prioritization signal
    a web-scale crawl feeds back into P2 (priority assignment): the
    reference scores URLs by hand-written regex lists
    (UrlCache/PHPCrawlerURLCacheBase.class.php:98-110); a 100 TB crawl
    scores hosts/URLs by link analysis instead.

    Standard power iteration with teleport and dangling-mass
    redistribution:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/N)

    Scale shape per iteration: ONE shuffle-bounded job — edges ⋈ ranks
    (hash join on node id) + groupBy-sum, materialized with
    ``localCheckpoint`` so lineage stays flat; the dangling mass rides
    the checkpoint action as an ``Observation`` (no extra aggregate
    job). The edge table is checkpointed once and static — at 10^10
    edges, pre-bucket it by ``src`` so the per-iteration join co-locates
    without re-shuffling the static side. Parallel edges are honored
    (counted in out-degree, contribute per occurrence).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    verts = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        first = nodes.columns[0]
        verts = verts.unionByName(nodes.select(F.col(first).alias("node")))
    verts = verts.distinct()

    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = (
        verts.join(deg, verts["node"] == deg["src"], "left")
        .select("node", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))
    e_static = e.localCheckpoint(eager=True)

    teleport = (1.0 - damping) / n
    state = base.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        obs = Observation()
        state = state.observe(
            obs,
            F.sum(
                F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(F.lit(0.0))
            ).alias("dangling"),
        ).localCheckpoint(eager=True)
        dangling = obs.get["dangling"] or 0.0
        contrib = e_static.join(
            state, e_static["src"] == state["node"], "inner"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("out_deg")).alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_sum"))
        state = base.join(summed, "node", "left").select(
            "node",
            "out_deg",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
    return state.select("node", "rank")


def dedup_cluster_assignments(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → per-document cluster assignment.

    Output: ``(doc_id, cluster, is_canonical)`` — cluster is the min
    doc id of the duplicate group (singletons cluster with themselves),
    ``is_canonical`` marks the one row per cluster a dedup pass keeps.
    """
    cc = connected_components(
        pairs, nodes=docs.select(id_col), src_col=pair_a, dst_col=pair_b
    )
    return cc.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
