"""Iterative frontier expansion (BFS min-depth) over an edge table.

This is the crawl engine's round loop distilled to its relational core —
frontier anti-join dedup per round (SURVEY.md §2.5 P1 + §3.4) — phrased
over the driver-provided TPC-H-ish tables so the DuckDB oracle (a
recursive CTE) can verify it. One round = one join + anti-join; the seen
set is the accumulated union, localCheckpointed per round to keep plans
flat (same discipline as plans/crawl.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bfs_min_depth", "lineitem_edges", "crawl_bfs"]

N_NODES = 300
MAX_DEPTH = 3
SEEDS = (0, 1)


def lineitem_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic web graph from lineitem: edge
    (l_orderkey % N) → (l_partkey % N)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        (F.col("l_orderkey") % N_NODES).cast("long").alias("src"),
        (F.col("l_partkey") % N_NODES).cast("long").alias("dst"),
    ).distinct()


def bfs_min_depth(edges: DataFrame, seeds: list[int],
                  max_depth: int = MAX_DEPTH) -> DataFrame:
    """(node, depth) rows: minimum number of hops from the seed set,
    nodes within max_depth only. Anti-join dedup == first (minimal) depth
    wins, exactly the frontier-dedup semantics."""
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(int(s), 0) for s in seeds], "node long, depth int"
    ).localCheckpoint(eager=True)
    seen = frontier
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(seen.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen


def crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship entry query: BFS crawl-frontier expansion over the
    lineitem-derived web graph, returned as canonical URLs."""
    reach = bfs_min_depth(lineitem_edges(spark, sf_dir), list(SEEDS), MAX_DEPTH)
    return reach.select(
        F.concat(F.lit("http://graph.test/n/"), F.col("node").cast("string")).alias("url"),
        F.col("node").cast("long").alias("node"),
        F.col("depth").cast("int").alias("depth"),
    ).orderBy("node")


def bfs_oracle_sql() -> str:
    """Recursive-CTE oracle (DuckDB): UNION-dedup on (node, depth) rows
    bounds the working set; min(depth) afterwards = BFS depth."""
    seeds = ", ".join(f"({s}, 0)" for s in SEEDS)
    return f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT l_orderkey % {N_NODES} AS src, l_partkey % {N_NODES} AS dst
  FROM lineitem
),
walk(node, depth) AS (
  SELECT * FROM (VALUES {seeds}) AS s(node, depth)
  UNION
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < {MAX_DEPTH}
)
SELECT
  'http://graph.test/n/' || node AS url,
  CAST(node AS BIGINT) AS node,
  CAST(min(depth) AS INT) AS depth
FROM walk
GROUP BY node
ORDER BY node
"""
