"""Crawl snapshot diffing: what changed between two crawls.

The reference's recrawl story is a fixed-fraction re-queue of list
pages (worker/SpiderCsrcGov.class.php:52-111, P7) — it never LEARNS
what changed. A web-scale incremental crawl compares the content-hash
columns of two round snapshots to classify every URL as
added / removed / changed / unchanged; the 'changed' rate per host is
exactly the change-frequency signal the recrawl scheduler
(operators/scheduler.py:recrawl_schedule) consumes, and
'removed' drives tombstoning in the product table (S9).

Scale shape: ONE full-outer equi-join on the URL key (AQE can
skew-split it), verdict is a codegen'd CASE — no window, no Python.
At 10^10 URLs both sides bucket by the same key, so with bucketed
storage the join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    hash_col: str = "content_md5",
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per key in either snapshot:
    ``(key, old_hash, new_hash, change)`` with change ∈
    {'added', 'removed', 'changed', 'unchanged'}.
    """
    o = old.select(F.col(key_col), F.col(hash_col).alias("old_hash"))
    n = new.select(F.col(key_col), F.col(hash_col).alias("new_hash"))
    j = o.join(n, key_col, "full_outer")
    return j.withColumn(
        "change",
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged"),
    )
