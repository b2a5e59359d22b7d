"""Product-sink semantics (SURVEY.md §2.1 S9, §2.5 P7, §2.3 C11).

S9 — the reference's MySQL product insert skips a record when ANY of the
four identity keys already exists (url_md5, doc_ori_no, doc_id, simhash;
/root/reference/worker/DaoXlegalLawContentRecord.class.php:96-121), and
clamps oversized fields before writing (:126-153, varchar widths from
sql/db.sql:26-44). Spark rebuild: one left_anti per non-null key against
the existing table — each is a key-only shuffle; at scale the existing
side is bucketed by url_md5 so the common-key join co-locates.

P7 — selective re-queue of processed list pages: re-open 1/3 of them,
capped (worker/SpiderCsrcGov.class.php:52-111). The reference picks by
`id % 3 == 0`; we keep that exact deterministic rule.

C11 — Levenshtein title similarity (worker/ExtractContent.class.php:
354-395) is Spark's built-in `levenshtein` (same DP, JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["clamp_product_fields", "dedup_products_against",
           "requeue_list_pages", "title_similarity",
           "route_by_handlers", "extraction_gate"]

# sql/db.sql:26-44 column widths the reference clamps to
_CLAMPS = {
    "title": 512, "doc_ori_no": 128, "author": 128, "tags": 256,
    "index_ori_no": 128,
}


def clamp_product_fields(df: DataFrame,
                         clamps: dict[str, int] | None = None) -> DataFrame:
    clamps = clamps or _CLAMPS
    for c, n in clamps.items():
        if c in df.columns:
            df = df.withColumn(c, F.substring(F.col(c), 1, n))
    return df


def dedup_products_against(new: DataFrame, existing: DataFrame,
                           keys: tuple[str, ...] = ("url_md5", "doc_ori_no",
                                                    "doc_id", "simhash"),
                           ) -> DataFrame:
    """S9: drop new rows whose ANY key matches an existing row (null/empty
    keys never match, like the reference's empty-checks before each
    SELECT)."""
    out = new
    for k in keys:
        if k not in new.columns or k not in existing.columns:
            continue
        seen = existing.select(F.col(k).alias(k)).filter(
            F.col(k).isNotNull() & (F.col(k).cast("string") != "")
        ).distinct()
        matchable = out.filter(
            F.col(k).isNotNull() & (F.col(k).cast("string") != "")
        ).join(seen, k, "left_anti")
        unmatchable = out.filter(
            F.col(k).isNull() | (F.col(k).cast("string") == "")
        )
        out = matchable.unionByName(unmatchable)
    return out


def requeue_list_pages(frontier: DataFrame, max_pages: int = 100,
                       route_col: str = "route",
                       id_col: str = "insert_seq") -> DataFrame:
    """P7: processed list pages with `id % 3 == 0`, oldest first, capped
    at max_pages, re-marked pending."""
    return (
        frontier.filter(F.col(route_col) == "list")
        .filter(F.col(id_col) % 3 == 0)
        .orderBy(F.col(id_col).asc())
        .limit(max_pages)
        .withColumn("state", F.lit("pending"))
    )


def route_by_handlers(df: DataFrame, handlers: list[tuple[str, str]],
                      url_col: str = "url",
                      default: str = "list") -> DataFrame:
    """F12: handler-dispatch projection — the FIRST matching handler
    regex (registration order) routes the row; unmatched rows fall back
    to the list handler (/root/reference/worker/SpiderFrame.class.php:
    155-178; example map worker/SpiderCsrcGov.class.php:33-41).
    One codegen'd CASE WHEN chain, no UDF."""
    from ..config import php_regex_to_std

    expr = F.lit(default)
    for pattern, name in reversed(handlers):
        expr = F.when(
            F.col(url_col).rlike(php_regex_to_std(pattern)), F.lit(name)
        ).otherwise(expr)
    return df.withColumn("route", expr)


def extraction_gate(df: DataFrame, status_col: str = "status",
                    bytes_col: str = "bytes_received",
                    min_bytes: int = 100) -> DataFrame:
    """F13: content extraction runs only for `status == 200 &&
    bytes_received > 100` (/root/reference/worker/SpiderFrame.class.php:
    136-141) — the gate between the fetch results and the
    handler/extract stage."""
    return df.filter(
        (F.col(status_col) == 200) & (F.col(bytes_col) > F.lit(min_bytes))
    )


def title_similarity(a: Column, b: Column) -> Column:
    """C11: normalized Levenshtein similarity in [0,1] — the reference
    compares edit distance against title length to drop near-duplicate
    re-crawls."""
    dist = F.levenshtein(a, b).cast("double")
    denom = F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double")
    return F.round(F.lit(1.0) - dist / denom, 6)
