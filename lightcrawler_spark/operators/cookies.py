"""Cookie store/lookup (SURVEY.md §2.5 P12).

Reference semantics (/root/reference/vendor/PHPCrawl_083/libs/CookieCache/
PHPCrawlerSQLiteCookieCache.class.php):

- store: `INSERT OR REPLACE` keyed on md5(domain_path_name) — last write
  per (domain, path, name) wins (:27-46).
- lookup for a target URL (:74-110): candidate rows by
  `source_domain == url.domain`, then (a) cookie domain tail-matches the
  target host (exact or suffix), (b) cookie path prefix-matches the
  target path, (c) per cookie NAME only one survives (the reference's
  `$return_cookies[$name] = ...` keeps the LAST matching row in scan
  order; scan order is the store's insertion order).

Spark rebuild: the cookie jar is a small-to-medium dimension table —
broadcast it to the fetch work-list and resolve matches relationally
(no Python). Window on (request, cookie name) ordered by store sequence
desc reproduces the last-wins rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["upsert_cookies", "cookies_for_requests", "attach_cookie_headers"]


def upsert_cookies(jar: DataFrame | None, new_cookies: DataFrame) -> DataFrame:
    """INSERT OR REPLACE on (domain, path, name): new rows shadow old.
    Both inputs carry `seq` (monotone store order)."""
    if jar is None:
        combined = new_cookies
    else:
        combined = jar.unionByName(new_cookies)
    w = Window.partitionBy("domain", "path", "name").orderBy(F.col("seq").desc())
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cookies_for_requests(requests: DataFrame, jar: DataFrame,
                         url_col: str = "url") -> DataFrame:
    """P12 lookup, vectorized over a whole fetch work-list.

    `requests` needs (url, domain, host, path) columns (the splitURL
    pieces); returns (url, name, value) — one row per cookie to attach.
    The jar is broadcast: cookie jars are tiny next to the work-list.
    """
    j = jar.select(
        F.col("source_domain").alias("_c_source_domain"),
        F.col("domain").alias("_c_domain"),
        F.col("path").alias("_c_path"),
        F.col("name").alias("_c_name"),
        F.col("value").alias("_c_value"),
        F.col("seq").alias("_c_seq"),
    )
    cand = requests.join(
        F.broadcast(j),
        requests["domain"] == F.col("_c_source_domain"),
        "inner",
    )
    # (a) tail-match: exact host or host endswith cookie-domain
    cand = cand.filter(
        (F.col("host") == F.col("_c_domain"))
        | F.col("host").endswith(F.col("_c_domain"))
    )
    # (b) path prefix
    cand = cand.filter(F.col("path").startswith(F.col("_c_path")))
    # (c) last-stored-wins per (request url, cookie name)
    w = Window.partitionBy(F.col(url_col), F.col("_c_name")).orderBy(
        F.col("_c_seq").desc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(url_col).alias("url"),
            F.col("_c_name").alias("name"),
            F.col("_c_value").alias("value"),
            F.col("_c_seq").alias("seq"),
        )
    )


def attach_cookie_headers(work: DataFrame, jar: DataFrame,
                          url_col: str = "url") -> DataFrame:
    """P12 end-to-end: resolve each work-list URL's cookies and fold them
    into ONE `Cookie:` header string (store order, `name=value; ...`) —
    the column HttpFetcher sends (PHPCrawler.class.php:718-719 →
    PHPCrawlerHTTPRequest's cookie header build)."""
    from .admission import domain_expr, host_expr

    u = F.col(url_col)
    path = F.regexp_extract(u, r"^[a-zA-Z0-9+.-]+://[^/?#]*(/[^?#]*)?", 1)
    reqs = work.select(
        u.alias(url_col),
        domain_expr(u).alias("domain"),
        host_expr(u).alias("host"),
        F.when(path == "", "/").otherwise(path).alias("path"),
    )
    rows = cookies_for_requests(reqs, jar, url_col)
    headers = rows.groupBy("url").agg(
        F.concat_ws(
            "; ",
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("seq"),
                        F.concat(F.col("name"), F.lit("="), F.col("value")).alias("nv"),
                    )
                )
            ).getField("nv"),
        ).alias("cookie_header")
    )
    return work.join(headers, work[url_col] == headers["url"], "left").drop(
        headers["url"]
    )
