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

__all__ = [
    "upsert_cookies",
    "cookies_for_requests",
    "attach_cookie_headers",
    "harvest_set_cookies",
]


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


def harvest_set_cookies(results: DataFrame, round_no: int,
                        url_col: str = "url",
                        rank_col: str = "fetch_rank") -> DataFrame:
    """P12 harvest-back: ``Set-Cookie`` response headers → jar rows.

    The reference stores response cookies on EVERY pop
    (/root/reference/vendor/PHPCrawl_083/libs/PHPCrawler.class.php:830
    ``addCookies``), one descriptor per header line, parsed by
    PHPCrawlerCookieDescriptor::getFromHeaderLine
    (PHPCrawlerCookieDescriptor.class.php:128-158, harvested from the
    raw header by Utils/PHPCrawlerUtils.class.php:420-435):

    - first ``;``-part: ``([^=]*)=(.*)`` → name/value, both trimmed;
    - ``path=`` / ``domain=`` attributes, case-insensitive, double
      quotes stripped (``expires`` is parsed by the reference but never
      consulted at lookup time — SQLiteCookieCache:74-110 ignores
      expire_timestamp — so it is not persisted here);
    - explicit domain gains a leading ``.`` (RFC tail-match form);
      missing domain → the source host WITHOUT the dot
      (PHPCrawlerCookieDescriptor.class.php:100-117);
    - missing path → the source URL's directory path.

    All parsing is JVM expressions over the exploded ``set_cookies``
    array — no Python. ``seq`` bit-packs (round, fetch_rank, header
    position), so store order is deterministic, monotone across rounds,
    and resume-safe — exactly what the jar's last-wins upsert keys on.
    """
    from .admission import domain_expr, host_expr

    u = F.col(url_col)
    full_path = F.regexp_extract(u, r"^[a-zA-Z0-9+.-]+://[^/?#]*(/[^?#]*)?", 1)
    src_dir = F.regexp_extract(full_path, r"^(.*/)", 1)
    src_dir = F.when(src_dir == "", "/").otherwise(src_dir)

    line = F.col("_sc_line")
    first_part = F.substring_index(line, ";", 1)
    name = F.trim(F.regexp_extract(first_part, r"^([^=]*)=", 1))
    value = F.trim(F.regexp_extract(first_part, r"^[^=]*=(.*)$", 1))

    def attr(key: str):
        raw = F.regexp_extract(line, rf"(?i);\s*{key}\s*=([^;]*)", 1)
        return F.trim(F.regexp_replace(raw, '"', ""))

    path_attr = attr("path")
    dom_attr = attr("domain")
    domain = F.when(dom_attr == "", host_expr(u)).otherwise(
        F.when(dom_attr.startswith("."), dom_attr).otherwise(
            F.concat(F.lit("."), dom_attr)
        )
    )
    # seq bit-packing mirrors the frontier's insert_seq contract
    # (plans/crawl.py): 20 bits header position, 20 bits fetch rank
    seq = (
        F.lit((round_no + 1) << 40).cast("long")
        + F.col(rank_col).cast("long") * F.lit(1 << 20)
        + F.col("_sc_pos").cast("long")
    )
    return (
        results.select(
            u.alias(url_col),
            F.col(rank_col),
            F.posexplode("set_cookies").alias("_sc_pos", "_sc_line"),
        )
        .select(
            seq.alias("seq"),
            domain_expr(u).alias("source_domain"),
            domain.alias("domain"),
            F.when(path_attr == "", src_dir).otherwise(path_attr).alias("path"),
            name.alias("name"),
            value.alias("value"),
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
