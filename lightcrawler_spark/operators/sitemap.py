"""Sitemap ingestion: sitemap.xml / sitemap-index parsing into frontier
seed rows (sitemaps.org protocol).

The reference discovers URLs only by scraping anchor tags
(vendor/PHPCrawl_083/libs/PHPCrawlerLinkFinder.class.php:140-239) and by
hand-written pagination synthesis (worker/SpiderCsrcGov.class.php:117-199);
it never reads /sitemap.xml. A web-scale crawl treats sitemaps as the
cheapest high-precision frontier source — one fetch yields up to 50k
canonical URLs with freshness (`lastmod`) and site-declared `priority`,
which feed straight into P2 (priority assignment) and the
change-frequency recrawl scheduler (operators/scheduler.py:
recrawl_schedule).

Shapes: pure JVM regexp (`regexp_extract_all` block split + per-field
`regexp_extract`) — the same lazy-dot-all patterns run under Java regex
and RE2, so the DuckDB oracle parses byte-identically. A sitemap body is
≤50 MB uncompressed by spec, so per-row extraction stays a map; the
explode fans out ≤50k rows per sitemap and the result is a plain
DataFrame ready for the admission battery (F1-F9) and the frontier
anti-join (P1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemaps", "discover_robots_sitemaps", "sitemap_refetch"]

# (?s): '.' spans newlines; lazy quantifiers keep blocks minimal. Both
# supported identically by Java regex (Spark) and RE2 (DuckDB oracle).
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


# `Sitemap:` directives are UA-INDEPENDENT per the protocol (unlike
# Disallow/Crawl-delay, which the driver-side parsers in
# operators/admission.py scope to a user-agent section), so discovery is
# a flat line scan: case-insensitive key at line start, value = the
# first non-whitespace run (CRLF-safe — \\S stops before \\r).
_SITEMAP_DIRECTIVE = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"


def discover_robots_sitemaps(robots: DataFrame, host_col: str = "host",
                             body_col: str = "body") -> DataFrame:
    """Extract ``Sitemap:`` directives from per-host robots.txt bodies —
    the discovery hop that feeds ``parse_sitemaps``: robots fetch (S6) →
    sitemap URLs → sitemap fetch → frontier seeds.

    The reference's robots parser honors only Disallow
    (PHPCrawlerRobotsTxtParser.class.php:109-151) and runs driver-side
    over ONE seed host; at web scale there is one robots body per host
    (millions of rows), so this is a relational pass: one
    ``regexp_extract_all`` + posexplode per row, no shuffle, no Python.

    Output: ``(host, seq, sitemap_url)``, document order preserved.
    """
    return robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.regexp_extract_all(
                F.col(body_col), F.lit(_SITEMAP_DIRECTIVE), F.lit(1)
            )
        ).alias("seq", "sitemap_url"),
    ).select("host", F.col("seq").cast("int").alias("seq"), "sitemap_url")


def parse_sitemaps(pages: DataFrame, url_col: str = "sitemap_url",
                   body_col: str = "body") -> DataFrame:
    """Parse fetched sitemap bodies into one row per referenced URL.

    Handles both document kinds:
      - ``<urlset>``       → kind='urlset', one row per ``<url>`` entry
        with loc / lastmod / changefreq / priority (missing optional
        fields are NULL; priority parses to double — string→double is
        correctly rounded, so any SQL engine yields the same bits).
      - ``<sitemapindex>`` → kind='index', one row per child ``<sitemap>``
        entry (loc + lastmod); the caller feeds these back through the
        fetcher — sitemap recursion is a frontier loop, not a parser
        loop, exactly like pagination synthesis (E17).

    ``seq`` preserves document order (posexplode), which the protocol
    allows publishers to use as an implicit priority. Entries without a
    ``<loc>`` are dropped (mandatory field).

    Output: ``(sitemap_url, kind, seq, loc, lastmod, changefreq,
    priority)``.
    """
    body = F.col(body_col)
    kind = F.when(
        body.rlike("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    blocks = F.when(
        F.col("kind") == "index",
        F.regexp_extract_all(body, F.lit(_INDEX_BLOCK), F.lit(1)),
    ).otherwise(F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(1)))

    exploded = (
        pages.select(
            F.col(url_col).alias("sitemap_url"), kind.alias("kind"), body
        )
        .select(
            "sitemap_url",
            "kind",
            F.posexplode(blocks).alias("seq", "block"),
        )
    )

    def field(pat):
        ex = F.regexp_extract(F.col("block"), pat, 1)
        return F.when(ex != "", ex)

    return (
        exploded.select(
            "sitemap_url",
            "kind",
            F.col("seq").cast("int").alias("seq"),
            field(_LOC).alias("loc"),
            field(_LASTMOD).alias("lastmod"),
            field(_CHANGEFREQ).alias("changefreq"),
            field(_PRIORITY).cast("double").alias("priority"),
        )
        .filter(F.col("loc").isNotNull())
    )


def sitemap_refetch(
    entries: DataFrame,
    pages: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    url_col: str = "url",
    fetched_col: str = "fetched_at",
) -> DataFrame:
    """Lastmod-driven recrawl selection — the freshness signal the
    sitemap protocol exists to provide: a URL whose publisher-declared
    ``<lastmod>`` is NEWER than our last fetch needs a refetch; a URL
    the sitemap lists that we never fetched needs a first fetch; a URL
    whose lastmod is older (or absent/garbage) can wait for the
    age-based scheduler (scheduler.recrawl_schedule — this operator is
    its high-precision companion, not a replacement).

    Freshness comparison is LEXICOGRAPHIC on normalized W3C datetime
    strings, never parsed timestamps: ISO 8601 orders lexicographically
    only at ONE precision, so every admitted form canonicalizes to full
    'YYYY-MM-DDTHH:MM:SSZ' — date-only pads to midnight, minute
    precision pads ':00', fractional seconds truncate, naive forms and
    '+00:00' stamp 'Z' — and anything else (malformed values AND
    non-UTC numeric offsets, which no string surgery makes comparable)
    becomes NULL (conservative: no freshness signal, the age scheduler
    owns the URL). The verdict is bit-identical across engines with no
    timestamp-parsing semantics in play (the C7/C12 determinism rule).

    Scale shape: one projection per side + one equi-join on the URL
    (full outer is NOT needed: URLs we fetched but the sitemap dropped
    are the age-scheduler's business). ``fetched_at`` uses the same
    normalized-string convention (the caller derives it from crawl
    round timestamps, C12's pinned clock).

    Output: ``loc, lastmod_norm, fetched_norm, refetch_reason``
    ('never_fetched' | 'modified' | NULL), ``needs_refetch``.
    """
    # only Z / +00:00 / naive forms are admitted: a non-UTC offset is
    # valid W3C but breaks lexicographic comparability, so it is NULLed
    w3c = r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|\+00:00)?)?$"

    def norm(col):
        # every admitted form canonicalizes to full 'THH:MM:SSZ'
        # precision before comparing: 'Z' sorts above ':' and '.', so a
        # minute-precision or fractional-seconds value is NOT
        # lexicographically comparable against the canonical form
        # (e.g. '...T18:00Z' > '...T18:00:30Z' byte-wise while being
        # 30s older) — pad the missing ':SS', truncate fractional
        # digits (floor: a sub-second-newer lastmod equal at :SS is a
        # no-op refetch, never a missed one), and stamp naive forms Z
        col = F.regexp_replace(col, r"\+00:00$", "Z")
        valid = F.when(col.rlike(w3c), col)
        t = F.regexp_replace(valid, r"Z$", "")
        t = F.regexp_replace(t, r"\.\d+$", "")
        t = F.when(
            t.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.concat(t, F.lit("T00:00:00"))
        ).when(
            t.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}$"),
            F.concat(t, F.lit(":00")),
        ).otherwise(t)
        return F.when(valid.isNotNull(), F.concat(t, F.lit("Z")))

    e = entries.select(
        F.col(loc_col).alias("loc"),
        norm(F.col(lastmod_col)).alias("lastmod_norm"),
    )
    p = pages.select(
        F.col(url_col).alias("loc"),
        norm(F.col(fetched_col)).alias("fetched_norm"),
    )
    joined = e.join(p, "loc", "left")
    reason = F.when(
        F.col("fetched_norm").isNull(), F.lit("never_fetched")
    ).when(
        F.col("lastmod_norm").isNotNull()
        & (F.col("lastmod_norm") > F.col("fetched_norm")),
        F.lit("modified"),
    )
    return joined.withColumn("refetch_reason", reason).withColumn(
        "needs_refetch", reason.isNotNull()
    )
