"""Link / metadata extraction (SURVEY.md §2.4 E1–E6, E17).

Pure-Python kernel `find_links` ports the reference link-finder's three
regex passes byte-for-byte in behavior:

- pass 1: well-formed ``<a …>text</a>`` with linktext capture (≤500 chars)
  (/root/reference/vendor/PHPCrawl_083/libs/PHPCrawlerLinkFinder.class.php:176-195)
- pass 2: any extract-tag attribute inside any tag (:197-210)
- pass 3 ("aggressive"): ``url(...)``, quoted and unquoted attr-likes
  anywhere (:212-239)
- per-document first-wins dedup on the raw link (:279-308)
- ``<base href>`` re-basing (:144-159; Utils/PHPCrawlerUtils.class.php:335-345)
- section stripping: <script>, HTML comments, on*= attributes (:244-269)
- meta-tag collection (Utils/PHPCrawlerUtils.class.php:568-585)
- redirect link from header Location:/Content-Location:
  (Utils/PHPCrawlerUtils.class.php:352-363, LinkFinder:100-135)
- pagination synthesis from JS page counters
  (/root/reference/worker/SpiderCsrcGov.class.php:117-199)

The Spark face is a single Arrow-batched pandas UDF returning
``array<struct<link_raw,linkcode,linktext,url,is_redirect>>`` per page —
one shuffle-free narrow map over fetched bodies; downstream ops
``explode`` it back into frontier rows (E2/E3 handled relationally).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import urlkit

__all__ = [
    "EXTRACT_TAGS",
    "find_links",
    "extract_meta_tags",
    "redirect_url_from_header",
    "extract_links_udf",
    "page_nofollow_udf",
    "LINK_STRUCT",
    "explode_links",
    "synthesize_pagination",
]

# PHPCrawlerLinkFinder.class.php:15
EXTRACT_TAGS = (
    "href", "src", "url", "location", "codebase", "background",
    "data", "profile", "action", "open",
)
_TAGS = "|".join(EXTRACT_TAGS)

# PCRE (?|"([^"]+)"|'([^']+)'|([^\s><'"]+)) branch-reset, emulated with
# three numbered groups coalesced in code.
_VAL = "(?:\"([^\"]+)\"|'([^']+)'|([^\\s><'\"]+))"

_PASS1_RE = re.compile(
    rf"<\s*a\s[^<>]*(?<=\s)(?:{_TAGS})\s*=\s*{_VAL}[^<>]*>"
    r"((?:(?!<\s*/a\s*>).){0,500})"
    r"<\s*/a\s*>",
    re.I | re.S,
)
_PASS2_RE = re.compile(
    rf"<[^<>]*\s(?:{_TAGS})\s*=\s*{_VAL}[^<>]*>", re.I | re.S
)
# aggressive pass (LinkFinder:216-224); group layout mirrors the PCRE
_AGGR_RES = (
    (re.compile(rf"[\s.:;](?:{_TAGS})\s*\(\s*([\"|']{{0,1}})([^\"') ]{{1,500}})['\")]", re.I | re.S), 2),
    (re.compile(rf"[\s.:;\"'](?:{_TAGS})\s*=\s*([\"|'])(.{{0,500}}?)\1", re.I | re.S), 2),
    (re.compile(rf"[\s.:;](?:{_TAGS})\s*(=)\s*([^\s\">']{{1,500}})", re.I | re.S), 2),
)

# Utils/PHPCrawlerUtils.class.php:335-345 (<base href> / src)
_BASE_TAG_RE = re.compile(
    r"<{1}[ ]{0,}(base){1}[ ]{1,}(href|src)[ ]{0,}=[ ]{0,}"
    r"(\"|'){0,1}([^\"'><\n ]{0,})(\"|'|>|<|\n| )",
    re.I,
)
# Utils/PHPCrawlerUtils.class.php:568-585 (U = lazy quantifiers)
_META_RE = re.compile(
    rf"<\s*meta\s+name\s*=\s*{_VAL}\s+content\s*=\s*{_VAL}.*?>", re.I | re.S
)
# Utils/PHPCrawlerUtils.class.php:352-363
_REDIRECT_RE = re.compile(r"(location:|content-location:)(.{0,})[\n]", re.I)

# prepareHTMLChunk section strips (LinkFinder:244-269); U modifier → lazy
_SCRIPT_RE1 = re.compile(r"<script(?:(?!src).)*?>.*?(?:</script>|$)", re.I | re.S)
_SCRIPT_RE2 = re.compile(r"^(?:(?!<script).)*?</script>", re.I | re.S)
_COMMENT_RE1 = re.compile(r"<!--.*?(?:-->|$)", re.S)
_COMMENT_RE2 = re.compile(r"^(?:(?!<!--).)*?-->", re.S)
_ONATTR_RE = re.compile(
    r"on[a-z]+\s*=\s*(?:\"(?:[^\"]+?)\"|'(?:[^']+?)'|(?:[^\s><'\"]+?))",
    re.I | re.S,
)


def _coalesce_val(groups: tuple, base: int = 0) -> str:
    for i in range(base, base + 3):
        if groups[i] is not None:
            return groups[i]
    return ""


def prepare_html(html: str, strip_script=True, strip_comments=True,
                 strip_onattrs=True) -> str:
    if strip_script:
        html = _SCRIPT_RE1.sub("", html)
        html = _SCRIPT_RE2.sub("", html)
    if strip_comments:
        html = _COMMENT_RE1.sub("", html)
        html = _COMMENT_RE2.sub("", html)
    if strip_onattrs:
        html = _ONATTR_RE.sub("", html)
    return html


def extract_meta_tags(html: str) -> dict[str, str]:
    """<meta name=… content=…> → {lower(name): lower(content)} (last wins)."""
    tags: dict[str, str] = {}
    for m in _META_RE.finditer(html):
        g = m.groups()
        tags[_coalesce_val(g, 0).strip().lower()] = _coalesce_val(g, 3).strip().lower()
    return tags


def base_url_from_meta(html: str) -> str | None:
    m = _BASE_TAG_RE.search(html)
    if m:
        return m.group(4).strip()
    return None


def redirect_url_from_header(header: str) -> str | None:
    """Location:/Content-Location: value (requires trailing newline, like
    the reference's regex)."""
    if header is None:
        return None
    m = _REDIRECT_RE.search(header)
    if m:
        return m.group(2).strip()
    return None


def find_links(
    html: str,
    base_url: str,
    aggressive: bool = False,
    strip_sections: bool = True,
    redirect_location: str | None = None,
) -> list[dict]:
    """Ordered link extraction with first-wins per-document dedup.

    Returns dicts: link_raw, linkcode, linktext, url (canonical rebuild,
    None dropped), is_redirect. Order = (redirect first, pass order,
    match order) — this order feeds the frontier insert_seq contract.
    """
    base_parts = urlkit.split_url(base_url)
    if base_parts is None:
        return []

    out: list[dict] = []
    seen_raw: set[str] = set()

    def add(link_raw: str, linkcode: str, linktext: str, is_redirect=False):
        if link_raw in seen_raw:
            return
        rebuilt = urlkit.build_url_from_link(link_raw, base_parts)
        if rebuilt is None:
            return
        out.append(
            {
                "link_raw": link_raw,
                "linkcode": linkcode,
                "linktext": linktext,
                "url": rebuilt,
                "is_redirect": bool(is_redirect),
            }
        )
        seen_raw.add(link_raw)

    # redirect target from the response header arrives before body links
    # (LinkFinder:100-135)
    if redirect_location:
        add(redirect_location.strip(), "", "", is_redirect=True)

    if html:
        # <base href> re-bases resolution (LinkFinder:144-159)
        meta_base = base_url_from_meta(html)
        if meta_base is not None:
            rebased = urlkit.build_url_from_link(meta_base, base_parts)
            if rebased is not None:
                rb = urlkit.split_url(rebased)
                if rb is not None:
                    base_parts = rb

        body = prepare_html(html) if strip_sections else html

        for m in _PASS1_RE.finditer(body):
            link_raw = _coalesce_val(m.groups(), 0).strip()
            if link_raw:
                add(link_raw, m.group(0).strip(), m.group(4))
        for m in _PASS2_RE.finditer(body):
            link_raw = _coalesce_val(m.groups(), 0).strip()
            if link_raw:
                add(link_raw, m.group(0).strip(), "")
        if aggressive:
            for rx, gi in _AGGR_RES:
                for m in rx.finditer(body):
                    add(m.group(gi).strip(), m.group(0).strip(), "")
    return out


LINK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("link_raw", T.StringType()),
            T.StructField("linkcode", T.StringType()),
            T.StructField("linktext", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("is_redirect", T.BooleanType()),
        ]
    )
)


@pandas_udf(T.BooleanType())
def page_nofollow_udf(bodies: pd.Series) -> pd.Series:
    """F3 page level: <meta name=robots content=…nofollow…> → True
    (PHPCrawlerURLFilter.class.php:161-169; meta parse
    Utils/PHPCrawlerUtils.class.php:568-585). Arrow-batched; the engine
    only evaluates it when obey_nofollow is set."""
    out = []
    for body in bodies:
        if not isinstance(body, str) or not body:
            out.append(False)
            continue
        out.append("nofollow" in extract_meta_tags(body).get("robots", ""))
    return pd.Series(out, dtype="bool")


@pandas_udf(LINK_STRUCT)
def extract_links_udf(
    bodies: pd.Series, base_urls: pd.Series, redirects: pd.Series
) -> pd.Series:
    """Arrow-batched page → links kernel (one call per ~10k-row batch).

    bodies: decoded HTML (None for non-HTML per F11); base_urls: canonical
    page URL; redirects: Location header target or None.
    """
    res = []
    for body, base, redir in zip(bodies, base_urls, redirects):
        res.append(
            find_links(
                body if isinstance(body, str) else None,
                base,
                aggressive=False,
                redirect_location=redir,
            )
        )
    return pd.Series(res)


def explode_links(pages_df, url_col="url", depth_col="depth",
                  links_col="links"):
    """E2+E3 relationally: explode extracted links, keep per-(page,link)
    first occurrence (posexplode order), child depth = parent depth + 1.

    The UDF already dedups per document on link_raw; posexplode keeps the
    emission order as `link_pos`, which downstream insert_seq assignment
    uses — no shuffle here, it is a narrow projection.
    """
    return (
        pages_df.select(
            F.col(url_col).alias("referer"),
            F.col(depth_col).alias("src_depth"),
            F.posexplode(F.col(links_col)).alias("link_pos", "l"),
        )
        .select(
            "referer",
            "link_pos",
            F.col("l.link_raw").alias("link_raw"),
            F.col("l.linkcode").alias("linkcode"),
            F.col("l.linktext").alias("linktext"),
            F.col("l.url").alias("url"),
            F.col("l.is_redirect").alias("is_redirect"),
            (F.col("src_depth") + F.lit(1)).alias("depth"),
        )
    )


# --- E17: pagination synthesis ------------------------------------------
_COUNTPAGE_RE = r"var\s+countPage\s*=\s*(\d+)"


def synthesize_pagination(pages_df, body_col="body_text", url_col="url",
                          pattern=_COUNTPAGE_RE, template="index_{i}.htm",
                          extra_cols: tuple = ()):
    """List pages advertising `var countPage=N` (JS) synthesize sibling
    page URLs index_1..index_{N-1} and feed them back to the frontier
    (reference: SpiderCsrcGov.class.php:117-138 + addFeed,
    SpiderFrame.class.php:184-199).

    JVM-only plan: regexp_extract → sequence → explode → format_string;
    no Python in the loop, stays inside whole-stage codegen. Output also
    carries `feed_pos` (the page index i — the deterministic feed order
    the engine's insert_seq packing needs) and any `extra_cols`.
    """
    # try_cast: regexp_extract yields "" on no-match, which ANSI cast rejects
    n = F.regexp_extract(F.col(body_col), pattern, 1).try_cast("int")
    base_dir = F.regexp_extract(F.col(url_col), r"^(.*/)[^/]*$", 1)
    tpl = template.replace("{i}", "%d")
    return (
        pages_df.withColumn("_page_count", n)
        .filter(F.col("_page_count") > 1)
        .select(
            F.col(url_col).alias("referer"),
            *[F.col(c) for c in extra_cols],
            base_dir.alias("_dir"),
            F.explode(F.sequence(F.lit(1), F.col("_page_count") - 1)).alias("_i"),
        )
        .select(
            "referer",
            *extra_cols,
            F.concat(F.col("_dir"), F.format_string(tpl, F.col("_i"))).alias("url"),
            F.col("_i").alias("feed_pos"),
        )
    )


# rel=canonical handling (extension: the reference's link finder scans
# href/src for FRONTIER candidates only — PHPCrawlerLinkFinder.class.php:
# 140-239 — and never reads the alias semantics of <link rel=canonical>).
# Attribute order varies in the wild, so two patterns + first-nonempty.
_CANON_REL_HREF = (
    r'(?is)<link[^>]*rel\s*=\s*["\']?canonical["\']?[^>]*'
    r'href\s*=\s*["\']([^"\']+)["\']'
)
_CANON_HREF_REL = (
    r'(?is)<link[^>]*href\s*=\s*["\']([^"\']+)["\'][^>]*'
    r'rel\s*=\s*["\']?canonical["\']?'
)


def extract_canonical(pages: DataFrame, url_col: str = "url",
                      body_col: str = "body") -> DataFrame:
    """Extract ``<link rel=canonical>`` alias edges from page bodies.

    The canonical URL is the site's OWN declaration that this page is an
    alias — the strongest dedup signal a crawler gets (Google treats it
    as near-authoritative). Downstream: rows with ``is_alias`` collapse
    onto ``canonical_url`` in the product sink (S9) and the canonical
    target re-enters the frontier.

    Pure JVM regex (RE2-compatible, both attribute orders); relative
    canonical hrefs are kept verbatim for the C3 resolver upstream.
    Adds ``canonical_url`` (null when undeclared) and ``is_alias``
    (declared AND different from the page's own URL).
    """
    body = F.col(body_col)
    c1 = F.regexp_extract(body, _CANON_REL_HREF, 1)
    c2 = F.regexp_extract(body, _CANON_HREF_REL, 1)
    canon = F.when(c1 != "", c1).when(c2 != "", c2).otherwise(
        F.lit(None).cast("string")
    )
    return pages.withColumn("canonical_url", canon).withColumn(
        "is_alias",
        F.col("canonical_url").isNotNull()
        & (F.col("canonical_url") != F.col(url_col)),
    )
