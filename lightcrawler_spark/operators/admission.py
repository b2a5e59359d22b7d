"""URL admission pipeline (SURVEY.md §2.2 F1–F9).

The reference applies these checks per-link, in a fixed order, before a
URL may enter the frontier
(/root/reference/vendor/PHPCrawl_083/libs/PHPCrawlerURLFilter.class.php:143-243):

  protocol → depth → nofollow(meta) → nofollow(rel) → follow-mode →
  url-deny-rules → linktext-deny-rules → (url-allow OR linktext-allow)

Here the whole battery is ONE whole-stage-codegen'd predicate: every
check is a JVM expression (startswith / rlike / string ops), folded with
``&``. Catalyst pushes it below the explode/shuffle, so at 100 TB the
filter runs where the links are born and nothing inadmissible is ever
shuffled. Robots rules (F8) are a tiny per-host table broadcast to an
anti-join. No Python executes per row anywhere in this module.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import FOLLOW_MODE_ANY, CrawlSpec, php_regex_to_std
from ..functions import urlkit

__all__ = [
    "host_expr",
    "domain_expr",
    "admission_predicate",
    "admit_links",
    "keep_redirects_only",
    "robots_rules_df",
    "apply_robots_filter",
    "robots_deny_predicate",
    "parse_robots_crawl_delay",
    "parse_robots_rules_extended",
    "robots_pattern_regex",
    "robots_rules_extended_df",
    "apply_robots_longest_match",
]

# rel=nofollow on the linkcode (URLFilter:171-175); branch-reset emulated
# by plain alternation (identical match set here).
_NOFOLLOW_LINKCODE = (
    "^<[^>]*rel\\s*=\\s*(\"\\s*nofollow\\s*\"|'\\s*nofollow\\s*'"
    "|\\s*nofollow\\s*)[^>]*>"
)


def host_expr(url: Column) -> Column:
    """Lowercased host, JVM-side (matches urlkit.split_url().host for
    scheme-qualified URLs — the only kind that exists post-canonicalize)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z0-9+.-]+://(?:[^/@?#]*@)?([^/:?#]*)", 1))


def domain_expr(url: Column) -> Column:
    """Reference domain rule (splitURL :62-75): host minus first label when
    >2 labels and not an all-digit IP; else the host itself."""
    h = host_expr(url)
    no_dots = F.translate(h, ".", "")
    return (
        F.when(F.size(F.split(h, r"\.")) <= 2, h)
        .when(no_dots.rlike(r"^[0-9]+$"), h)
        .otherwise(F.regexp_replace(h, r"^[^.]*\.", ""))
    )


def _strip_www(c: Column) -> Column:
    return F.regexp_replace(c, r"^www\.", "")


def _deny_fold(col: Column, rules: list[str]) -> Column:
    preds = [~col.rlike(php_regex_to_std(r)) for r in rules]
    return reduce(lambda a, b: a & b, preds, F.lit(True))


def _allow_fold(col: Column, rules: list[str]) -> Column:
    preds = [col.rlike(php_regex_to_std(r)) for r in rules]
    return reduce(lambda a, b: a | b, preds, F.lit(False))


def admission_predicate(
    spec: CrawlSpec,
    start_url: str,
    url: Column | None = None,
    linktext: Column | None = None,
    linkcode: Column | None = None,
    depth: Column | None = None,
    page_nofollow: Column | None = None,
) -> Column:
    """The F1–F7 battery as one Column predicate (reference order)."""
    url = url if url is not None else F.col("url")
    linktext = linktext if linktext is not None else F.col("linktext")
    linkcode = linkcode if linkcode is not None else F.col("linkcode")
    depth = depth if depth is not None else F.col("depth")

    start = urlkit.split_url(start_url)

    # F1 protocol — case-SENSITIVE like the reference's == "http://" check
    pred = url.startswith("http://") | url.startswith("https://")

    # F2 depth
    if spec.max_depth is not None:
        pred = pred & (depth <= F.lit(spec.max_depth))

    # F3 nofollow (page meta + rel=nofollow linkcode)
    if spec.obey_nofollow:
        if page_nofollow is not None:
            pred = pred & ~F.coalesce(page_nofollow, F.lit(False))
        pred = pred & ~F.coalesce(linkcode, F.lit("")).rlike(_NOFOLLOW_LINKCODE)

    # F4 follow mode
    if spec.follow_mode >= 1 and spec.follow_mode != FOLLOW_MODE_ANY:
        pred = pred & (domain_expr(url) == F.lit(start.domain))
    if spec.follow_mode >= 2:
        start_host = start.host[4:] if start.host.startswith("www.") else start.host
        pred = pred & (_strip_www(host_expr(url)) == F.lit(start_host))
    if spec.follow_mode == 3:
        proto = F.regexp_extract(url, r"^([a-zA-Z0-9+.-]+://)", 1)
        path = F.regexp_extract(url, r"^[a-zA-Z0-9+.-]+://[^/?#]*(/[^?#]*)?", 1)
        pred = pred & (proto == F.lit(start.protocol)) & (
            F.substring(path, 1, len(start.path)) == F.lit(start.path)
        )

    # F5 / F6 deny rules
    pred = pred & _deny_fold(url, spec.url_filter_rules)
    pred = pred & _deny_fold(F.coalesce(linktext, F.lit("")), spec.linktext_filter_rules)

    # F7 allow rules (url OR linktext), only when any rule exists
    if spec.url_follow_rules or spec.linktext_follow_rules:
        pred = pred & (
            _allow_fold(url, spec.url_follow_rules)
            | _allow_fold(F.coalesce(linktext, F.lit("")), spec.linktext_follow_rules)
        )
    return pred


def admit_links(links_df: DataFrame, spec: CrawlSpec, start_url: str) -> DataFrame:
    """Filter exploded links through F1–F7 (single codegen'd predicate)."""
    return links_df.filter(admission_predicate(spec, start_url))


def keep_redirects_only(links_df: DataFrame, decrease_depth: bool = True) -> DataFrame:
    """F9 bootstrap: before the first content page, only redirect targets
    survive, with depth handed back (URLFilter:121-135)."""
    out = links_df.filter(F.col("is_redirect"))
    if decrease_depth:
        out = out.withColumn("depth", F.col("depth") - F.lit(1))
    return out


# --- F8: robots.txt ------------------------------------------------------

def parse_robots_body(body: str, user_agent: str, base_url: str) -> list[str]:
    """Disallow lines applying to `user_agent` → absolute URL prefixes.

    Reference semantics (PHPCrawlerRobotsTxtParser.class.php:63-151):
    sections chosen when UA line is '*' or equals (case-insensitive) the
    agent string; only Disallow is honored (no Allow, no Crawl-delay);
    each path becomes the prefix normalize(base_url) + path.
    """
    base = urlkit.normalize_url(base_url)
    if base is None or body is None:
        return []
    current_ua = None
    prefixes: list[str] = []
    for raw in body.split("\n"):
        line = raw.strip()
        if line == "":
            continue
        low = line.lower()
        if low.startswith("user-agent:"):
            current_ua = line[len("user-agent:"):].strip()
            continue
        if current_ua is not None and (
            current_ua == "*" or current_ua.lower() == user_agent.lower()
        ):
            if low.startswith("disallow:"):
                path = line[len("disallow:"):].strip()
                if path:
                    if not path.startswith("/"):
                        path = "/" + path
                    prefixes.append(base + path)
    return prefixes


def parse_robots_crawl_delay(body: str, user_agent: str) -> float | None:
    """``Crawl-delay:`` seconds from the sections applying to
    `user_agent` (same section rule as parse_robots_body: UA line '*' or
    case-insensitive equality). Last applicable value wins; malformed or
    non-positive values are ignored.

    EXTENSION beyond the reference (its parser honors only Disallow —
    PHPCrawlerRobotsTxtParser.class.php:63-151): the north-star
    politeness scheduler budgets per host, and Crawl-delay is the
    standard per-host budget signal, so the engine maps it to a per-host
    per-round budget (CrawlSpec.budget_for_delay) when
    honor_crawl_delay is set."""
    if body is None:
        return None
    current_ua = None
    delay: float | None = None
    for raw in body.split("\n"):
        line = raw.strip()
        if line == "":
            continue
        low = line.lower()
        if low.startswith("user-agent:"):
            current_ua = line[len("user-agent:"):].strip()
            continue
        if current_ua is not None and (
            current_ua == "*" or current_ua.lower() == user_agent.lower()
        ):
            if low.startswith("crawl-delay:"):
                val = line[len("crawl-delay:"):].strip()
                try:
                    parsed = float(val)
                except ValueError:
                    continue
                if parsed > 0:
                    delay = parsed
    return delay


def robots_rules_df(spark, robots_fixture: list[tuple[str, str]], user_agent: str) -> DataFrame:
    """(host, robots_body) fixture → (host, deny_prefix) rule table.

    Tiny by construction (hosts × rules): built driver-side, broadcast at
    the join site by apply_robots_filter.
    """
    rows = []
    for host, body in robots_fixture:
        for p in parse_robots_body(body, user_agent, f"http://{host}"):
            rows.append((host, p))
    return spark.createDataFrame(rows or [("", "")], "host string, deny_prefix string")


def robots_deny_predicate(rules: list[tuple[str, str]],
                          url: Column | None = None) -> Column:
    """F8 as ONE literal predicate for SMALL rule sets: the reference
    itself folds robots Disallows into its regex deny list
    (PHPCrawler.class.php:843-853), so a bounded rule table becomes a
    codegen'd conjunction — no broadcast exchange, no per-round sub-job.
    Large rule tables (many hosts) use apply_robots_filter's broadcast
    anti-join instead."""
    url = url if url is not None else F.col("url")
    h = host_expr(url)
    pred = F.lit(True)
    for host, prefix in rules:
        pred = pred & ~((h == F.lit(host)) & url.startswith(prefix))
    return pred


def apply_robots_filter(links_df: DataFrame, rules_df: DataFrame) -> DataFrame:
    """Anchored-prefix deny (the reference builds ^-anchored regexes from
    literal prefixes — equivalent to startswith). Broadcast anti-join:
    rules are per-host and tiny, so this is shuffle-free on the big side.
    The host is projected to a column FIRST so the join carries an
    equality key (BroadcastHashJoin) instead of evaluating a regex inside
    a nested-loop condition."""
    r = F.broadcast(rules_df.withColumnRenamed("host", "_r_host"))
    withhost = links_df.withColumn("_l_host", host_expr(F.col("url")))
    return withhost.join(
        r,
        (F.col("_l_host") == F.col("_r_host"))
        & F.col("url").startswith(F.col("deny_prefix")),
        "left_anti",
    ).drop("_l_host")


# ---------------------------------------------------------------------------
# RFC 9309 longest-match Allow/Disallow (extension beyond the reference,
# whose parser honors Disallow only -- PHPCrawlerRobotsTxtParser.class.php:
# 109-151; modern robots.txt REQUIRES Allow + most-specific-match to be
# honored, or sites like wikipedia.org over-block)
# ---------------------------------------------------------------------------

def parse_robots_rules_extended(
    body: str, user_agent: str
) -> list[tuple[str, bool]]:
    """Collect (path_pattern, is_allow) pairs per RFC 9309 §2.2.1 group
    semantics: CONSECUTIVE User-agent lines form one group sharing the
    rule block that follows; among the groups, only the MOST SPECIFIC
    match applies — groups naming `user_agent` exactly (case-insensitive)
    if any exist, else the `*` groups; the rules of all equally-specific
    matching groups are combined. (parse_robots_body keeps the
    reference's looser union-of-sections behavior for trace parity —
    PHPCrawlerRobotsTxtParser.class.php:63-151.)

    Patterns keep their RFC 9309 metacharacters ('*' wildcard, '$' end
    anchor); empty Disallow ("allow all") contributes nothing, per the
    RFC.
    """
    if body is None:
        return []
    # groups: (ua_names, rules); consecutive UA lines extend the same group
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur: tuple[list[str], list[tuple[str, bool]]] | None = None
    last_was_ua = False
    for raw in body.split("\n"):
        line = raw.strip()
        if line == "":
            continue
        low = line.lower()
        if low.startswith("user-agent:"):
            ua = line[len("user-agent:"):].strip()
            if not last_was_ua or cur is None:
                cur = ([], [])
                groups.append(cur)
            cur[0].append(ua)
            last_was_ua = True
            continue
        last_was_ua = False
        if cur is None:
            continue  # rules before any User-agent line belong to no group
        for key, is_allow in (("allow:", True), ("disallow:", False)):
            if low.startswith(key):
                path = line[len(key):].strip()
                if path:
                    if not path.startswith("/"):
                        path = "/" + path
                    cur[1].append((path, is_allow))
    ua_low = user_agent.lower()
    exact = [g for g in groups if any(u.lower() == ua_low for u in g[0])]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    return [rule for _, rules in chosen for rule in rules]


def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex: '*' matches any run,
    a trailing '$' anchors the end, everything else is literal. The
    translation is shared by the engine and the contract oracle."""
    anchored_end = pattern.endswith("$")
    core = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.^$+?{}[]|()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def robots_rules_extended_df(spark, robots_fixture, user_agent: str):
    """(host, body) fixture -> (host, pattern, regex, pattern_len,
    is_allow) rule dim. Tiny by construction; broadcast at the join."""
    rows = []
    for host, body in robots_fixture:
        for pattern, is_allow in parse_robots_rules_extended(body, user_agent):
            rows.append((host, pattern, robots_pattern_regex(pattern),
                         len(pattern), bool(is_allow)))
    return spark.createDataFrame(
        rows,
        "host string, pattern string, regex string, "
        "pattern_len int, is_allow boolean",
    )


def apply_robots_longest_match(
    links_df: DataFrame, rules_df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Most-specific-match robots verdict per URL (RFC 9309 §2.2.2):
    among the URL's host's rules whose pattern matches its path, the
    LONGEST pattern wins; a length tie goes to Allow; no match = allowed.

    `url_col` must be unique within `links_df` (it is the verdict key).

    Scale shape: rules are a tiny per-host dim -> broadcast inner join +
    per-row regex match fans out to (url x matching rules), then the
    argmax collapses with a partial-aggregating max(struct(len, allow))
    -- lexicographic struct ordering IS the precedence rule, ties
    included -- and a final broadcast-left join attaches verdicts. No
    window, no Python, no global sort.
    """
    url = F.col(url_col)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    withhost = links_df.withColumn("_h", host_expr(url)).withColumn(
        "_path", path
    )
    r = F.broadcast(
        rules_df.select(
            F.col("host").alias("_h"), "regex", "pattern_len", "is_allow"
        )
    )
    verdicts = (
        withhost.join(r, "_h", "inner")
        .filter(F.regexp_like(F.col("_path"), F.col("regex")))
        .groupBy(url_col)
        .agg(
            F.max(
                F.struct(
                    F.col("pattern_len").alias("l"),
                    F.col("is_allow").cast("int").alias("a"),
                )
            ).alias("_best")
        )
        .select(
            url_col,
            F.col("_best.l").alias("matched_len"),
            (F.col("_best.a") == 1).alias("_matched_allow"),
        )
    )
    return (
        withhost.join(F.broadcast(verdicts), url_col, "left")
        .withColumn("allowed", F.coalesce(F.col("_matched_allow"), F.lit(True)))
        .withColumn("matched_len", F.coalesce(F.col("matched_len"), F.lit(-1)))
        .drop("_h", "_path", "_matched_allow")
    )
