"""Spider-trap / pathological-URL detection for the admission pipeline.

The reference's admission battery (vendor/PHPCrawl_083/libs/
PHPCrawlerURLFilter.class.php:143-243) filters by protocol, depth, and
regex deny/allow lists — its per-site workers sidestep traps by
hand-tuning those regexes per spider (worker/Spider*.class.php seed
configs). A web-scale crawl cannot hand-tune a million hosts: it needs
URL-shape heuristics that flag calendar pages, session-id explosions,
and self-embedding path loops BEFORE they enter the frontier, or a
single trap host floods the dedup/anti-join stage with unbounded
distinct URLs. The rules here are the classic crawler heuristics
(Heritrix's pathological-path / too-many-path-segments decide rules;
session-id query stripping per Bar-Yossef et al., "Do not crawl in the
DUST").

Scale shape: every signal is a row-local JVM expression over the URL
string (split → array ops, one linear run-scan for the max segment
multiplicity) — no shuffle, no Python, whole-stage codegen'd, safe to
evaluate inside the F1-F9 admission battery at frontier insert time.
All regexes are RE2-compatible (no backreferences/lookahead) so the
DuckDB oracle applies byte-identical rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "trap_signal_columns",
    "with_trap_signals",
    "is_trap_expr",
    "is_trap_py",
    "dust_key",
]

# Query keys that carry per-visitor session tokens — URL aliasing, not
# content (each visit mints a fresh URL for the same page).
SESSION_ID_PAT = r"(?i)(^|&)(phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)="

# Python-flavored copy of SESSION_ID_PAT for the simulator mirror
# (identical pattern text — both engines' regex dialects accept it)
SESSION_ID_PAT_PY = r"(?i)(^|&)(phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)="

# A path segment that is a plausible calendar year; 3+ of them in one
# path is the infinite-calendar trap (`/2024/01/2024/02/...`).
_YEAR_SEG_PAT = r"^(19|20)[0-9]{2}$"


def _max_segment_multiplicity(segs: Column) -> Column:
    """Largest number of times any single segment repeats in the path.

    `/a/b/a/c/a` → 3. Linear run-scan over the SORTED segment array with
    a struct accumulator (same shape as operators/text.py:
    _top_ngram_best) — no nested lambda that captures the outer array,
    so the expression stays pushdown-safe (see SURVEY §11 on quadratic
    inlining of captured-array lambdas).
    """
    srt = F.array_sort(segs)
    zero = F.struct(
        F.lit("\x00").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(srt, zero, step, lambda acc: acc["best"])


def trap_signal_columns(url: Column) -> dict[str, Column]:
    """The raw signals as named Columns (composable into any projection)."""
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    return {
        "path_depth": F.size(segs).cast("int"),
        "max_seg_repeat": _max_segment_multiplicity(segs).cast("int"),
        "n_query_params": F.when(query == "", F.lit(0))
        .otherwise(
            F.size(F.filter(F.split(query, "&"), lambda p: p != F.lit("")))
        )
        .cast("int"),
        "has_session_id": query.rlike(SESSION_ID_PAT),
        "n_calendar_segs": F.size(
            F.filter(segs, lambda s: s.rlike(_YEAR_SEG_PAT))
        ).cast("int"),
        "url_len": F.length(url).cast("int"),
    }


def with_trap_signals(
    df: DataFrame,
    url_col: str = "url",
    *,
    max_seg_repeat: int = 3,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_url_len: int = 512,
    max_calendar_segs: int = 3,
) -> DataFrame:
    """Add trap signals + the combined ``is_trap`` verdict.

    Thresholds default to Heritrix-style values (a segment repeating 3×,
    >12 path segments, >8 query params, >512-char URL, 3+ year-shaped
    segments, or any session-id query key). ``is_trap`` rows should be
    dropped (or priority-demoted) before the frontier anti-join — traps
    by definition generate unbounded DISTINCT URLs, so the dedup stage
    cannot contain them.
    """
    sig = trap_signal_columns(F.col(url_col))
    out = df
    for name, col in sig.items():
        out = out.withColumn(name, col)
    return out.withColumn(
        "is_trap",
        (F.col("max_seg_repeat") >= max_seg_repeat)
        | (F.col("path_depth") > max_path_depth)
        | (F.col("n_query_params") > max_query_params)
        | F.col("has_session_id")
        | (F.col("url_len") > max_url_len)
        | (F.col("n_calendar_segs") >= max_calendar_segs),
    )


# Query keys that alias URLs without changing content: per-visitor
# session tokens (SESSION_ID_PAT keys) + click-tracking params.
TRACKING_PARAM_PAT = (
    r"(?i)^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|phpsessid|jsessionid"
    r"|sessionid|session_id|sid|aspsessionid[a-z]*)="
)


def dust_key(url: Column) -> Column:
    """DUST-rule canonical dedup key (Bar-Yossef et al., "Do not crawl
    in the DUST: different URLs with similar text"): the aggressive
    aliasing-collapse key used for frontier dedup ALONGSIDE the
    reference-exact C2 normalization (which must stay byte-compatible
    with the reference and therefore cannot strip anything).

    Rules: scheme+host lowercased; fragment dropped; duplicate path
    slashes collapsed; empty path → '/'; query params split, empties
    and session/tracking keys removed, survivors SORTED and rejoined
    (param order never distinguishes documents); bare '?' dropped.

    Row-local JVM expressions end-to-end (regex + array ops, no Python,
    no shuffle) — evaluable at frontier insert next to the trap signals.
    """
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    path = F.regexp_replace(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/{2,}", "/",
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_PAT),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def mine_param_relevance(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_md5",
    min_support: int = 2,
) -> DataFrame:
    """LEARN which query parameters are content-irrelevant from crawl
    evidence — the discovery half of the DUST algorithm (dust_key's
    static session/tracking list is the prior; this mines the rest):
    for each (host, param), group URLs that are IDENTICAL except for
    that parameter; a group where the param's value varies but the
    content hash doesn't is evidence the param is irrelevant, and a
    group where content differs is a contradiction. Verdict: irrelevant
    iff support ≥ min_support and contradictions = 0. Learned params
    feed back into the frontier dedup key — on alias-heavy sites this
    collapses the frontier by orders of magnitude.

    Scale shape: one explode (URL × its params), a codegen'd base-key
    rebuild, then two hash aggregations (group stats → per-param
    verdict) with map-side combine; distinct counts are exact. No
    window, no Python.
    """
    url = F.col(url_col)
    shp = F.regexp_extract(
        url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+[^?#]*)", 1
    )
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    exploded = pages.select(
        url.alias("_url"),
        F.col(hash_col).alias("_hash"),
        host.alias("host"),
        shp.alias("_shp"),
        params.alias("_params"),
        F.explode(params).alias("_param"),
    )
    others = F.filter(F.col("_params"), lambda x: x != F.col("_param"))
    keyed = exploded.select(
        "host",
        F.regexp_extract(F.col("_param"), "^([^=]*)", 1).alias("param_name"),
        F.concat(
            F.col("_shp"), F.lit("?"),
            F.array_join(F.array_sort(others), "&"),
        ).alias("_base_key"),
        "_url", "_hash",
    )
    groups = keyed.groupBy("host", "param_name", "_base_key").agg(
        F.countDistinct("_url").alias("_n_urls"),
        F.countDistinct("_hash").alias("_n_hashes"),
    )
    verdict = groups.groupBy("host", "param_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(((F.col("_n_urls") >= 2) & (F.col("_n_hashes") == 1))
              .cast("long")).alias("support"),
        F.sum((F.col("_n_hashes") > 1).cast("long")).alias("contradictions"),
    )
    return verdict.withColumn(
        "irrelevant",
        (F.col("support") >= F.lit(int(min_support)))
        & (F.col("contradictions") == 0),
    )


def is_trap_expr(
    url: Column,
    *,
    max_seg_repeat: int = 3,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_url_len: int = 512,
    max_calendar_segs: int = 3,
) -> Column:
    """The combined verdict as ONE predicate Column (no added columns) —
    the form the engine's admission step composes into its battery."""
    sig = trap_signal_columns(url)
    return (
        (sig["max_seg_repeat"] >= max_seg_repeat)
        | (sig["path_depth"] > max_path_depth)
        | (sig["n_query_params"] > max_query_params)
        | sig["has_session_id"]
        | (sig["url_len"] > max_url_len)
        | (sig["n_calendar_segs"] >= max_calendar_segs)
    )


def is_trap_py(
    url: str,
    *,
    max_seg_repeat: int = 3,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_url_len: int = 512,
    max_calendar_segs: int = 3,
) -> bool:
    """Pure-Python mirror of is_trap_expr for the reference-semantics
    simulator (goldens compare the engine against this byte-for-byte;
    a fuzz test asserts expression == mirror on a URL zoo)."""
    import re as _re
    from collections import Counter as _Counter

    m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else ""
    qm = _re.search(r"\?([^#]*)", url)
    query = qm.group(1) if qm else ""
    segs = [s for s in path.split("/") if s != ""]
    max_rep = max(_Counter(segs).values()) if segs else 0
    params = [p for p in query.split("&") if p != ""] if query else []
    has_sess = _re.search(SESSION_ID_PAT_PY, query) is not None
    n_cal = sum(1 for s in segs if _re.match(r"^(19|20)[0-9]{2}$", s))
    return (
        max_rep >= max_seg_repeat
        or len(segs) > max_path_depth
        or len(params) > max_query_params
        or has_sess
        or len(url) > max_url_len
        or n_cal >= max_calendar_segs
    )
