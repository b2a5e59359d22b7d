"""Arrow-vectorized Spark UDFs wrapping the pure-Python kernels.

Per the engine contract (BASELINE.json input_hint: "vectorized
pandas/Arrow UDFs, no per-row Python"), every Python-side kernel is
exposed as a pandas UDF: Spark ships Arrow record batches, the UDF loops
in-process over a contiguous batch (no per-row serialization round-trip),
and returns an Arrow batch. JVM-side built-ins are still preferred
wherever an expression exists (md5, xxhash64, rlike, window ranks) — these
UDFs cover only the canonicalization/extraction kernels Catalyst cannot
express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import urlkit

__all__ = [
    "normalize_url_udf",
    "resolve_link_udf",
    "format_url_udf",
    "split_host_udf",
    "split_domain_udf",
    "url_md5_expr",
    "url_hash64_expr",
]


@pandas_udf(T.StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    """normalizeURL over an Arrow batch (C2): seed/URL canonical form."""
    return urls.map(lambda u: urlkit.normalize_url(u) if u is not None else None)


@pandas_udf(T.StringType())
def resolve_link_udf(links: pd.Series, base_urls: pd.Series) -> pd.Series:
    """buildURLFromLink over an Arrow batch (C3).

    base_urls are canonical page URLs; parts are memoized per batch since
    a batch typically holds many links from few pages.
    """
    cache: dict = {}

    def _resolve(link, base):
        if link is None or base is None:
            return None
        parts = cache.get(base)
        if parts is None:
            parts = urlkit.split_url(base)
            cache[base] = parts
        if parts is None or parts.host == "":
            return None
        return urlkit.build_url_from_link(link, parts)

    return pd.Series([_resolve(l, b) for l, b in zip(links, base_urls)])


@pandas_udf(T.StringType())
def format_url_udf(base_urls: pd.Series, links: pd.Series) -> pd.Series:
    """Formatter::formaturl over an Arrow batch (C4) — the reference's
    second resolver, quirks preserved (see urlkit.format_url)."""
    return pd.Series(
        [
            urlkit.format_url(b, l) if l is not None else None
            for b, l in zip(base_urls, links)
        ]
    )


@pandas_udf(T.StringType())
def split_host_udf(urls: pd.Series) -> pd.Series:
    """Lowercased host of a URL (C1)."""

    def _host(u):
        if u is None:
            return None
        p = urlkit.split_url(u)
        return p.host if p is not None else None

    return urls.map(_host)


@pandas_udf(T.StringType())
def split_domain_udf(urls: pd.Series) -> pd.Series:
    """Registrable-ish domain per the reference rule (host minus first
    label when >2 labels and not an IPv4)."""

    def _domain(u):
        if u is None:
            return None
        p = urlkit.split_url(u)
        return p.domain if p is not None else None

    return urls.map(_domain)


def url_md5_expr(col):
    """JVM-side dedup key (C5): md5 hex of the canonical URL — matches
    urlkit.url_md5 byte-for-byte, but runs in whole-stage codegen."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def url_hash64_expr(col):
    """64-bit fast-path key for bloom filters / bucketing (xxhash64)."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)
