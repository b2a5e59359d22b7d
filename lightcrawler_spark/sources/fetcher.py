"""Fetch stage (SURVEY.md §2.1 S5, §2.2 F10/F11, §2.3 C6/C9/C10, §2.5
P9/P11/P12/P13).

Two implementations behind one interface:

- ``SyntheticFetcher`` — the deterministic test double mandated by
  FIXTURES.md §2: a relational join of the round's work-list against the
  ``webgraph`` fixture table. Replaces the socket layer 1:1 (status,
  content-type, redirect Location, body bytes, latency, per-attempt
  failures) so crawl-order goldens are exact and CI needs no network.
- ``HttpFetcher`` — the real path: Arrow-batched ``mapInPandas`` with
  per-partition connection/DNS caching, raw (non-followed) redirects,
  cookie/POST/basic-auth injection, and the reference's inline retry
  budget. Exercised against a localhost ``http.server`` in
  tests/test_http_fetcher.py (no egress needed).

Retry semantics (P9): the reference retries INLINE within one frontier
pop — up to ``tries_limit`` attempts with a politeness delay between,
then marks the URL followed regardless of outcome
(/root/reference/vendor/PHPCrawl_083/libs/PHPCrawler.class.php:735-762,
markUrlAsFollowed :836 runs unconditionally — exhausted URLs are NOT
re-queued). An attempt is retried when an error occurred or the status
is > 400 or < 100 (:743-747). Both fetchers reproduce exactly that, and
surface ``n_attempts`` for the golden trace.

Both return the work-list columns plus: status, content_type,
redirect_to, body, body_text (decoded per F10/F11 + gzip C10 + charset
sniff C6), received, bytes_received, latency_ms, n_attempts, and a
``benchmarks`` map of named per-request timers (A3 — the analog of
PHPCrawlerBenchmark's registry, PHPCrawlerBenchmark.class.php:30-118):
``server_response_ms`` (request → first response byte) and
``data_transfer_ms`` (body read only — the A4 transfer-rate base that
excludes connection/response time, mirroring the reference's
exclude-socket-prefill rule, PHPCrawlerHTTPRequest.class.php:517-539).
"""

from __future__ import annotations

import re
import zlib
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import CrawlSpec, php_regex_to_std

__all__ = [
    "SyntheticFetcher",
    "HttpFetcher",
    "decode_body_udf",
    "prepare_http_request_query",
    "is_gzip_encoded",
    "decode_gzip_content",
]

_CHARSET_RE = re.compile(
    r"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_-]+)", re.I
)

# Utils/PHPCrawlerUtils.class.php:593-597 — NOTE the `%-_` inside the
# class is a RANGE (ASCII 37..95: covers &'()*+,-./0-9:;<=>?@A-Z[\]^_),
# preserved verbatim as a reference quirk.
_VALID_URL_STRING_RE = re.compile(r"^[a-z0-9/.&=?%-_.!~*'()]+$", re.I)


def prepare_http_request_query(query: str) -> str:
    """C9: re-encode the request path+query like the reference
    (PHPCrawlerHTTPRequest.class.php:1063-1092): already-valid strings
    pass through; otherwise rawurldecode → ensure UTF-8 bytes (PHP
    utf8_encode == latin-1→utf-8 when not already valid UTF-8) →
    rawurlencode → restore the URL-structural characters ``/?=&``."""
    from urllib.parse import quote, unquote_to_bytes

    if _VALID_URL_STRING_RE.match(query):
        return query
    raw = unquote_to_bytes(query)
    try:
        raw.decode("utf-8")
    except UnicodeDecodeError:
        raw = raw.decode("latin-1").encode("utf-8")
    # PHP rawurlencode leaves A-Za-z0-9-_.~ — quote(safe="") matches
    out = quote(raw, safe="")
    for enc, ch in (("%2F", "/"), ("%3F", "?"), ("%3D", "="), ("%26", "&")):
        out = out.replace(enc, ch)
    return out


def is_gzip_encoded(content: bytes | None) -> bool:
    """C10 magic check (PHPCrawlerEncodingUtils.class.php:23-32)."""
    return content is not None and bytes(content[:3]) == b"\x1f\x8b\x08"


def decode_gzip_content(content: bytes) -> bytes:
    """C10: gzinflate(substr(content, 10, -8)) — raw-deflate the member
    body, skipping the 10-byte gzip header and 8-byte trailer
    (PHPCrawlerEncodingUtils.class.php:13-16). On corrupt input PHP's
    gzinflate returns false; we return the input unchanged."""
    try:
        return zlib.decompress(bytes(content[10:-8]), -zlib.MAX_WBITS)
    except zlib.error:
        return bytes(content)


@pandas_udf(T.StringType())
def decode_body_udf(body: pd.Series, content_type: pd.Series) -> pd.Series:
    """bytes → text: gzip decode when magic matches (C10), then the
    reference's charset handling (C6): header/meta charset sniff,
    GBK→UTF-8 conversion, UTF-8 with replacement otherwise
    (/root/reference/libs/CharsetHelper.class.php:19-35)."""

    def _decode(b, ct):
        if b is None:
            return None
        b = bytes(b)
        if is_gzip_encoded(b):
            b = decode_gzip_content(b)
        ct = ct or ""
        charset = None
        m = re.search(r"charset\s*=\s*([a-zA-Z0-9_-]+)", ct, re.I)
        if m:
            charset = m.group(1).lower()
        if charset is None:
            head = b[:2048].decode("latin-1", errors="replace")
            m = _CHARSET_RE.search(head)
            if m:
                charset = m.group(1).lower()
        if charset in ("gbk", "gb2312", "gb18030"):
            return b.decode("gb18030", errors="replace")
        return b.decode("utf-8", errors="replace")

    return pd.Series([_decode(b, c) for b, c in zip(body, content_type)])


def _rlike_any(col, rules: list[str]):
    preds = [col.rlike(php_regex_to_std(r)) for r in rules]
    return reduce(lambda a, b: a | b, preds, F.lit(False))


def _with_decoded_columns(df: DataFrame, spec: CrawlSpec) -> DataFrame:
    """Shared post-fetch projection: F10 receive gate, F11 link-search
    gate, C6/C10 decode, E5 redirect surfacing."""
    ct = F.coalesce(F.col("content_type"), F.lit(""))
    received = (
        F.col("status").between(200, 299)
        & _rlike_any(ct, spec.content_type_receive_rules)
    )
    return (
        df.withColumn("received", received)
        .withColumn(
            "bytes_received",
            F.when(received, F.length("body")).otherwise(F.lit(0)),
        )
        .withColumn(
            "body_text",
            F.when(
                received & _rlike_any(ct, spec.link_search_content_types),
                decode_body_udf(F.col("body"), F.col("content_type")),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "redirect_to",
            F.when(F.col("status").between(300, 399), F.col("redirect_to")),
        )
    )


class SyntheticFetcher:
    """Deterministic fetch = join against the fixture web (no sockets).

    The webgraph may carry ``fail_times`` per URL: the first N attempts
    "fail" (connection error), later ones return the page. The inline
    retry loop (P9) is folded into closed-form columns:

      final_status = 0                if fail_times >= retry_limit
                   = page status      otherwise (404 for unknown URLs)
      n_attempts   = retry_limit      if final invalid (<100 or >400)
                   = fail_times + 1   otherwise

    which is exactly what the reference's attempt loop converges to.
    """

    # pure function of the webgraph: the engine may leave the fetch plan
    # lazy inside a multi-scan job (fused-stats fast path) — a recompute
    # yields identical rows and touches no socket. HttpFetcher must NOT
    # set this: a duplicate scan would re-issue live requests.
    side_effect_free = True

    def __init__(self, webgraph_df: DataFrame, spec: CrawlSpec):
        # keep only the fetcher-owned columns; url is the join key
        cols = [
            F.col("url").alias("_w_url"),
            "status", "content_type", "redirect_to", "body", "latency_ms",
        ]
        if "fail_times" in webgraph_df.columns:
            cols.append("fail_times")
        else:
            cols.append(F.lit(0).alias("fail_times"))
        # adaptive backoff fixtures: Retry-After seconds on 429/503 rows
        if "retry_after" in webgraph_df.columns:
            cols.append("retry_after")
        else:
            cols.append(F.lit(None).cast("int").alias("retry_after"))
        # P12: fixture pages may SET cookies (→ harvested back into the
        # jar) and REQUIRE a cookie ("name=value" that must appear in the
        # request's Cookie header, else the page answers 403)
        if "set_cookies" in webgraph_df.columns:
            cols.append("set_cookies")
        else:
            cols.append(
                F.lit(None).cast("array<string>").alias("set_cookies")
            )
        self._has_cookie_gate = "requires_cookie" in webgraph_df.columns
        if self._has_cookie_gate:
            cols.append("requires_cookie")
        # conditional revalidation fixtures: the page's validators
        # (served as ETag / Last-Modified response headers)
        for vc, alias in (("etag", "_w_etag"), ("last_modified", "_w_lm")):
            if vc in webgraph_df.columns:
                cols.append(F.col(vc).alias(alias))
            else:
                cols.append(F.lit(None).cast("string").alias(alias))
        # fixture webs are small by construction — broadcast so each
        # round's fetch is shuffle-free on the work side. Do NOT wrap the
        # local-rows scan in coalesce(1): BroadcastExchange over a bare
        # LocalTableScan collects driver-side without scheduling a job,
        # and inserting Coalesce forces a real 1-task job per broadcast
        # per round (measured 3x engine-bench slowdown, A/B-bisected)
        self.web = F.broadcast(webgraph_df.select(*cols))
        self.spec = spec
        self._join_cond = F.col("url") == F.col("_w_url")
        # the output expressions are pure functions of the joined input
        # columns — build the Column trees ONCE per fetcher, not once per
        # round: the engine loop calls fetch() every round, and rebuilding
        # ~100 expression nodes is thousands of py4j round-trips that
        # dominate driver time at fixture scale (keyed by which optional
        # work-list columns exist: cookie_header, validators)
        self._out_exprs: dict[tuple, dict] = {}

    def _output_exprs(self, has_cookie_header: bool,
                      has_validators: bool) -> dict:
        key = (has_cookie_header, has_validators)
        cached = self._out_exprs.get(key)
        if cached is not None:
            return cached
        spec = self.spec
        # A3 named timers, deterministically derived from the fixture
        # latency (60% response / 40% transfer split)
        lat = F.coalesce(F.col("latency_ms"), F.lit(0)).cast("double")
        benchmarks = F.create_map(
            F.lit("server_response_ms"), F.round(lat * 0.6, 3),
            F.lit("data_transfer_ms"), F.round(lat * 0.4, 3),
        )
        # unresolvable URL = connection error → status 0, like a dead socket
        raw_status = F.coalesce(F.col("status"), F.lit(0))
        body = F.col("body")
        set_cookies = F.col("set_cookies")
        redirect = F.col("redirect_to")
        if self._has_cookie_gate:
            # cookie-gated page: without the required name=value in the
            # request's Cookie header the server answers 403 (no body,
            # no Set-Cookie) — the fixture analog of a session-gated site
            cookie_hdr = (
                F.coalesce(F.col("cookie_header"), F.lit(""))
                if has_cookie_header
                else F.lit("")
            )
            gate_fail = (
                F.col("requires_cookie").isNotNull()
                & ~cookie_hdr.contains(F.col("requires_cookie"))
            )
            raw_status = F.when(gate_fail, F.lit(403)).otherwise(raw_status)
            body = F.when(~gate_fail, body)
            set_cookies = F.when(~gate_fail, set_cookies)
            redirect = F.when(~gate_fail, redirect)
        not_mod = F.lit(False)
        if has_validators:
            # RFC 9110 §13.1.2: when If-None-Match is present it is
            # evaluated ALONE — If-Modified-Since MUST be ignored, even
            # when the page serves no ETag (no match -> full response);
            # a validator match on a would-be-2xx page answers 304
            inm = F.col("if_none_match")
            ims = F.col("if_modified_since")
            etag_match = F.when(
                inm.isNotNull(),
                F.col("_w_etag").isNotNull() & (inm == F.col("_w_etag")),
            ).otherwise(
                ims.isNotNull() & F.col("_w_lm").isNotNull()
                & (ims == F.col("_w_lm"))
            )
            not_mod = raw_status.between(200, 299) & etag_match
            raw_status = F.when(not_mod, F.lit(304)).otherwise(raw_status)
            body = F.when(~not_mod, body)
            redirect = F.when(~not_mod, redirect)
        fail_times = F.coalesce(F.col("fail_times"), F.lit(0))
        exhausted = fail_times >= F.lit(spec.retry_limit)
        status = F.when(exhausted, F.lit(0)).otherwise(raw_status)
        invalid = (status < 100) | (status > 400)
        n_attempts = (
            F.when(invalid, F.lit(spec.retry_limit))
            .otherwise(fail_times + 1)
            .cast("int")
        )
        content_type = F.when(~exhausted, F.col("content_type"))
        body = F.when(~exhausted, body)
        set_cookies = F.when(~exhausted, set_cookies)
        redirect = F.when(~exhausted, redirect)
        # F10/F11/C6/C10/E5 post-fetch projection, composed closed-form
        # over the final status/content_type/body
        ct = F.coalesce(content_type, F.lit(""))
        received = (
            status.between(200, 299)
            & _rlike_any(ct, spec.content_type_receive_rules)
        )
        exprs = {
            "benchmarks": benchmarks,
            "status": status,
            "n_attempts": n_attempts,
            "content_type": content_type,
            "body": body,
            "set_cookies": set_cookies,
            "received": received,
            "bytes_received": F.when(received, F.length(body)).otherwise(
                F.lit(0)
            ),
            "body_text": F.when(
                received & _rlike_any(ct, spec.link_search_content_types),
                decode_body_udf(body, content_type),
            ).otherwise(F.lit(None).cast("string")),
            "redirect_to": F.when(status.between(300, 399), redirect),
            # throttle surface: Retry-After only rides a throttled final
            # status (429/503), like a real server header
            "retry_after": F.when(
                status.isin(429, 503), F.col("retry_after")
            ).cast("int"),
            "etag": F.when(~exhausted, F.col("_w_etag")),
            "last_modified": F.when(~exhausted, F.col("_w_lm")),
        }
        self._out_exprs[key] = exprs
        return exprs

    def fetch(self, work: DataFrame) -> DataFrame:
        exprs = self._output_exprs(
            "cookie_header" in work.columns,
            "if_none_match" in work.columns,
        )
        joined = work.join(self.web, self._join_cond, "left")
        out = joined.withColumns(exprs).drop(
            "_w_url", "fail_times", "_w_etag", "_w_lm"
        )
        if self._has_cookie_gate:
            out = out.drop("requires_cookie")
        return out


class HttpFetcher:
    """Real HTTP fetch via mapInPandas (S5). Tested in-sandbox against a
    localhost http.server (tests/test_http_fetcher.py). Production
    shape: iterator-of-batches, per-process guarded DNS memoization
    (P11), inline retry budget (P9), content-type receive gate before
    body read (F10), RAW redirect statuses (E5 — the opener does NOT
    follow 3xx; status/Location surface as received), C9 query
    re-encoding, cookie header injection (P12) and POST/basic-auth
    injection (P13) from optional work-list columns."""

    def __init__(self, spec: CrawlSpec, timeout_s: float = 10.0):
        self.spec = spec
        self.timeout_s = timeout_s

    def fetch(self, work: DataFrame) -> DataFrame:
        spec, timeout = self.spec, self.timeout_s
        recv_rules = [php_regex_to_std(r) for r in spec.content_type_receive_rules]
        has_cookies = "cookie_header" in work.columns
        has_post = "post_data" in work.columns
        has_auth = "auth" in work.columns
        has_validators = "if_none_match" in work.columns

        out_schema = T.StructType(
            work.schema.fields
            + [
                T.StructField("status", T.IntegerType()),
                T.StructField("content_type", T.StringType()),
                T.StructField("redirect_to", T.StringType()),
                T.StructField("body", T.BinaryType()),
                T.StructField("latency_ms", T.IntegerType()),
                T.StructField("n_attempts", T.IntegerType()),
                T.StructField(
                    "benchmarks", T.MapType(T.StringType(), T.DoubleType())
                ),
                # P12 harvest-back: raw Set-Cookie header lines
                # (PHPCrawler.class.php:830 stores them on every pop)
                T.StructField("set_cookies", T.ArrayType(T.StringType())),
                # adaptive backoff: Retry-After seconds from a 429/503
                # response (delta-seconds form; HTTP-date form → null)
                T.StructField("retry_after", T.IntegerType()),
                # conditional-revalidation harvest: the response's ETag /
                # Last-Modified verbatim (opaque validators, RFC 9110
                # §8.8 — never parsed, echoed back on the next revisit)
                T.StructField("etag", T.StringType()),
                T.StructField("last_modified", T.StringType()),
            ]
        )

        def _install_dns_memo():
            """P11: per-process DNS memoization (the reference caches
            host→IP per process, PHPCrawlerDNSCache.class.php:26-41).
            Guarded by a sentinel so reused Python workers
            (spark.python.worker.reuse) never stack wrappers, and the
            cache is bounded."""
            import socket

            if getattr(socket.getaddrinfo, "_lc_dns_memo", False):
                return
            real_getaddrinfo = socket.getaddrinfo
            dns_cache: dict = {}

            def cached_getaddrinfo(host, *args, **kw):
                key = (host, args[0] if args else None)
                if key not in dns_cache:
                    if len(dns_cache) >= 4096:
                        dns_cache.clear()
                    dns_cache[key] = real_getaddrinfo(host, *args, **kw)
                return dns_cache[key]

            cached_getaddrinfo._lc_dns_memo = True
            socket.getaddrinfo = cached_getaddrinfo

        def _fetch_batches(batches):
            import base64
            import time
            import urllib.error
            import urllib.request

            compiled = [re.compile(r, re.I) for r in recv_rules]

            class _NoRedirect(urllib.request.HTTPRedirectHandler):
                # E5: surface 3xx raw — returning None makes urlopen
                # raise HTTPError, which IS the response object
                def redirect_request(self, req, fp, code, msg, headers, newurl):
                    return None

            opener = urllib.request.build_opener(_NoRedirect)
            _install_dns_memo()

            def _prepare_url(url: str) -> str:
                # C9: re-encode only the path+query request part
                m = re.match(r"^([a-zA-Z0-9+.-]+://[^/]*)(/.*)?$", url)
                if not m or not m.group(2):
                    return url
                return m.group(1) + prepare_http_request_query(m.group(2))

            def _attempt(url, cookie, post_data, auth, inm=None, ims=None):
                headers = {"User-Agent": spec.user_agent}
                if cookie:
                    headers["Cookie"] = cookie  # P12 (PHPCrawler:718-719)
                if inm:
                    # RFC 9110 §13.1.2: echo the stored ETag verbatim
                    headers["If-None-Match"] = inm
                elif ims:
                    # RFC 9110 §13.1.3: SHOULD NOT combine validators —
                    # a legacy server that wrongly prefers IMS could 304
                    # a page whose ETag changed while its date did not;
                    # send IMS only when no ETag is stored (matches the
                    # SyntheticFetcher/simulator evaluation order)
                    headers["If-Modified-Since"] = ims
                if auth:
                    # P13 basic auth (PHPCrawler:722-727)
                    headers["Authorization"] = "Basic " + base64.b64encode(
                        auth.encode("utf-8")
                    ).decode("ascii")
                data = None
                if post_data:
                    # P13 post-data (PHPCrawler:730-733)
                    data = post_data.encode("utf-8")
                    headers["Content-Type"] = "application/x-www-form-urlencoded"
                req = urllib.request.Request(
                    _prepare_url(url), data=data, headers=headers
                )
                t_req = time.perf_counter()
                try:
                    resp = opener.open(req, timeout=timeout)
                except urllib.error.HTTPError as e:
                    resp = e  # 3xx/4xx/5xx: the error IS the response
                except Exception:
                    # connection error
                    return 0, None, None, None, {}, None, None, None, None
                # A3: request → headers-in is the server-response timer
                t_resp = time.perf_counter()
                with resp:
                    status = resp.status if resp.status is not None else 0
                    ctype = resp.headers.get("Content-Type")
                    redirect = resp.headers.get("Location")
                    # P12 harvest-back: every Set-Cookie line, raw
                    set_cookies = resp.headers.get_all("Set-Cookie") or None
                    retry_after = None
                    if status in (429, 503):
                        ra = (resp.headers.get("Retry-After") or "").strip()
                        if ra.isdigit():
                            retry_after = int(ra)
                    etag = resp.headers.get("ETag")
                    last_mod = resp.headers.get("Last-Modified")
                    body = None
                    t_read0 = time.perf_counter()
                    if (
                        status != 304
                        and ctype
                        and any(rx.search(ctype) for rx in compiled)
                    ):
                        # F10: only receive gated bodies (a 304 carries
                        # none by definition — don't block on a read)
                        body = resp.read()
                    t_read = time.perf_counter() - t_read0
                bench = {
                    "server_response_ms": round((t_resp - t_req) * 1000, 3),
                    # A4 base: body read only (excludes connect/response,
                    # the prefill analog)
                    "data_transfer_ms": round(t_read * 1000, 3),
                }
                return (status, ctype, redirect, body, bench, set_cookies,
                        retry_after, etag, last_mod)

            for pdf in batches:
                rows = {
                    "status": [], "content_type": [], "redirect_to": [],
                    "body": [], "latency_ms": [], "n_attempts": [],
                    "benchmarks": [], "set_cookies": [], "retry_after": [],
                    "etag": [], "last_modified": [],
                }
                cookies = pdf["cookie_header"] if has_cookies else [None] * len(pdf)
                posts = pdf["post_data"] if has_post else [None] * len(pdf)
                auths = pdf["auth"] if has_auth else [None] * len(pdf)
                inms = (
                    pdf["if_none_match"] if has_validators
                    else [None] * len(pdf)
                )
                imss = (
                    pdf["if_modified_since"] if has_validators
                    else [None] * len(pdf)
                )
                for url, cookie, post_data, auth, inm, ims in zip(
                    pdf["url"], cookies, posts, auths, inms, imss
                ):
                    t0 = time.perf_counter()
                    (status, ctype, redirect, body, bench, set_ck, r_after,
                     etag, last_mod) = (
                        0, None, None, None, {}, None, None, None, None,
                    )
                    attempts = 0
                    # P9 inline retry (PHPCrawler.class.php:735-751):
                    # retry on error or status >400 / <100 (304 is a
                    # success: it terminates the loop like any 3xx)
                    for _ in range(spec.retry_limit):
                        attempts += 1
                        (status, ctype, redirect, body, bench, set_ck,
                         r_after, etag, last_mod) = _attempt(
                            url, cookie, post_data, auth, inm, ims)
                        if 100 <= status <= 400:
                            break
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["redirect_to"].append(redirect)
                    rows["body"].append(body)
                    rows["latency_ms"].append(
                        int((time.perf_counter() - t0) * 1000)
                    )
                    rows["n_attempts"].append(attempts)
                    rows["benchmarks"].append(bench)
                    rows["set_cookies"].append(set_ck)
                    rows["retry_after"].append(r_after)
                    rows["etag"].append(etag)
                    rows["last_modified"].append(last_mod)
                yield pd.concat(
                    [pdf.reset_index(drop=True), pd.DataFrame(rows)], axis=1
                )

        fetched = work.mapInPandas(_fetch_batches, out_schema)
        return _with_decoded_columns(fetched, self.spec)
