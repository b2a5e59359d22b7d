"""Fetch stage (SURVEY.md §2.1 S5, §2.2 F10/F11, §2.3 C6).

Two implementations behind one interface:

- ``SyntheticFetcher`` — the deterministic test double mandated by
  FIXTURES.md §2: a relational join of the round's work-list against the
  ``webgraph`` fixture table. Replaces the socket layer 1:1 (status,
  content-type, redirect Location, body bytes, latency) so crawl-order
  goldens are exact and CI needs no network.
- ``HttpFetcher`` — the real path: Arrow-batched ``mapInPandas`` with
  per-partition connection/DNS caching and the reference's retry budget
  (3 tries on error or status >400/<100 —
  /root/reference/vendor/PHPCrawl_083/libs/PHPCrawler.class.php:735-751).
  It is exercised nowhere in tests (sandbox has no egress) but keeps the
  production shape visible: the work-list arrives host-salted
  (operators/scheduler.salted_repartition) so one partition fetches a
  bounded slice of any single host.

Both return the work-list columns plus: status, content_type,
redirect_to, body, body_text (decoded per F10/F11 + charset sniff C6),
received, bytes_received, latency_ms.
"""

from __future__ import annotations

import re
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import CrawlSpec, php_regex_to_std

__all__ = ["SyntheticFetcher", "HttpFetcher", "decode_body_udf"]

_CHARSET_RE = re.compile(
    r"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_-]+)", re.I
)


@pandas_udf(T.StringType())
def decode_body_udf(body: pd.Series, content_type: pd.Series) -> pd.Series:
    """bytes → text with the reference's charset handling (C6): header/meta
    charset sniff, GBK→UTF-8 conversion, UTF-8 with replacement otherwise
    (/root/reference/libs/CharsetHelper.class.php:19-35)."""

    def _decode(b, ct):
        if b is None:
            return None
        ct = ct or ""
        charset = None
        m = re.search(r"charset\s*=\s*([a-zA-Z0-9_-]+)", ct, re.I)
        if m:
            charset = m.group(1).lower()
        if charset is None:
            head = bytes(b[:2048]).decode("latin-1", errors="replace")
            m = _CHARSET_RE.search(head)
            if m:
                charset = m.group(1).lower()
        if charset in ("gbk", "gb2312", "gb18030"):
            return bytes(b).decode("gb18030", errors="replace")
        return bytes(b).decode("utf-8", errors="replace")

    return pd.Series([_decode(b, c) for b, c in zip(body, content_type)])


def _rlike_any(col, rules: list[str]):
    preds = [col.rlike(php_regex_to_std(r)) for r in rules]
    return reduce(lambda a, b: a | b, preds, F.lit(False))


class SyntheticFetcher:
    """Deterministic fetch = join against the fixture web (no sockets)."""

    def __init__(self, webgraph_df: DataFrame, spec: CrawlSpec):
        # keep only the fetcher-owned columns; url is the join key
        self.web = webgraph_df.select(
            F.col("url").alias("_w_url"),
            "status", "content_type", "redirect_to", "body", "latency_ms",
        )
        self.spec = spec

    def fetch(self, work: DataFrame) -> DataFrame:
        spec = self.spec
        joined = work.join(
            self.web, work["url"] == self.web["_w_url"], "left"
        ).drop("_w_url")
        # unresolvable URL = connection error → status 0, like a dead socket
        joined = joined.withColumn("status", F.coalesce(F.col("status"), F.lit(0)))

        # F10: receive body only when status 200-299 AND content-type
        # matches a receive rule (PHPCrawlerHTTPRequest:1150-1174, gate :1167)
        ct = F.coalesce(F.col("content_type"), F.lit(""))
        received = (
            F.col("status").between(200, 299)
            & _rlike_any(ct, spec.content_type_receive_rules)
        )
        joined = joined.withColumn("received", received)
        joined = joined.withColumn(
            "bytes_received",
            F.when(F.col("received"), F.length(F.col("body"))).otherwise(F.lit(0)),
        )
        # F11: only parse links out of link-search content types
        searchable = _rlike_any(ct, spec.link_search_content_types)
        joined = joined.withColumn(
            "body_text",
            F.when(
                F.col("received") & searchable,
                decode_body_udf(F.col("body"), F.col("content_type")),
            ).otherwise(F.lit(None).cast("string")),
        )
        # redirect target only surfaces for 3xx (E5)
        joined = joined.withColumn(
            "redirect_to",
            F.when(F.col("status").between(300, 399), F.col("redirect_to")),
        )
        return joined


class HttpFetcher:
    """Real HTTP fetch via mapInPandas (S5). NOT exercised in the sandbox
    (no egress); written to the production shape: iterator-of-batches,
    per-partition DNS/session reuse (P11), retry budget (P9), content-type
    receive gate before body read (F10)."""

    def __init__(self, spec: CrawlSpec, timeout_s: float = 10.0):
        self.spec = spec
        self.timeout_s = timeout_s

    def fetch(self, work: DataFrame) -> DataFrame:
        spec, timeout = self.spec, self.timeout_s
        recv_rules = [php_regex_to_std(r) for r in spec.content_type_receive_rules]

        out_schema = T.StructType(
            work.schema.fields
            + [
                T.StructField("status", T.IntegerType()),
                T.StructField("content_type", T.StringType()),
                T.StructField("redirect_to", T.StringType()),
                T.StructField("body", T.BinaryType()),
                T.StructField("latency_ms", T.IntegerType()),
            ]
        )

        def _fetch_batches(batches):
            import socket
            import time
            import urllib.request

            compiled = [re.compile(r, re.I) for r in recv_rules]

            # P11: per-partition DNS memoization (the reference caches
            # host→IP per process, PHPCrawlerDNSCache.class.php:26-41).
            # Monkey-patching getaddrinfo inside the worker scopes the
            # cache to this partition's python process.
            dns_cache: dict = {}
            real_getaddrinfo = socket.getaddrinfo

            def cached_getaddrinfo(host, *args, **kw):
                key = (host, args[0] if args else None)
                if key not in dns_cache:
                    dns_cache[key] = real_getaddrinfo(host, *args, **kw)
                return dns_cache[key]

            socket.getaddrinfo = cached_getaddrinfo
            for pdf in batches:
                rows = {
                    "status": [], "content_type": [], "redirect_to": [],
                    "body": [], "latency_ms": [],
                }
                for url in pdf["url"]:
                    status, ctype, redirect, body = 0, None, None, None
                    t0 = time.perf_counter()
                    for _attempt in range(spec.retry_limit):
                        try:
                            req = urllib.request.Request(
                                url, headers={"User-Agent": spec.user_agent}
                            )
                            with urllib.request.urlopen(req, timeout=timeout) as resp:
                                status = resp.status
                                ctype = resp.headers.get("Content-Type")
                                redirect = resp.headers.get("Location")
                                if ctype and any(rx.search(ctype) for rx in compiled):
                                    body = resp.read()
                            if 100 <= status <= 400:
                                break
                        except Exception:
                            status = 0
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["redirect_to"].append(redirect)
                    rows["body"].append(body)
                    rows["latency_ms"].append(
                        int((time.perf_counter() - t0) * 1000)
                    )
                yield pd.concat(
                    [pdf.reset_index(drop=True), pd.DataFrame(rows)], axis=1
                )

        fetched = work.mapInPandas(_fetch_batches, out_schema)
        ct = F.coalesce(F.col("content_type"), F.lit(""))
        received = F.col("status").between(200, 299) & _rlike_any(
            ct, spec.content_type_receive_rules
        )
        return (
            fetched.withColumn("received", received)
            .withColumn(
                "bytes_received",
                F.when(received, F.length("body")).otherwise(F.lit(0)),
            )
            .withColumn(
                "body_text",
                F.when(
                    received & _rlike_any(ct, spec.link_search_content_types),
                    decode_body_udf(F.col("body"), F.col("content_type")),
                ),
            )
            .withColumn(
                "redirect_to",
                F.when(F.col("status").between(300, 399), F.col("redirect_to")),
            )
        )
