"""Adaptive throttle backoff (P8 extension): hosts answering 429/503
sit out the next ceil(Retry-After / round_duration) BSP rounds (or
default_backoff_rounds without the header). The reference drops
throttled pages like any >400 status and never defers the host; the
north-star politeness scheduler needs the deferral, so it's an
extension gated off by default (reference parity), golden-tested
engine == simulator in the per-host scale mode.
"""

from collections import Counter
from urllib.parse import urlsplit

import pytest

from lightcrawler_spark.fixtures import (
    _page_row,
    make_multihost_webgraph,
    multihost_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

B = 2  # per-host budget → round_duration_s = 10


def _throttle_web():
    """3 hosts; m0/p1 429s with Retry-After 20 s (= 2 rounds at
    duration 10), m1/p1 503s with no header (default backoff 1 round);
    extra leaves on both roots keep the blocked hosts' frontiers
    non-empty through the backoff window so the deferral is visible."""
    web = make_multihost_webgraph(n_hosts=3, chain_len=3)
    for p in web:
        if p["url"] == "http://www.m0.test/p1.htm":
            p["status"] = 429
            p["retry_after"] = 20
        if p["url"] == "http://www.m1.test/p1.htm":
            p["status"] = 503
    for h in (0, 1):
        root = f"http://www.m{h}.test"
        for p in web:
            if p["url"] == root:
                p["body"] = (
                    p["body"].decode("utf-8").replace(
                        "</body>",
                        "".join(
                            f'<a href="/l{i}.htm">leaf {i}</a>'
                            for i in range(6)
                        )
                        + "</body>",
                    )
                ).encode("utf-8")
        for i in range(6):
            web.append(
                _page_row(f"{root}/l{i}.htm", "<html><body>x</body></html>")
            )
    return web


WEB = _throttle_web()


@pytest.fixture(scope="module")
def run(spark):
    spec = multihost_spec(per_host_budget=B, retry_after_backoff=True)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, WEB), spec)
    )
    result = engine.run(max_rounds=40)
    golden = simulate_reference_crawl(WEB, spec)
    return result, golden


def _host_rounds(result):
    rows = result.trace.select("round", "url").collect()
    by_host: dict[str, list[int]] = {}
    for r in rows:
        by_host.setdefault(urlsplit(r["url"]).hostname, []).append(r["round"])
    return {h: sorted(set(v)) for h, v in by_host.items()}


class TestRetryAfterBackoffGolden:
    def test_trace_matches_simulator(self, run):
        result, golden = run
        got = [
            (r["seq"], r["url"], r["depth"], r["status"], r["n_attempts"])
            for r in result.trace.orderBy("seq").collect()
        ]
        want = [
            (t["seq"], t["url"], t["depth"], t["status"], t["n_attempts"])
            for t in golden
        ]
        assert got == want

    def test_declared_wait_blocks_two_rounds(self, run):
        result, _ = run
        rounds = _host_rounds(result)["www.m0.test"]
        thr = next(
            r["round"]
            for r in result.trace.filter("status = 429").collect()
        )
        # Retry-After 20 at duration 10 → rounds thr+1, thr+2 are silent
        assert thr + 1 not in rounds and thr + 2 not in rounds
        assert thr + 3 in rounds  # work resumes exactly after the wait

    def test_default_wait_blocks_one_round(self, run):
        result, _ = run
        rounds = _host_rounds(result)["www.m1.test"]
        thr = next(
            r["round"]
            for r in result.trace.filter("status = 503").collect()
        )
        assert thr + 1 not in rounds
        assert thr + 2 in rounds

    def test_other_hosts_uninterrupted(self, run):
        result, _ = run
        rounds = _host_rounds(result)["www.m2.test"]
        assert rounds == list(range(rounds[0], rounds[-1] + 1))

    def test_throttled_url_not_requeued(self, run):
        # reference P9 parity: the 429'd URL was consumed (inline
        # retries already ran) — backoff defers the HOST, not the URL
        result, _ = run
        n = result.trace.filter(
            "url = 'http://www.m0.test/p1.htm'"
        ).count()
        assert n == 1

    def test_budget_respected_every_round(self, run):
        result, _ = run
        per = Counter(
            (r["round"], urlsplit(r["url"]).hostname)
            for r in result.trace.select("round", "url").collect()
        )
        assert all(n <= B for n in per.values())


class TestFlagOff:
    def test_no_gap_without_the_flag(self, spark):
        spec = multihost_spec(per_host_budget=B)  # backoff off (default)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, WEB), spec)
        )
        result = engine.run(max_rounds=40)
        golden = simulate_reference_crawl(WEB, spec)
        got = [(r["seq"], r["url"]) for r in result.trace.orderBy("seq").collect()]
        assert got == [(t["seq"], t["url"]) for t in golden]
        rounds = _host_rounds(result)["www.m0.test"]
        assert rounds == list(range(rounds[0], rounds[-1] + 1))
