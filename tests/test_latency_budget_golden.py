"""Latency-adaptive per-host budgets (P8 extension) — engine golden.

With ``per_host_politeness + adaptive_latency_budgets`` a host's
next-round budget becomes min(B, max(1, floor(round_ms·n/Σms))) from
its own persisted fetch latencies: slow hosts self-throttle, fast hosts
keep the configured budget. Engine == simulator pop-for-pop; per-round
per-host counts respect each host's learned budget once history exists;
flag off ⇒ uniform budgets (reference parity).
"""

from collections import Counter
from urllib.parse import urlsplit

import pytest

from lightcrawler_spark.fixtures import (
    make_multihost_webgraph,
    multihost_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


def _web():
    web = make_multihost_webgraph(n_hosts=4, chain_len=3)
    # controlled latencies: m0 pathologically slow, m1 sluggish, rest
    # fast. round_duration = 15 s (per_host_budget 3 × delay 5) →
    # adaptive budgets once history exists: m0 floor(15000/20000)=0→1,
    # m1 floor(15000/6000)=2, m2/m3 huge→capped at 3.
    for p in web:
        host = urlsplit(p["url"]).hostname or ""
        if host == "www.m0.test":
            p["latency_ms"] = 20000
        elif host == "www.m1.test":
            p["latency_ms"] = 6000
    return web


WEB = _web()
EXPECT_STEADY = {"www.m0.test": 1, "www.m1.test": 2,
                 "www.m2.test": 3, "www.m3.test": 3}


@pytest.fixture(scope="module")
def run(spark):
    spec = multihost_spec(per_host_budget=3, adaptive_latency_budgets=True)
    engine = CrawlEngine(spark, spec, SyntheticFetcher(webgraph_df(spark, WEB), spec))
    result = engine.run(max_rounds=40)
    golden = simulate_reference_crawl(WEB, spec)
    return result, golden


class TestLatencyBudgetGolden:
    def test_trace_matches_simulator(self, run):
        result, golden = run
        got = [(r["seq"], r["url"], r["depth"], r["status"])
               for r in result.trace.orderBy("seq").collect()]
        want = [(t["seq"], t["url"], t["depth"], t["status"])
                for t in golden]
        assert got == want

    def test_learned_budgets_bind_after_history(self, run):
        result, _ = run
        rows = result.trace.select("round", "url").collect()
        per = Counter((r["round"], urlsplit(r["url"]).hostname) for r in rows)
        first_seen = {}
        for (rnd, host), _n in sorted(per.items()):
            first_seen.setdefault(host, rnd)
        for (rnd, host), n in per.items():
            if host in EXPECT_STEADY and rnd > first_seen[host]:
                assert n <= EXPECT_STEADY[host], (rnd, host, n)
        # the slow host is actually throttled below the chain fixture's
        # un-throttled release ceiling of 2/round — the override binds
        later_m0 = [n for (rnd, h), n in per.items()
                    if h == "www.m0.test" and rnd > first_seen["www.m0.test"]]
        assert later_m0 and max(later_m0) == 1
        # fast hosts keep the full budget in some round (no over-throttle)
        assert max(n for (_, h), n in per.items() if h == "www.m2.test") >= 2

    def test_flag_off_uniform(self, spark):
        spec = multihost_spec(per_host_budget=3,
                              adaptive_latency_budgets=False)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, WEB), spec))
        result = engine.run(max_rounds=40)
        golden = simulate_reference_crawl(WEB, spec)
        got = [(r["seq"], r["url"])
               for r in result.trace.orderBy("seq").collect()]
        assert got == [(t["seq"], t["url"]) for t in golden]
        per = Counter(
            (r["round"], urlsplit(r["url"]).hostname)
            for r in result.trace.select("round", "url").collect())
        # slow host is NOT throttled without the flag (release ceiling 2)
        assert max(n for (_, h), n in per.items()
                   if h == "www.m0.test") == 2
