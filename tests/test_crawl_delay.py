"""Robots Crawl-delay → per-host budgets (P8 extension).

The reference parser honors only Disallow
(PHPCrawlerRobotsTxtParser.class.php:63-151); the north-star politeness
scheduler budgets per host, and Crawl-delay is the standard per-host
budget signal, so with ``per_host_politeness + honor_crawl_delay`` a
host declaring "Crawl-delay: D" gets floor(round_duration/D) fetches
per round (min 1) instead of the default per-host budget. Off by
default (reference parity). Engine == simulator pop-for-pop, and the
per-round per-host fetch counts respect each host's own budget.
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    make_multihost_webgraph,
    multihost_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.operators.admission import parse_robots_crawl_delay
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

N_HOSTS = 4
WEB = make_multihost_webgraph(n_hosts=N_HOSTS, chain_len=3)

# budgets at round_duration 15 (per_host_budget=3 × delay 5):
#   m0: Crawl-delay 15  → floor(15/15) = 1
#   m1: Crawl-delay 7.5 → floor(15/7.5) = 2
#   m2, m3: no declaration → default 3
ROBOTS = [
    ("www.m0.test", "User-agent: *\nCrawl-delay: 15\n"),
    ("www.m1.test", "User-agent: *\nCrawl-delay: 7.5\n"),
]
EXPECT_BUDGET = {"www.m0.test": 1, "www.m1.test": 2,
                 "www.m2.test": 3, "www.m3.test": 3, "hub.m.test": 3}


class TestParseCrawlDelay:
    def test_star_section(self):
        assert parse_robots_crawl_delay(
            "User-agent: *\nCrawl-delay: 10", "PHPCrawl") == 10.0

    def test_ua_specific_section(self):
        body = "User-agent: other\nCrawl-delay: 99\n\nUser-agent: PHPCrawl\nCrawl-delay: 3"
        assert parse_robots_crawl_delay(body, "PHPCrawl") == 3.0
        assert parse_robots_crawl_delay(body, "other") == 99.0

    def test_last_applicable_wins(self):
        body = "User-agent: *\nCrawl-delay: 5\nUser-agent: PHPCrawl\nCrawl-delay: 2"
        assert parse_robots_crawl_delay(body, "PHPCrawl") == 2.0

    def test_malformed_and_nonpositive_ignored(self):
        assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: soon", "x") is None
        assert parse_robots_crawl_delay("User-agent: *\nCrawl-delay: -1", "x") is None
        assert parse_robots_crawl_delay("User-agent: *\nDisallow: /x", "x") is None
        assert parse_robots_crawl_delay(None, "x") is None

    def test_delay_outside_any_section_ignored(self):
        assert parse_robots_crawl_delay("Crawl-delay: 10", "x") is None


class TestPopPerHostBudgetDim:
    def test_override_and_default(self, spark):
        from lightcrawler_spark.operators import scheduler

        frontier = spark.createDataFrame(
            [(f"h{i % 3}", i, 0) for i in range(30)],
            "host string, insert_seq long, priority_level int",
        )
        budgets = spark.createDataFrame(
            [("h0", 1), ("h1", 4)], "host string, host_budget int"
        )
        got = (
            scheduler.pop_per_host(frontier, 2, host_budgets=budgets)
            .groupBy("host").count().collect()
        )
        counts = {r["host"]: r["count"] for r in got}
        assert counts == {"h0": 1, "h1": 4, "h2": 2}

    def test_none_dim_is_plain_budget(self, spark):
        from lightcrawler_spark.operators import scheduler

        frontier = spark.createDataFrame(
            [(f"h{i % 3}", i, 0) for i in range(30)],
            "host string, insert_seq long, priority_level int",
        )
        got = scheduler.pop_per_host(frontier, 2).groupBy("host").count().collect()
        assert {r["count"] for r in got} == {2}


@pytest.fixture(scope="module")
def run(spark):
    spec = multihost_spec(
        per_host_budget=3, obey_robots_txt=True, honor_crawl_delay=True
    )
    web_df = webgraph_df(spark, WEB)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(web_df, spec), robots_fixture=ROBOTS
    )
    result = engine.run(max_rounds=30)
    golden = simulate_reference_crawl(WEB, spec, robots=ROBOTS)
    return result, golden


class TestCrawlDelayGolden:
    def test_trace_matches_simulator(self, run):
        result, golden = run
        got = [
            (r["seq"], r["url"], r["depth"], r["status"])
            for r in result.trace.orderBy("seq").collect()
        ]
        want = [
            (t["seq"], t["url"], t["depth"], t["status"]) for t in golden
        ]
        assert got == want

    def test_per_round_counts_respect_host_budgets(self, run):
        result, _ = run
        rows = result.trace.select("round", "url").collect()
        from collections import Counter
        from urllib.parse import urlsplit

        per = Counter(
            (r["round"], urlsplit(r["url"]).hostname) for r in rows
        )
        assert per, "empty trace"
        for (rnd, host), n in per.items():
            assert n <= EXPECT_BUDGET[host], (rnd, host, n)
        # the throttled host actually hits its (smaller) budget in some
        # steady round — the override is doing work, not idling. The
        # chain fixture releases at most 2 new URLs per host per round,
        # so 2 is the un-throttled per-round ceiling here; m0's cap of 1
        # below it proves the override binds.
        assert max(n for (_, h), n in per.items() if h == "www.m0.test") == 1
        assert max(n for (_, h), n in per.items() if h == "www.m1.test") == 2
        assert max(n for (_, h), n in per.items() if h == "www.m2.test") == 2

    def test_flag_off_means_uniform_budgets(self, spark):
        spec = multihost_spec(
            per_host_budget=3, obey_robots_txt=True, honor_crawl_delay=False
        )
        web_df = webgraph_df(spark, WEB)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(web_df, spec), robots_fixture=ROBOTS
        )
        result = engine.run(max_rounds=30)
        golden = simulate_reference_crawl(WEB, spec, robots=ROBOTS)
        got = [(r["seq"], r["url"]) for r in result.trace.orderBy("seq").collect()]
        assert got == [(t["seq"], t["url"]) for t in golden]
        from collections import Counter
        from urllib.parse import urlsplit

        per = Counter(
            (r["round"], urlsplit(r["url"]).hostname)
            for r in result.trace.select("round", "url").collect()
        )
        # un-throttled ceiling (release rate 2/round) — above the
        # honor_crawl_delay cap of 1, proving the flag gates the override
        assert max(n for (_, h), n in per.items() if h == "www.m0.test") == 2
