"""Frontier TTL (spec.frontier_ttl_rounds): engine==simulator golden
parity, expiry dynamics at budget 1, the flag-off control, and the
revisit exemption."""

from __future__ import annotations

import pytest

from lightcrawler_spark.fixtures import (
    conditional_spec,
    make_conditional_webgraph,
    make_ttl_webgraph,
    simulate_reference_crawl,
    ttl_spec,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, spec, web):
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec)
    )
    return (
        engine.run(max_rounds=60)
        .trace.select("seq", "url", "status").orderBy("seq").collect()
    )


def test_ttl_golden_parity_and_expiry(spark):
    spec = ttl_spec()
    golden = simulate_reference_crawl(make_ttl_webgraph(), spec)
    rows = _run(spark, spec, make_ttl_webgraph())
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    # budget 1, ttl 3: the round-1 discoveries (packed round 2) are
    # poppable rounds 2..5 — d0..d3 fetch, d4/d5 expire unfetched
    urls = {r["url"] for r in rows}
    assert len(rows) == 5
    assert "http://www.site-ttl.test/d3.htm" in urls
    assert "http://www.site-ttl.test/d4.htm" not in urls


def test_ttl_off_control(spark):
    spec = ttl_spec(frontier_ttl_rounds=0)
    golden = simulate_reference_crawl(make_ttl_webgraph(), spec)
    rows = _run(spark, spec, make_ttl_webgraph())
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    assert len(rows) == 7  # everything fetches without expiry


def test_ttl_revisits_exempt(spark):
    # conditional fixture + a TTL shorter than the revisit delay: the
    # revisit rows (1<<61 seq offset -> far-future packed round) must
    # still fire; only FRESH rows age out
    spec = conditional_spec(frontier_ttl_rounds=2)
    golden = simulate_reference_crawl(make_conditional_webgraph(), spec)
    rows = _run(spark, spec, make_conditional_webgraph())
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    assert any(r["status"] == 304 for r in rows)
