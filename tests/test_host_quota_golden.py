"""Lifetime per-host quotas (spec.host_page_cap / host_byte_cap — the
Heritrix maxDocsPerHost analog): engine==simulator golden parity,
quota dynamics on the heavy/light host fixture, off-control."""

from __future__ import annotations

import pytest

from lightcrawler_spark.fixtures import (
    HOST_BB_BIG,
    HOST_BB_SMALL,
    bytebudget_spec,
    make_bytebudget_webgraph,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, spec):
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_bytebudget_webgraph()), spec),
    )
    return (
        engine.run(max_rounds=60)
        .trace.select("seq", "url", "status").orderBy("seq").collect()
    )


def _counts(rows):
    c = {}
    for r in rows:
        for h in (HOST_BB_BIG, HOST_BB_SMALL):
            if h in r["url"]:
                c[h] = c.get(h, 0) + 1
    return c


def test_page_cap_golden_parity(spark):
    # page cap 3 at per-host budget 3: round 1 claims the root, round 2
    # adds a full budget (BSP overshoot — eligibility is decided on
    # committed totals at round start), round 3 sees 4 >= 3 -> capped
    spec = bytebudget_spec(host_byte_budget=0, host_page_cap=3)
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    rows = _run(spark, spec)
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    c = _counts(rows)
    assert c[HOST_BB_BIG] == 4 and c[HOST_BB_SMALL] == 4


def test_byte_cap_golden_parity(spark):
    # byte cap 3000: the heavy host (~2 KB pages) caps after its second
    # content page; the light host (~40 B) never comes close
    spec = bytebudget_spec(host_byte_budget=0, host_byte_cap=3000)
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    rows = _run(spark, spec)
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    c = _counts(rows)
    assert c[HOST_BB_BIG] < 6
    assert c[HOST_BB_SMALL] == 6


def test_caps_off_control(spark):
    spec = bytebudget_spec(host_byte_budget=0)
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    rows = _run(spark, spec)
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    c = _counts(rows)
    assert c[HOST_BB_BIG] == 6 and c[HOST_BB_SMALL] == 6


def test_combined_features_golden(spark):
    # conditional-GET + byte budgets + frontier TTL + page quotas, all
    # on at once: interaction is where politeness bugs hide, and the
    # trace must still match the simulator pop for pop
    from lightcrawler_spark.fixtures import (
        combined_spec,
        make_combined_webgraph,
    )

    spec = combined_spec()
    golden = simulate_reference_crawl(make_combined_webgraph(), spec)
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_combined_webgraph()), spec),
    )
    rows = (
        engine.run(max_rounds=100)
        .trace.select("seq", "url", "status", "bytes_received")
        .orderBy("seq").collect()
    )
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    # each feature visibly fired: 304s exist (conditional), the heavy
    # host's schedule stretched past the light host's (byte budgets),
    # and revisits happened (trace longer than the 12-page web)
    assert any(r["status"] == 304 for r in rows)
    assert all(r["bytes_received"] == 0 for r in rows if r["status"] == 304)
    assert len(rows) > 12
    last_big = max(r["seq"] for r in rows if HOST_BB_BIG in r["url"])
    last_small = max(r["seq"] for r in rows if HOST_BB_SMALL in r["url"])
    assert last_big > last_small


def test_capped_revisits_drain_not_spin(spark):
    # a quota-capped host with unconsumed revisit budget must DRAIN,
    # not idle-spin to max_rounds: _future_revisits excludes capped
    # hosts (and the simulator's idle check mirrors it)
    from lightcrawler_spark.fixtures import make_bytebudget_webgraph

    spec = bytebudget_spec(
        host_byte_budget=0, host_page_cap=3,
        revisit_url_rules=[r"#/d\d# i"],
        revisit_after_rounds=5, max_revisits=1,
    )
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_bytebudget_webgraph()), spec),
    )
    res = engine.run(max_rounds=30)
    rows = res.trace.select("seq", "url", "status").orderBy("seq").collect()
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    # both hosts cap at 4 pages before any revisit matures; the crawl
    # must end well under the round bound (drain, not the backstop)
    assert len(rows) == 8
    assert res.rounds_run < 10
    assert res.abort_reason == "passedthrough"
