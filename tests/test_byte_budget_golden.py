"""Bandwidth politeness (spec.host_byte_budget, scheduler.byte_budgets):
engine==simulator golden parity, throttling dynamics on the heavy/light
host fixture, and the operator's exact-integer budget math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    HOST_BB_BIG,
    HOST_BB_SMALL,
    bytebudget_spec,
    make_bytebudget_webgraph,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.operators.scheduler import byte_budgets
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

pytestmark = pytest.mark.usefixtures("spark")


def test_byte_budget_golden_parity(spark):
    spec = bytebudget_spec()
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_bytebudget_webgraph()), spec),
    )
    res = engine.run(max_rounds=100)
    rows = (
        res.trace.select("seq", "url", "url_md5", "status", "n_attempts")
        .orderBy("seq").collect()
    )
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    # throttling dynamics: once the heavy host's ~2 KB mean is observed,
    # its budget collapses to 1/round (3000*n//sum), so its final detail
    # lands in a LATER round than the light host's — the light host
    # finishes all 6 pages before the heavy host does
    last_big = max(r["seq"] for r in rows if HOST_BB_BIG in r["url"])
    last_small = max(r["seq"] for r in rows if HOST_BB_SMALL in r["url"])
    assert last_big == len(rows) - 1
    assert last_small < last_big


def test_byte_budget_off_control(spark):
    # flag off: both hosts run at the full per-host budget and finish
    # in the same round — identical pop multiset, different schedule
    spec = bytebudget_spec(host_byte_budget=0)
    golden = simulate_reference_crawl(make_bytebudget_webgraph(), spec)
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_bytebudget_webgraph()), spec),
    )
    rows = (
        engine.run(max_rounds=100)
        .trace.select("seq", "url", "status").orderBy("seq").collect()
    )
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]


def test_byte_budgets_operator_math(spark):
    # exact integer math incl. the all-failures host (sum 0 -> default)
    # and the unknown host (absent from the dim)
    pages = spark.createDataFrame(
        [
            ("a.test", 2000), ("a.test", 1000),   # mean 1500
            ("b.test", 10), ("b.test", 0),        # failures count, 0 bytes
            ("c.test", 0), ("c.test", 0),         # nothing received yet
        ],
        "host string, bytes_received long",
    )
    got = {
        r["host"]: r
        for r in byte_budgets(
            pages, byte_budget=3000, default_budget=7, max_budget=7
        ).collect()
    }
    assert got["a.test"]["host_budget"] == 2      # 3000*2 // 3000
    assert got["b.test"]["host_budget"] == 7      # 3000*2 // 10 = 600 -> cap
    assert got["c.test"]["host_budget"] == 7      # sum 0 -> default
    # floor never starves: a huge observed mean still yields budget 1
    big = spark.createDataFrame(
        [("d.test", 10_000_000)], "host string, bytes_received long"
    )
    r = byte_budgets(big, 3000, default_budget=7, max_budget=7).collect()[0]
    assert r["host_budget"] == 1
