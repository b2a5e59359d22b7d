"""politeness_audit over a REAL engine run: the per-host golden crawl
must audit clean at its own budget, and the audit must actually detect
violations (tighter budget / per-host override)."""

from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    make_multihost_webgraph,
    multihost_spec,
    webgraph_df,
)
from lightcrawler_spark.operators.scheduler import politeness_audit
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

import pytest


@pytest.fixture(scope="module")
def engine_trace(spark):
    spec = multihost_spec(per_host_budget=2)
    web = make_multihost_webgraph(n_hosts=4, chain_len=3)
    engine = CrawlEngine(spark, spec, SyntheticFetcher(
        webgraph_df(spark, web), spec))
    result = engine.run(max_rounds=40)
    return result.pages.select("round", "url")


def test_engine_run_audits_clean_at_its_budget(spark, engine_trace):
    audit = politeness_audit(engine_trace, per_host_budget=2)
    assert audit.filter(F.col("exceeded")).count() == 0
    # and the audit saw real multi-fetch rounds (not vacuous)
    assert audit.filter(F.col("n_fetches") == 2).count() > 0


def test_audit_detects_violations_at_tighter_budget(spark, engine_trace):
    audit = politeness_audit(engine_trace, per_host_budget=1)
    assert audit.filter(F.col("exceeded")).count() > 0


def test_host_override_is_respected(spark, engine_trace):
    # a host that actually had a 2-fetch round (the seed hub only ever
    # gets one), so the tighter override is guaranteed to flag it
    base = politeness_audit(engine_trace, per_host_budget=2)
    host = base.filter(F.col("n_fetches") == 2).first()["host"]
    overrides = spark.createDataFrame(
        [(host, 1)], "host string, host_budget int"
    )
    audit = politeness_audit(
        engine_trace, per_host_budget=2, host_budgets=overrides
    )
    flagged = audit.filter(F.col("exceeded"))
    assert flagged.count() > 0
    assert {r["host"] for r in flagged.collect()} == {host}
    assert audit.filter(
        (F.col("host") == host) & (F.col("budget") != 1)
    ).count() == 0
