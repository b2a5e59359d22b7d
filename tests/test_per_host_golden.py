"""Per-host politeness golden (SURVEY.md §2.5 P8 at scale).

The mode a large crawl actually runs: ``per_host_politeness=True`` makes
``budget_per_round`` a PER-HOST budget, so a round over H eligible hosts
fetches up to B×H pages — generalizing the reference's global budget
(PHPCrawler.class.php:906-925) without a shared clock. Round-2 VERDICT
found this path mis-capped (global cap applied unconditionally) and
ranked through a single-partition window; these goldens pin the fixed
contract:

- pop-order parity with the reference-semantics simulator running the
  same per-host round contract (deterministic host interleave);
- a steady round fetches B × n_hosts pages, not B;
- request_limit still caps the global total;
- the engine's physical plan contains no unbounded single-partition
  window (every WindowExec is partitioned or fed by a ≤B-row input).
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    make_multihost_webgraph,
    multihost_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

N_HOSTS = 4
CHAIN = 3
WEB = make_multihost_webgraph(n_hosts=N_HOSTS, chain_len=CHAIN)

_cache = {}


def run_engine(spark, spec, max_rounds=40):
    key = (spec.request_limit, spec.round_duration_s)
    if key not in _cache:
        web_df = webgraph_df(spark, WEB)
        engine = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec))
        _cache[key] = engine.run(max_rounds=max_rounds)
    return _cache[key]


def trace_rows(result):
    return [
        (r["seq"], r["url"], r["url_md5"], r["depth"], r["status"])
        for r in result.trace.orderBy("seq").collect()
    ]


def golden_rows(golden):
    return [
        (t["seq"], t["url"], t["url_md5"], t["depth"], t["status"])
        for t in golden
    ]


class TestPerHostGolden:
    def test_trace_matches_simulator(self, spark):
        spec = multihost_spec(per_host_budget=2)
        golden = simulate_reference_crawl(WEB, spec)
        result = run_engine(spark, spec)
        assert trace_rows(result) == golden_rows(golden)

    def test_round_fetches_budget_times_hosts(self, spark):
        """The cap bug: a round over H hosts must fetch B×H pages, not B."""
        spec = multihost_spec(per_host_budget=2)
        result = run_engine(spark, spec)
        per_round = {
            r["round"]: r["n"]
            for r in result.pages.groupBy("round").agg(F.count("*").alias("n")).collect()
        }
        # steady state: all N_HOSTS host chains have ≥B pending pages
        assert max(per_round.values()) == 2 * N_HOSTS
        # and the whole fixture drains (nothing starved by a global cap):
        # hub + per host (root + p1..pCHAIN + s0..sCHAIN)
        assert result.pages_fetched == 1 + N_HOSTS * (2 * CHAIN + 2)

    def test_host_interleave_within_round(self, spark):
        """Fetch order inside a round: every host's first pick before any
        host's second pick (pop_rank ASC, then insert order)."""
        spec = multihost_spec(per_host_budget=2)
        result = run_engine(spark, spec)
        rows = result.pages.select("round", "seq", "host").orderBy("seq").collect()
        by_round = {}
        for r in rows:
            by_round.setdefault(r["round"], []).append(r["host"])
        steady = [hosts for hosts in by_round.values() if len(hosts) == 2 * N_HOSTS]
        assert steady, "expected at least one full-budget round"
        for hosts in steady:
            first, second = hosts[:N_HOSTS], hosts[N_HOSTS:]
            assert sorted(first) == sorted(set(first)), "tier-1 has a repeat host"
            assert sorted(second) == sorted(set(second))

    def test_request_limit_caps_global_total(self, spark):
        spec = multihost_spec(per_host_budget=2, request_limit=7)
        golden = simulate_reference_crawl(WEB, spec)
        result = run_engine(spark, spec)
        assert len(golden) == 7
        assert result.pages_fetched == 7
        assert trace_rows(result) == golden_rows(golden)

    def test_no_unpartitioned_window_in_plan(self, spark):
        """The r2 defect: fetch_rank ranked the whole work list through
        Window.orderBy() with no partition. The fixed plan must carry a
        partition spec on every window over the work list."""
        from lightcrawler_spark.operators import scheduler

        frontier = spark.range(2000).select(
            F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                     F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
            F.concat(F.lit("h"), (F.col("id") % 50).cast("string"),
                     F.lit(".test")).alias("host"),
            F.lit(0).alias("priority_level"),
            F.col("id").alias("insert_seq"),
        )
        work = scheduler.interleave_rank(scheduler.pop_per_host(frontier, 3))
        plan = work._jdf.queryExecution().executedPlan().toString()
        import re

        specs = list(re.finditer(r"windowspecdefinition\(([^)]*)\)", plan))
        assert specs, "expected window operators in the per-host plan"
        for spec_m in specs:
            # partition-less spec starts with an ORDER expression:
            #   windowspecdefinition(<col> ASC NULLS FIRST, frame...)
            # partitioned: windowspecdefinition(<partition col(s)>, <order> ...)
            first_arg = spec_m.group(1).split(",")[0].strip()
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                f"unpartitioned window in plan: {spec_m.group(0)}"
            )
        assert work.count() == 150  # 50 hosts × budget 3
