"""P7 revisit scheduling golden (spec.revisit_url_rules → engine ==
simulator): matching URLs re-enter the frontier after
revisit_after_rounds, up to max_revisits times, carrying their original
row attributes and ranking AFTER fresh discovery; the crawl idles
through immature revisits instead of draining early.
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.fixtures import (
    HOST_RV as HOST,
    make_revisit_webgraph as make_web,
    revisit_spec as make_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

ROOT = f"http://{HOST}"


def run_engine(spark, spec, max_rounds=40):
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, make_web()), spec)
    )
    return engine.run(max_rounds=max_rounds)


def tuples(rows):
    return [(t["seq"], t["url"], t["depth"], t["referer"], t["status"])
            for t in rows]


@pytest.fixture(scope="module")
def revisit_run(spark):
    spec = make_spec()
    golden = simulate_reference_crawl(make_web(), spec)
    result = run_engine(spark, spec)
    return golden, result


class TestRevisitGolden:
    def test_trace_matches_simulator(self, revisit_run):
        golden, result = revisit_run
        assert tuples(result.trace.orderBy("seq").collect()) == tuples(
            golden
        )

    def test_list_page_fetched_exactly_twice(self, revisit_run):
        golden, result = revisit_run
        urls = [t["url"] for t in golden]
        assert urls.count(f"{ROOT}/list/index.htm") == 2
        # everything else exactly once
        for u in (ROOT, f"{ROOT}/about.htm", f"{ROOT}/d1.htm",
                  f"{ROOT}/d2.htm"):
            assert urls.count(u) == 1

    def test_revisit_age_and_attrs(self, revisit_run):
        golden, result = revisit_run
        rows = result.pages.filter(
            F.col("url") == f"{ROOT}/list/index.htm"
        ).orderBy("seq").collect()
        assert len(rows) == 2
        first, second = rows
        assert second["round"] - first["round"] >= 2  # aged
        assert second["depth"] == first["depth"]      # original attrs
        assert second["referer"] == first["referer"]
        assert second["insert_seq"] == (1 << 61) + first["insert_seq"]

    def test_flag_off_single_fetches(self, spark):
        spec = CrawlSpec(seeds=[ROOT], max_depth=3)
        result = run_engine(spark, spec)
        urls = [r["url"] for r in result.trace.collect()]
        assert urls.count(f"{ROOT}/list/index.htm") == 1

    def test_max_revisits_bounds_refetches(self, spark):
        spec = make_spec()
        spec.max_revisits = 2
        golden = simulate_reference_crawl(make_web(), spec)
        result = run_engine(spark, spec, max_rounds=60)
        urls = [t["url"] for t in golden]
        assert urls.count(f"{ROOT}/list/index.htm") == 3  # 1 + 2 revisits
        assert tuples(result.trace.orderBy("seq").collect()) == tuples(
            golden
        )
