"""Golden-trace parity (SURVEY.md §5, FIXTURES.md §5): the Spark BSP
engine must reproduce the reference-semantics simulator's crawl order and
final URL-seen set under the same seed list + politeness budget.

budget=1 → the BSP engine is row-for-row identical to the reference's
sequential (number_of_process=1) pop order; budget=4 → rounds batch the
same deterministic contract.

Engine runs are cached per spec (each is a full multi-round crawl) so
the module runs each configuration exactly once.
"""

import pytest

from lightcrawler_spark.fixtures import (
    ROBOTS_FIXTURE,
    default_spec,
    make_images,
    make_webgraph,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

# small graph: 2 lists × 2 details keeps the sequential crawl ~17 pops
WEB = make_webgraph(n_lists=2, details_per_list=2, images=make_images(8))

_run_cache = {}
_webdf_cache = {}


def _webdf(spark):
    if "df" not in _webdf_cache:
        _webdf_cache["df"] = webgraph_df(spark, WEB).cache()
    return _webdf_cache["df"]


def run_engine(spark, spec, max_rounds=100):
    key = (
        spec.max_depth, spec.request_limit, spec.round_duration_s,
        tuple(spec.priority_rules), spec.follow_mode,
    )
    if key in _run_cache:
        return _run_cache[key]
    _webdf(spark)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(_webdf_cache["df"], spec),
        robots_fixture=ROBOTS_FIXTURE,
    )
    result = engine.run(max_rounds=max_rounds)
    _run_cache[key] = result
    return result


def trace_rows(result):
    return [
        (r["seq"], r["url"], r["url_md5"], r["depth"], r["status"],
         r["n_attempts"])
        for r in result.trace.orderBy("seq").collect()
    ]


def golden_rows(golden):
    return [
        (t["seq"], t["url"], t["url_md5"], t["depth"], t["status"],
         t["n_attempts"])
        for t in golden
    ]


class TestGoldenTraceSequential:
    """budget=1: exact reference pop-order parity."""

    def test_trace_matches_simulator(self, spark):
        spec = default_spec(budget=1)
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        result = run_engine(spark, spec)
        assert trace_rows(result) == golden_rows(golden)

    def test_seen_set_matches(self, spark):
        spec = default_spec(budget=1)
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        result = run_engine(spark, spec)
        got = {r["url_md5"] for r in result.frontier.collect()}
        # with no request-limit the frontier fully drains → seen == fetched
        assert got == {t["url_md5"] for t in golden}


class TestBatchedRounds:
    """budget=4: same URL set in fewer rounds."""

    def test_seen_set_equal_to_sequential(self, spark):
        g1 = simulate_reference_crawl(WEB, default_spec(budget=1), ROBOTS_FIXTURE)
        r4 = run_engine(spark, default_spec(budget=4))
        assert {t["url_md5"] for t in g1} == {
            r["url_md5"] for r in r4.trace.collect()
        }

    def test_fewer_rounds_same_pages(self, spark):
        r4 = run_engine(spark, default_spec(budget=4))
        r1 = run_engine(spark, default_spec(budget=1))
        assert r4.rounds_run < r1.rounds_run
        assert r4.pages_fetched == r1.pages_fetched


class TestPriorityOrdering:
    def test_priority_rules_reorder_pops(self, spark):
        spec = default_spec(budget=1)
        spec.priority_rules = [(r"#detail_# i", 5), (r"#moved# i", 3)]
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        result = run_engine(spark, spec)
        assert trace_rows(result) == golden_rows(golden)
        # sanity: priority actually bites — once discovered, detail pages
        # (priority 5) jump ahead of earlier-inserted plain pages: some
        # detail is fetched before the last list page
        urls = [t["url"] for t in golden]
        first_detail = next(i for i, u in enumerate(urls) if "detail_" in u)
        last_list = max(i for i, u in enumerate(urls) if "index_" in u)
        assert first_detail < last_list


class TestRequestLimit:
    def test_limit_respected_and_prefix_equal(self, spark):
        spec = default_spec(budget=1)
        spec.request_limit = 7
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        result = run_engine(spark, spec)
        assert len(golden) == 7
        assert trace_rows(result) == golden_rows(golden)


class TestDepthLimit:
    def test_depth_capped(self, spark):
        spec = default_spec(max_depth=1, budget=1)
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        result = run_engine(spark, spec)
        assert max(t["depth"] for t in golden) <= 1
        assert trace_rows(result) == golden_rows(golden)


class TestPaginationFeeds:
    """E17 wired into the engine: addFeed semantics (depth 0, no
    admission, feeds before the page's own links) must match the
    simulator pop-for-pop."""

    def test_trace_matches_simulator(self, spark):
        spec = default_spec(budget=1)
        spec.pagination_rules = [
            (r"var\s+countPage\s*=\s*(\d+)", "index_{i}.htm")
        ]
        golden = simulate_reference_crawl(WEB, spec, ROBOTS_FIXTURE)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(_webdf(spark), spec),
            robots_fixture=ROBOTS_FIXTURE,
        )
        result = engine.run(max_rounds=120)
        assert trace_rows(result) == golden_rows(golden)
        # the feeds reached pages plain link-following cannot:
        urls = {t["url"] for t in golden}
        assert "http://www.site-a.test/list1/index_1.htm" in urls
        # and fed pages carry addFeed's depth-0 quirk
        by_url = {t["url"]: t for t in golden}
        assert by_url["http://www.site-a.test/list1/index_1.htm"]["depth"] == 0


class TestRobotsAndFilters:
    def test_denied_areas_never_fetched(self, spark):
        result = run_engine(spark, default_spec(budget=4))
        urls = [r["url"] for r in result.trace.collect()]
        assert all("/private/" not in u for u in urls)       # robots F8
        assert all(not u.endswith(".css") for u in urls)     # deny rule F5
        assert all("other-b" not in u for u in urls)         # follow mode F4

    def test_redirect_chain_followed(self, spark):
        result = run_engine(spark, default_spec(budget=4))
        urls = {r["url"] for r in result.trace.collect()}
        assert "http://www.site-a.test/moved/old.htm" in urls
        assert "http://www.site-a.test/moved/new.htm" in urls
