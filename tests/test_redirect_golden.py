"""F9/F3/P9/P10 golden parity on the redirect-bootstrap fixture web
(fixtures.make_redirect_webgraph): the seed 301/302-chains across
domains before any content; the engine must keep only redirect links
(depth handed back, admission bypassed), re-base the follow-mode filter
to the first content page, honor page-level meta-nofollow and
rel=nofollow, retry flaky pages inline, exhaust dead ones, and stop on
the traffic limit with the right abort reason.
"""

import pytest

from lightcrawler_spark.fixtures import (
    make_redirect_webgraph,
    redirect_spec,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import (
    ABORT_PASSEDTHROUGH,
    ABORT_TRAFFICLIMIT,
    CrawlEngine,
)
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

WEB = make_redirect_webgraph()

_cache = {}


def run_engine(spark, spec):
    key = (spec.round_duration_s, spec.traffic_limit_bytes)
    if key not in _cache:
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, WEB), spec)
        )
        _cache[key] = engine.run(max_rounds=100)
    return _cache[key]


def rows(trace_iter):
    return [
        (t["seq"], t["url"], t["url_md5"], t["depth"], t["status"],
         t["n_attempts"])
        for t in trace_iter
    ]


class TestRedirectBootstrapGolden:
    def test_trace_matches_simulator(self, spark):
        spec = redirect_spec(budget=1)
        golden = simulate_reference_crawl(WEB, spec)
        result = run_engine(spark, spec)
        got = rows(r.asDict() for r in result.trace.orderBy("seq").collect())
        assert got == rows(golden)

    def test_bootstrap_semantics(self, spark):
        spec = redirect_spec(budget=1)
        golden = simulate_reference_crawl(WEB, spec)
        by_url = {t["url"]: t for t in golden}
        urls = set(by_url)

        # the redirect chain was followed across domains to content
        assert "http://www.site-r.test" in urls
        assert "http://www.site-r.test/hop1.htm" in urls
        assert "http://www.site-s.test/landing.htm" in urls
        # depth handed back along the chain (keepRedirectUrls decrement)
        assert by_url["http://www.site-s.test/landing.htm"]["depth"] == 0

        # filter re-based to the landing page: seed-domain link dropped
        assert "http://www.site-r.test/b.htm" not in urls
        # normal content links admitted after re-base
        assert "http://www.site-s.test/a.htm" in urls
        assert "http://www.site-s.test/c.htm" in urls
        # post-bootstrap redirect followed via the normal path
        assert "http://www.site-s.test/target.htm" in urls

        # F3: page-level meta nofollow and link-level rel=nofollow
        assert "http://www.site-s.test/nf.htm" in urls
        assert "http://www.site-s.test/from-nf.htm" not in urls
        assert "http://www.site-s.test/skipme.htm" not in urls

        # P9: flaky page retried once then OK; dead page exhausted
        assert by_url["http://www.site-s.test/flaky.htm"]["status"] == 200
        assert by_url["http://www.site-s.test/flaky.htm"]["n_attempts"] == 2
        assert by_url["http://www.site-s.test/dead.htm"]["status"] == 0
        assert by_url["http://www.site-s.test/dead.htm"]["n_attempts"] == 3

    def test_batched_seen_set_equal(self, spark):
        g1 = simulate_reference_crawl(WEB, redirect_spec(budget=1))
        r4 = run_engine(spark, redirect_spec(budget=4))
        assert {t["url_md5"] for t in g1} == {
            r["url_md5"] for r in r4.trace.collect()
        }


class TestResumeMidBootstrap:
    def test_resume_during_redirect_chain(self, spark, tmp_path):
        """P6 × F9: interrupt while still following redirects (no 200
        seen), resume from the watermark — the engine must recompute
        'bootstrap still active' from the committed trace and finish
        identically to the uninterrupted run."""
        from lightcrawler_spark.plans.storage import RoundStore

        spec = redirect_spec(budget=1)
        web = webgraph_df(spark, WEB)

        full = CrawlEngine(
            spark, spec, SyntheticFetcher(web, spec),
            store=RoundStore(spark, str(tmp_path / "full")),
        ).run(max_rounds=50)

        CrawlEngine(
            spark, spec, SyntheticFetcher(web, spec),
            store=RoundStore(spark, str(tmp_path / "part")),
        ).run(max_rounds=2)  # seed 301 + hop1 302: content NOT yet found
        resumed = CrawlEngine(
            spark, spec, SyntheticFetcher(web, spec),
            store=RoundStore(spark, str(tmp_path / "part")),
        ).run(max_rounds=50, resume=True)

        def t(res):
            return rows(r.asDict() for r in res.trace.orderBy("seq").collect())

        assert t(resumed) == t(full)


class TestAbortReasons:
    def test_passedthrough_on_drained_frontier(self, spark):
        result = run_engine(spark, redirect_spec(budget=1))
        assert result.abort_reason == ABORT_PASSEDTHROUGH
        assert result.bytes_received > 0

    def test_traffic_limit_aborts_midcrawl(self, spark):
        spec = redirect_spec(budget=1)
        spec.traffic_limit_bytes = 1  # trips after the first non-empty page
        result = run_engine(spark, spec)
        assert result.abort_reason == ABORT_TRAFFICLIMIT
        full = simulate_reference_crawl(WEB, redirect_spec(budget=1))
        assert result.pages_fetched < len(full)
