"""P12 harvest-back (Set-Cookie → jar → next round's Cookie header).

Reference semantics: the crawler stores every response's cookies
(PHPCrawler.class.php:830 via PHPCrawlerCookieDescriptor::getFromHeaderLine,
PHPCrawlerCookieDescriptor.class.php:128-158) and attaches matching ones
to later requests. Round 2 shipped store/lookup/attach only; these tests
pin the harvest half: header-line parsing vectors, the engine loop
(cookie-gated fixture page), and jar persistence across resume.
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.operators.cookies import harvest_set_cookies
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.plans.storage import RoundStore
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


def _results_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fetch_rank int, set_cookies array<string>"
    )


class TestHeaderLineParsing:
    """Vectors mirroring PHPCrawlerCookieDescriptor::getFromHeaderLine."""

    def _harvest(self, spark, url, lines, round_no=0):
        df = _results_df(spark, [(url, 1, lines)])
        return [r.asDict() for r in
                harvest_set_cookies(df, round_no).orderBy("seq").collect()]

    def test_name_value_and_defaults(self, spark):
        rows = self._harvest(
            spark, "http://www.shop.test/a/b/page.htm", ["sid=abc123"]
        )
        assert len(rows) == 1
        c = rows[0]
        assert c["name"] == "sid" and c["value"] == "abc123"
        # missing domain → source HOST, no leading dot (descriptor :113)
        assert c["domain"] == "www.shop.test"
        # missing path → source url's DIRECTORY (descriptor :117)
        assert c["path"] == "/a/b/"
        assert c["source_domain"] == "shop.test"

    def test_attributes_quotes_and_dot_domain(self, spark):
        rows = self._harvest(
            spark,
            "http://www.shop.test/x.htm",
            [
                'VISITOR=4c63; expires="Sat, 08-Aug-2020 23:59:08 GMT"; Path="/"',
                "lang = zh ; Domain=shop.test; path=/docs",
                "pre=dotted; Domain=.other.test",
            ],
        )
        v, lang, pre = rows
        assert v["name"] == "VISITOR" and v["value"] == "4c63"
        assert v["path"] == "/"  # quotes stripped from path (:152-154)
        # name/value are trimmed; explicit domain gains a leading dot
        assert lang["name"] == "lang" and lang["value"] == "zh"
        assert lang["domain"] == ".shop.test" and lang["path"] == "/docs"
        # already-dotted domain kept as-is
        assert pre["domain"] == ".other.test"

    def test_value_keeps_quotes_quirk(self, spark):
        # the reference strips quotes from expires/path/domain but NOT
        # from the value (getFromHeaderLine :138-141 vs :152-154)
        rows = self._harvest(
            spark, "http://h.test/", ['theme="dark"; Path=/'])
        assert rows[0]["value"] == '"dark"'

    def test_seq_packing_deterministic(self, spark):
        df = _results_df(
            spark,
            [("http://h.test/a", 2, ["a=1", "b=2"]),
             ("http://h.test/b", 1, ["c=3"])],
        )
        rows = {(r["name"]): r["seq"]
                for r in harvest_set_cookies(df, 4).collect()}
        base = 5 << 40
        assert rows["c"] == base + (1 << 20)
        assert rows["a"] == base + (2 << 20)
        assert rows["b"] == base + (2 << 20) + 1


def _gated_web(spark):
    """Fixture web: the seed SETS a session cookie and links to a page
    that REQUIRES it (403 without) — a session-gated site in miniature."""
    rows = [
        ("http://site.test", 200, "text/html", None,
         bytearray(b'<html><body><a href="/gated.htm">in</a></body></html>'),
         10, ["sid=tok1; Path=/"], None),
        ("http://site.test/gated.htm", 200, "text/html", None,
         bytearray(b"<html><body>members only</body></html>"),
         10, None, "sid=tok1"),
    ]
    return spark.createDataFrame(
        rows,
        "url string, status int, content_type string, redirect_to string, "
        "body binary, latency_ms int, set_cookies array<string>, "
        "requires_cookie string",
    )


def _gated_spec(**kw):
    return CrawlSpec(
        seeds=["http://site.test"], follow_mode=1, max_depth=3,
        retry_limit=3, crawl_delay_s=5.0, round_duration_s=5.0,
        follow_redirects_till_content=False, **kw,
    )


class TestEngineHarvestLoop:
    def test_gated_page_reached_with_harvesting(self, spark):
        spec = _gated_spec()
        engine = CrawlEngine(spark, spec, SyntheticFetcher(_gated_web(spark), spec))
        result = engine.run(max_rounds=6)
        by_url = {r["url"]: r.asDict() for r in result.trace.collect()}
        gated = by_url["http://site.test/gated.htm"]
        assert gated["status"] == 200 and gated["n_attempts"] == 1
        # and the jar now holds the harvested session cookie
        jar = {r["name"]: r.asDict() for r in engine.cookie_jar.collect()}
        assert jar["sid"]["value"] == "tok1"
        assert jar["sid"]["domain"] == "site.test"

    def test_gated_page_403_without_harvesting(self, spark):
        """Round 2's engine could only CONSUME a pre-seeded jar: with
        harvesting off the session-gated page must fail — the defect the
        harvest loop fixes."""
        spec = _gated_spec()
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(_gated_web(spark), spec),
            harvest_cookies=False,
        )
        result = engine.run(max_rounds=6)
        by_url = {r["url"]: r.asDict() for r in result.trace.collect()}
        gated = by_url["http://site.test/gated.htm"]
        assert gated["status"] == 403
        assert gated["n_attempts"] == 3  # >400 → inline retry exhausts

    def test_jar_survives_resume(self, spark, tmp_path):
        spec = _gated_spec()
        store = RoundStore(spark, str(tmp_path / "rounds"))
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(_gated_web(spark), spec), store=store
        )
        r1 = engine.run(max_rounds=6)
        assert r1.pages_fetched == 2

        # fresh engine over the same store: the jar must rebuild from the
        # committed cookies table (the reference's SQLite cookie cache
        # survives restarts the same way)
        engine2 = CrawlEngine(
            spark, spec, SyntheticFetcher(_gated_web(spark), spec), store=store
        )
        r2 = engine2.run(max_rounds=2, resume=True)
        jar = {r["name"]: r["value"] for r in engine2.cookie_jar.collect()}
        assert jar == {"sid": "tok1"}
        # nothing refetched: the crawl was complete
        assert r2.pages_fetched == r1.pages_fetched
