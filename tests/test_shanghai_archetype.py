"""Per-site archetype #2 (VERDICT r3 "Next round" #5): the
POST-paginated SpiderFrame configuration of
/root/reference/worker/SpiderShangHaiGov.class.php:19-31 — seeds, a
JS-counter pager whose synthesized pages carry the page parameter in a
POST body (P13 send-data), and a ContentHandlers route map — expressed
as PURE CONFIG over existing operators: CrawlSpec(pagination_rules) +
send_data rules + products.route_by_handlers. No new operator code;
the golden is engine == simulator pop-for-pop, proving SpiderFrame
site workers are data, not code.
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.fixtures import (
    _page_row,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

HOST = "www.sh.test"


def make_shanghai_web() -> list[dict]:
    """index.html declares a 3-page pager (JS counter, reference list
    pages do exactly this); pages index_1/index_2 are E17-synthesized —
    never linked from anywhere — and each lists detail pages in the
    reference's /u{N}aw{N}.html shape plus a .doc attachment."""
    P = _page_row
    pages = [
        P(
            f"http://{HOST}/nw2/index.html",
            "<html><body><script>var countPage = 3</script>"
            f'<a href="/nw2/u1aw100.html">detail 100</a>'
            "</body></html>",
        ),
        P(
            f"http://{HOST}/nw2/index_1.htm",
            '<html><body><a href="/nw2/u1aw101.html">detail 101</a></body></html>',
        ),
        P(
            f"http://{HOST}/nw2/index_2.htm",
            '<html><body><a href="/nw2/u1aw102.html">detail 102</a>'
            '<a href="/files/notice_1.doc">attachment</a></body></html>',
        ),
    ]
    for n in (100, 101, 102):
        pages.append(
            P(f"http://{HOST}/nw2/u1aw{n}.html",
              f"<html><body>law text {n}</body></html>")
        )
    pages.append(
        P(f"http://{HOST}/files/notice_1.doc", b"DOCBYTES",
          ctype="application/msword")
    )
    return pages


WEB = make_shanghai_web()

# the SpiderShangHaiGov ContentHandlers map, verbatim shape
# (worker/SpiderShangHaiGov.class.php:27-31): first match wins
HANDLERS = [
    (r"#/nw2/index[_0-9]+\.htm# i", "handleListPage"),
    (r"#/u[0-9]+aw[0-9]+\.html# i", "handleDetailPage"),
    (r"#/[0-9a-zA-Z_]+\.(doc|pdf|txt|xls)# i", "handleAttachment"),
]


def shanghai_spec() -> CrawlSpec:
    return CrawlSpec(
        seeds=[f"http://{HOST}/nw2/index.html"],
        follow_mode=1,  # domain, like the single-site reference workers
        max_depth=8,
        crawl_delay_s=5.0,
        round_duration_s=5.0,  # budget 1: the reference's sequential pop
        follow_redirects_till_content=False,
        # E17: the pager counter feeds index_{i}.htm (addFeed semantics)
        pagination_rules=[(r"var\s+countPage\s*=\s*(\d+)", "index_{i}.htm")],
        # .doc attachment bodies must be received (F10 gate) so the
        # attachment handler has bytes to route
        content_type_receive_rules=[r"#text/html# i", r"#application/# i"],
    )


class RecordingFetcher(SyntheticFetcher):
    """SyntheticFetcher that also records each round's (url, post_data)
    work rows — the P13 assertion surface."""

    def __init__(self, web_df, spec):
        super().__init__(web_df, spec)
        self.seen_post: dict[str, str | None] = {}

    def fetch(self, work):
        cols = ["url"] + (
            ["post_data"] if "post_data" in work.columns else []
        )
        for r in work.select(*cols).collect():
            self.seen_post[r["url"]] = (
                r["post_data"] if "post_data" in cols else None
            )
        return super().fetch(work)


class TestShanghaiArchetype:
    def _run(self, spark):
        spec = shanghai_spec()
        spark_rules = spark.createDataFrame(
            [
                (1, r"/nw2/index_1\.htm", "post", "page=1"),
                (2, r"/nw2/index_2\.htm", "post", "page=2"),
            ],
            "rule_order long, url_regex string, kind string, payload string",
        )
        fetcher = RecordingFetcher(webgraph_df(spark, WEB), spec)
        engine = CrawlEngine(
            spark, spec, fetcher, send_data_rules=spark_rules
        )
        result = engine.run(max_rounds=40)
        return spec, result, fetcher

    def test_trace_matches_simulator(self, spark):
        spec, result, _ = self._run(spark)
        golden = simulate_reference_crawl(WEB, spec)
        got = [
            (r["seq"], r["url"], r["depth"], r["status"])
            for r in result.trace.orderBy("seq").collect()
        ]
        want = [
            (t["seq"], t["url"], t["depth"], t["status"]) for t in golden
        ]
        assert got == want
        assert result.pages_fetched == len(WEB)  # whole site crawled
        # pager pages were reached ONLY via E17 feeds (depth-0 quirk)
        by_url = {t["url"]: t for t in golden}
        assert by_url[f"http://{HOST}/nw2/index_1.htm"]["depth"] == 0
        assert by_url[f"http://{HOST}/nw2/index_2.htm"]["depth"] == 0

    def test_post_page_param_attached(self, spark):
        """P13: the synthesized pager URLs carry their page parameter in
        the POST body; nothing else does."""
        _, _, fetcher = self._run(spark)
        assert fetcher.seen_post[f"http://{HOST}/nw2/index_1.htm"] == "page=1"
        assert fetcher.seen_post[f"http://{HOST}/nw2/index_2.htm"] == "page=2"
        others = {
            u: p for u, p in fetcher.seen_post.items() if "index_" not in u
        }
        assert others and all(p is None for p in others.values())

    def test_handler_route_map(self, spark):
        """F12 over the crawl result with the verbatim ContentHandlers
        shape: list/detail/attachment each route to their handler; the
        seed index falls back to the default list handler."""
        from lightcrawler_spark.operators.products import route_by_handlers

        _, result, _ = self._run(spark)
        routed = {
            r["url"]: r["route"]
            for r in route_by_handlers(result.pages, HANDLERS).collect()
        }
        assert routed[f"http://{HOST}/nw2/index_1.htm"] == "handleListPage"
        assert routed[f"http://{HOST}/nw2/u1aw101.html"] == "handleDetailPage"
        assert routed[f"http://{HOST}/files/notice_1.doc"] == "handleAttachment"
        assert routed[f"http://{HOST}/nw2/index.html"] == "list"  # default
