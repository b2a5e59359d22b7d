"""Spider-trap admission gate (drop_traps) — engine golden + mirror fuzz.

With ``drop_traps`` the Heritrix-style pathological-URL verdict joins
the engine's admission battery: trap URLs never enter the frontier.
Engine == simulator pop-for-pop (the simulator applies the pure-Python
mirror is_trap_py at the same battery position), and a fuzz sweep
asserts the Spark expression and the Python mirror agree verdict-for-
verdict on a URL zoo.
"""

from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.fixtures import (
    _page_row,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.operators.traps import is_trap_expr, is_trap_py
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

HOST = "www.trap.test"
# NOTE: not JSESSIONID — the ported E6 section-exclusion quirk strips
# `on*=`-shaped runs even mid-token ("...JSESSI-ONID=x-9"), faithfully
# to the reference; PHPSESSID has no such substring.
TRAP_SESSION = f"http://{HOST}/page.jsp?PHPSESSID=q7"
TRAP_CALENDAR = f"http://{HOST}/2023/2024/2025/post.htm"
TRAP_REPEAT = f"http://{HOST}/item/item/item/p.htm"
GOOD_1 = f"http://{HOST}/docs/a.htm"
GOOD_2 = f"http://{HOST}/docs/b.htm"


def _web():
    P = _page_row
    body = "<html><body>" + "".join(
        f'<a href="{u}">l</a>'
        for u in (GOOD_1, TRAP_SESSION, TRAP_CALENDAR, TRAP_REPEAT, GOOD_2)
    ) + "</body></html>"
    pages = [P(f"http://{HOST}", body)]
    for u in (GOOD_1, GOOD_2, TRAP_SESSION, TRAP_CALENDAR, TRAP_REPEAT):
        pages.append(P(u, "<html><body>leaf</body></html>"))
    return pages


def _spec(drop):
    return CrawlSpec(
        seeds=[f"http://{HOST}"],
        follow_mode=1,
        max_depth=4,
        crawl_delay_s=5.0,
        round_duration_s=10.0,
        follow_redirects_till_content=False,
        drop_traps=drop,
    )


class TestTrapGateGolden:
    def _run(self, spark, drop):
        spec = _spec(drop)
        web = _web()
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec))
        result = engine.run(max_rounds=20)
        golden = simulate_reference_crawl(web, spec)
        return result, golden

    def test_traps_never_fetched_and_trace_matches(self, spark):
        result, golden = self._run(spark, drop=True)
        got = [(r["seq"], r["url"], r["status"])
               for r in result.trace.orderBy("seq").collect()]
        assert got == [(t["seq"], t["url"], t["status"]) for t in golden]
        urls = {u for _, u, _ in got}
        assert GOOD_1 in urls and GOOD_2 in urls
        assert not urls & {TRAP_SESSION, TRAP_CALENDAR, TRAP_REPEAT}

    def test_flag_off_fetches_traps(self, spark):
        result, golden = self._run(spark, drop=False)
        got = [(r["seq"], r["url"]) for r in
               result.trace.orderBy("seq").collect()]
        assert got == [(t["seq"], t["url"]) for t in golden]
        urls = {u for _, u in got}
        assert {TRAP_SESSION, TRAP_CALENDAR, TRAP_REPEAT} <= urls


class TestExprMirrorParity:
    def test_expression_equals_python_mirror(self, spark):
        zoo = [
            "http://h.test/a/b/c",
            "http://h.test/a/b/a/c/a",
            "http://h.test/" + "/".join(f"s{i}" for i in range(13)),
            "http://h.test/p?a=1&b=2",
            "http://h.test/p?" + "&".join(f"k{i}=1" for i in range(9)),
            "http://h.test/p?PHPSESSID=q",
            "http://h.test/p?classid=9",
            "http://h.test/2020/2021/2022/x",
            "http://h.test/2024/06/x",
            "http://h.test/p?q=" + "x" * 520,
            "https://h.test",
            "http://h.test/p?",
            "http://h.test//a//b",
            "HTTP://H.TEST/A?SID=1",
        ] + [f"http://h{i}.test/{'seg/' * (i % 15)}p?n={i}" for i in range(40)]
        df = spark.createDataFrame([(u,) for u in zoo], "url string")
        got = {
            r.url: r.t
            for r in df.select(
                "url", is_trap_expr(F.col("url")).alias("t")).collect()
        }
        for u in zoo:
            assert got[u] == is_trap_py(u), u
