"""Sitemap bootstrap golden (spec.ingest_sitemaps → engine == simulator).

Pins the wiring of operators/sitemap.py into the engine's round-0
bootstrap: robots `Sitemap:` directives → out-of-band fetch → urlset /
one-level index recursion → C3-resolved locs through the FULL F1-F8
battery → frontier rows right after the seeds, in discovery order.

The fixture exercises: a sitemap index (child recursion), a nested
index (MUST be ignored — one level per protocol), a relative <loc>
(C3 resolution), a robots-disallowed loc, a cross-domain loc
(follow-mode drop), a duplicate loc, and a seed duplicate.
"""

import pytest

from lightcrawler_spark.fixtures import (
    HOST_SM as HOST,
    SITEMAP_ROBOTS_FIXTURE,
    make_sitemap_webgraph as make_web,
    simulate_reference_crawl,
    sitemap_spec as make_spec,
    webgraph_df,
)
from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

ROOT = f"http://{HOST}"
ROBOTS_BODY = SITEMAP_ROBOTS_FIXTURE[0][1]


def run_engine(spark, spec, web):
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec),
        robots_fixture=SITEMAP_ROBOTS_FIXTURE,
    )
    return engine.run(max_rounds=60)


def trace_tuples(result):
    return [
        (r["seq"], r["url"], r["depth"], r["referer"], r["status"])
        for r in result.trace.orderBy("seq").collect()
    ]


def golden_tuples(golden):
    return [
        (t["seq"], t["url"], t["depth"], t["referer"], t["status"])
        for t in golden
    ]


@pytest.fixture(scope="module")
def fixture_run(spark):
    spec = make_spec()
    web = make_web()
    golden = simulate_reference_crawl(web, spec, SITEMAP_ROBOTS_FIXTURE)
    result = run_engine(spark, spec, web)
    return golden, result


class TestSitemapGolden:
    def test_trace_matches_simulator(self, fixture_run):
        golden, result = fixture_run
        assert trace_tuples(result) == golden_tuples(golden)

    def test_sitemap_urls_enter_after_seed_in_discovery_order(
        self, fixture_run
    ):
        golden, result = fixture_run
        urls = [t[1] for t in trace_tuples(result)]
        assert urls[0] == ROOT  # normalized seed (C2 drops the bare "/")
        # extra.xml (wave 0) entries precede sm1.xml (wave-1 child) ones
        assert urls.index(f"{ROOT}/d.html") < urls.index(f"{ROOT}/a.html")
        assert urls.index(f"{ROOT}/a.html") < urls.index(f"{ROOT}/b.html")

    def test_battery_and_recursion_limits_hold(self, fixture_run):
        golden, result = fixture_run
        urls = [t[1] for t in trace_tuples(result)]
        assert f"{ROOT}/private/secret.html" not in urls  # robots F8
        assert "http://www.other-dom.test/x.html" not in urls  # follow-mode
        assert f"{ROOT}/never.html" not in urls  # nested index ignored
        assert urls.count(f"{ROOT}/a.html") == 1  # loc dedup
        assert urls.count(ROOT) == 1  # seed dedup (loc normalizes to it)
        # the relative <loc> resolved against its sitemap URL (C3)
        assert f"{ROOT}/b.html" in urls

    def test_sitemap_rows_carry_referer_and_depth(self, fixture_run):
        golden, result = fixture_run
        by_url = {t[1]: t for t in trace_tuples(result)}
        assert by_url[f"{ROOT}/d.html"][2:4] == (1, f"{ROOT}/extra.xml")
        assert by_url[f"{ROOT}/a.html"][2:4] == (1, f"{ROOT}/sm1.xml")

    def test_live_robots_path_matches_simulator(self, spark):
        """No fixture: robots.txt live-fetched (S6) must feed the same
        sitemap bootstrap."""
        spec = make_spec()
        web = make_web(with_robots_page=True)
        golden = simulate_reference_crawl(web, spec, SITEMAP_ROBOTS_FIXTURE)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec),
            robots_fixture=None,
        )
        result = engine.run(max_rounds=60)
        assert trace_tuples(result) == golden_tuples(golden)

    def test_flag_off_ignores_sitemaps(self, spark):
        spec = CrawlSpec(
            seeds=[f"{ROOT}/"], max_depth=2, obey_robots_txt=True,
            ingest_sitemaps=False,
        )
        web = make_web()
        result = run_engine(spark, spec, web)
        urls = [t[1] for t in trace_tuples(result)]
        assert f"{ROOT}/d.html" not in urls
        assert f"{ROOT}/a.html" not in urls
        assert f"{ROOT}/linked.html" in urls


class TestSitemapRefetch:
    """Lastmod-driven recrawl selection (sitemap.sitemap_refetch):
    verdict paths and the string-normalization freshness rule."""

    def _run(self, spark, entries, pages):
        from lightcrawler_spark.operators.sitemap import sitemap_refetch

        e = spark.createDataFrame(entries, "loc string, lastmod string")
        p = spark.createDataFrame(pages, "url string, fetched_at string")
        return {
            r["loc"]: r for r in sitemap_refetch(e, p).collect()
        }

    def test_verdict_paths(self, spark):
        got = self._run(
            spark,
            [
                ("u:new", "2024-06-01"),            # never fetched
                ("u:mod", "2024-06-02T09:00:00Z"),  # newer than fetch
                ("u:fresh", "2024-01-01"),          # older than fetch
                ("u:nolm", None),                   # no lastmod, fetched
                ("u:garbage", "last week"),         # malformed lastmod
            ],
            [
                ("u:mod", "2024-06-01T00:00:00Z"),
                ("u:fresh", "2024-05-01T00:00:00Z"),
                ("u:nolm", "2024-05-01T00:00:00Z"),
                ("u:garbage", "2024-05-01T00:00:00Z"),
            ],
        )
        assert got["u:new"]["refetch_reason"] == "never_fetched"
        assert got["u:mod"]["refetch_reason"] == "modified"
        assert got["u:fresh"]["needs_refetch"] is False
        assert got["u:nolm"]["needs_refetch"] is False
        assert got["u:garbage"]["needs_refetch"] is False
        assert got["u:garbage"]["lastmod_norm"] is None

    def test_date_only_padding_boundary(self, spark):
        # date-only lastmod pads to midnight: equal-to-fetch is NOT
        # newer; one second after midnight is
        got = self._run(
            spark,
            [("u:eq", "2024-06-01"), ("u:later", "2024-06-01T00:00:01Z")],
            [
                ("u:eq", "2024-06-01T00:00:00Z"),
                ("u:later", "2024-06-01T00:00:00Z"),
            ],
        )
        assert got["u:eq"]["lastmod_norm"] == "2024-06-01T00:00:00Z"
        assert got["u:eq"]["needs_refetch"] is False
        assert got["u:later"]["needs_refetch"] is True

    def test_offset_forms(self, spark):
        # '+00:00' normalizes to 'Z' (comparable); any NON-UTC numeric
        # offset is valid W3C but not lexicographically comparable, so
        # it is conservatively NULLed — no false refetch verdicts from
        # cross-offset string comparison
        got = self._run(
            spark,
            [
                ("u:utc", "2024-06-02T09:00:00+00:00"),
                ("u:offset", "2024-06-01T23:30:00-03:00"),
            ],
            [
                ("u:utc", "2024-06-01T00:00:00Z"),
                ("u:offset", "2024-06-02T01:00:00Z"),
            ],
        )
        assert got["u:utc"]["lastmod_norm"] == "2024-06-02T09:00:00Z"
        assert got["u:utc"]["needs_refetch"] is True
        assert got["u:offset"]["lastmod_norm"] is None
        assert got["u:offset"]["needs_refetch"] is False

    def test_mixed_precision_canonicalization(self, spark):
        # ADVICE r4: every admitted W3C form canonicalizes to full
        # 'THH:MM:SSZ' precision BEFORE comparing — 'Z' sorts above ':'
        # and '.', so minute-precision / fractional / naive forms are
        # not comparable against canonical strings byte-wise
        got = self._run(
            spark,
            [
                # minute precision, same minute as fetch → pads ':00',
                # equal, NOT newer (raw 'T18:00Z' > 'T18:00:30Z' would
                # have falsely refetched)
                ("u:minute-eq", "2024-06-01T18:00"),
                # minute precision one minute later → refetch
                ("u:minute-gt", "2024-06-01T18:01Z"),
                # fractional seconds truncate (floor): sub-second-newer
                # is equal at :SS precision → no refetch (the advisory
                # example: '...T18:00:30.5Z' vs fetched '...T18:00:30Z')
                ("u:frac-eq", "2024-06-01T18:00:30.5Z"),
                # fractional seconds on a LATER second still refetches
                ("u:frac-gt", "2024-06-01T18:00:31.2Z"),
                # naive full-precision form stamps 'Z'
                ("u:naive-gt", "2024-06-01T19:00:00"),
            ],
            [
                ("u:minute-eq", "2024-06-01T18:00:30Z"),
                ("u:minute-gt", "2024-06-01T18:00:30Z"),
                ("u:frac-eq", "2024-06-01T18:00:30Z"),
                ("u:frac-gt", "2024-06-01T18:00:30Z"),
                ("u:naive-gt", "2024-06-01T18:00:30Z"),
            ],
        )
        assert got["u:minute-eq"]["lastmod_norm"] == "2024-06-01T18:00:00Z"
        assert got["u:minute-eq"]["needs_refetch"] is False
        assert got["u:minute-gt"]["lastmod_norm"] == "2024-06-01T18:01:00Z"
        assert got["u:minute-gt"]["needs_refetch"] is True
        assert got["u:frac-eq"]["lastmod_norm"] == "2024-06-01T18:00:30Z"
        assert got["u:frac-eq"]["needs_refetch"] is False
        assert got["u:frac-gt"]["lastmod_norm"] == "2024-06-01T18:00:31Z"
        assert got["u:frac-gt"]["needs_refetch"] is True
        assert got["u:naive-gt"]["lastmod_norm"] == "2024-06-01T19:00:00Z"
        assert got["u:naive-gt"]["needs_refetch"] is True

    def test_normalization_grid_total_and_order_preserving(self, spark):
        """Exhaustive form×instant grid in ONE Spark pass: every
        admitted W3C form must normalize to the canonical
        'YYYY-MM-DDTHH:MM:SSZ' precision whose value equals the
        truncated instant, every rejected form must NULL, and the
        lexicographic order of any two normalized values must equal
        the chronological order of their truncated instants — the
        property the whole freshness rule rests on."""
        import datetime as dt
        import itertools

        instants = [
            dt.datetime(2023, 12, 31, 23, 59, 59),
            dt.datetime(2024, 1, 1, 0, 0, 0),
            dt.datetime(2024, 6, 1, 18, 0, 30),
            dt.datetime(2024, 6, 1, 18, 0, 31),
            dt.datetime(2024, 6, 1, 18, 1, 0),
            dt.datetime(2024, 10, 5, 7, 9, 9),
        ]
        # (render, truncated-canonical-from-instant) — admitted forms
        def forms(t):
            date = t.strftime("%Y-%m-%d")
            hm = t.strftime("%Y-%m-%dT%H:%M")
            full = t.strftime("%Y-%m-%dT%H:%M:%S")
            mid = t.replace(hour=0, minute=0, second=0)
            return [
                (date, mid.strftime("%Y-%m-%dT%H:%M:%SZ")),
                (hm, t.replace(second=0).strftime("%Y-%m-%dT%H:%M:%SZ")),
                (hm + "Z", t.replace(second=0).strftime("%Y-%m-%dT%H:%M:%SZ")),
                (full, t.strftime("%Y-%m-%dT%H:%M:%SZ")),
                (full + "Z", t.strftime("%Y-%m-%dT%H:%M:%SZ")),
                (full + "+00:00", t.strftime("%Y-%m-%dT%H:%M:%SZ")),
                (full + ".5Z", t.strftime("%Y-%m-%dT%H:%M:%SZ")),
                (full + ".987654Z", t.strftime("%Y-%m-%dT%H:%M:%SZ")),
            ]

        rejected = [
            "2024-06-01T18:00:30-03:00", "2024-06-01T18:00:30+0000",
            "2024-6-1", "20240601", "2024-06-01 18:00:30Z",
            "last tuesday", "", "2024-06-01T18Z",
        ]
        rows, want = [], {}
        for i, t in enumerate(instants):
            for j, (raw, canon) in enumerate(forms(t)):
                key = f"ok:{i}:{j}"
                rows.append((key, raw))
                want[key] = canon
        for j, raw in enumerate(rejected):
            key = f"bad:{j}"
            rows.append((key, raw))
            want[key] = None

        from lightcrawler_spark.operators.sitemap import sitemap_refetch

        e = spark.createDataFrame(rows, "loc string, lastmod string")
        p = spark.createDataFrame([], "url string, fetched_at string")
        got = {
            r["loc"]: r["lastmod_norm"]
            for r in sitemap_refetch(e, p).collect()
        }
        assert got == want
        # order preservation: lexicographic on normalized == chrono on
        # truncated instants, across EVERY admitted pair
        norm = [(k, v) for k, v in got.items() if v is not None]
        parsed = {
            k: dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ")
            for k, v in norm
        }
        for (k1, v1), (k2, v2) in itertools.combinations(norm, 2):
            assert (v1 < v2) == (parsed[k1] < parsed[k2]), (k1, k2)
            assert (v1 == v2) == (parsed[k1] == parsed[k2]), (k1, k2)
