"""Generative synthetic web (sources/synthetic_web.py): pins the
scale-soak substrate to the proven fixture path.

The key guarantee: an engine run over `GenerativeFetcher` (web computed
from the URL, no materialized rows) is row-for-row identical to the same
run over `SyntheticFetcher(materialize_webgraph(...))` — so every trace/
politeness/dedup property the golden fixtures prove transfers to the
soak runs at any N, and the input_hint product invariants (caption
equality, exact PNG pixel round-trip) hold per row.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.imagecodec import decode_image, phash64
from lightcrawler_spark.plans.assemble import build_image_caption_table
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher
from lightcrawler_spark.sources.synthetic_web import (
    GenerativeFetcher,
    SynthWebSpec,
    article_url_expr,
    materialize_webgraph,
    seed_urls,
    soak_crawl_spec,
    synth_image_array,
)

WEB = SynthWebSpec(n_nodes=200, n_hosts=8, out_degree=4, img_every=4)


def _trace_rows(res):
    return [
        (r["seq"], r["url"], r["status"], r["bytes_received"],
         r["latency_ms"], r["n_attempts"])
        for r in res.trace.orderBy("seq").collect()
    ]


@pytest.fixture(scope="module")
def gen_result(spark):
    spec = soak_crawl_spec(WEB, spark, per_host_budget=3, n_seeds=4,
                           max_rounds=12)
    return CrawlEngine(spark, spec, GenerativeFetcher(WEB, spec)).run()


class TestGenerativeMatchesMaterialized:
    def test_trace_and_frontier_identical(self, spark, gen_result):
        spec = soak_crawl_spec(WEB, spark, per_host_budget=3, n_seeds=4,
                               max_rounds=12)
        mat = CrawlEngine(
            spark, spec, SyntheticFetcher(materialize_webgraph(spark, WEB), spec)
        ).run()
        assert gen_result.pages_fetched == mat.pages_fetched > 0
        assert _trace_rows(gen_result) == _trace_rows(mat)
        gf = sorted(r["url"] for r in gen_result.frontier.collect())
        mf = sorted(r["url"] for r in mat.frontier.collect())
        assert gf == mf

    def test_rerun_is_deterministic(self, spark, gen_result):
        spec = soak_crawl_spec(WEB, spark, per_host_budget=3, n_seeds=4,
                               max_rounds=12)
        again = CrawlEngine(spark, spec, GenerativeFetcher(WEB, spec)).run()
        assert _trace_rows(again) == _trace_rows(gen_result)


class TestWebGeometry:
    def test_seed_urls_fetch_as_status_200(self, spark):
        spec = soak_crawl_spec(WEB, spark, per_host_budget=1, n_seeds=6)
        work = spark.createDataFrame(
            [(u,) for u in seed_urls(spark, WEB, 6)], "url string"
        )
        rows = GenerativeFetcher(WEB, spec).fetch(work).collect()
        assert len(rows) == 6
        assert all(r["status"] == 200 for r in rows)
        assert all("text/html" in r["content_type"] for r in rows)

    def test_unknown_and_mangled_urls_404(self, spark):
        spec = soak_crawl_spec(WEB, spark, per_host_budget=1, n_seeds=1)
        work = spark.createDataFrame(
            [
                ("http://h0.test/p999999",),       # out of range
                ("http://h0.test/nothing",),       # no node id at all
                ("http://h7.test/p0",),            # wrong host for node 0
                ("http://h0.test/i3.png",),        # 3 % img_every != 0
            ],
            "url string",
        )
        rows = GenerativeFetcher(WEB, spec).fetch(work).collect()
        assert all(r["status"] == 404 for r in rows)
        assert all(r["body"] is None for r in rows)

    def test_links_stay_in_range_and_deduped(self, spark, gen_result):
        # every admitted frontier URL names a valid node of the web
        import re

        urls = [r["url"] for r in gen_result.frontier.collect()]
        assert len(urls) == len(set(urls))
        for u in urls:
            m = re.match(r"^http://h(\d+)\.test/(p|i)(\d+)(\.png)?$", u)
            assert m, u
            assert int(m.group(3)) < WEB.n_nodes
            assert int(m.group(1)) < WEB.n_hosts

    def test_per_host_budget_respected(self, spark, gen_result):
        per_round = (
            gen_result.pages.groupBy("round", "host").count().collect()
        )
        assert max(r["count"] for r in per_round) <= 3

    def test_skew_pins_nodes_to_host0(self, spark):
        web = SynthWebSpec(n_nodes=500, n_hosts=8, out_degree=4,
                           img_every=0, skew_pct=90)
        hosts = (
            spark.range(500)
            .select(
                F.regexp_extract(
                    article_url_expr(web, F.col("id")),
                    r"^http://h(\d+)\.test", 1,
                ).cast("int").alias("h")
            )
            .groupBy("h").count().collect()
        )
        by_host = {r["h"]: r["count"] for r in hosts}
        assert by_host[0] > 0.8 * 500  # ~90% pinned to the mega-host


class TestProductInvariants:
    def test_input_hint_rows_exact(self, spark, gen_result):
        prod = build_image_caption_table(gen_result.pages).collect()
        assert len(prod) > 10
        for r in prod:
            iid = int(r["image_id"][1:])
            # input_hint: exact caption equality
            assert r["caption"] == f"Synthetic caption {iid}"
            # input_hint: decoded-pixel equality (PNG is lossless → exact,
            # which implies PSNR = inf >= 40 dB) + dims + phash
            arr = decode_image(bytes(r["bytes"]))
            expect = synth_image_array(iid)
            assert np.array_equal(arr, expect)
            assert (r["w"], r["h"]) == (expect.shape[1], expect.shape[0])
            assert r["fmt"] == "png"
            assert r["phash"] == phash64(expect)


class TestGenerativeConditional:
    """Conditional-GET on the generative substrate: the soak fetcher's
    deterministic ETags make revisit crawls revalidate (304, no body),
    identically to SyntheticFetcher over the materialized twin."""

    def _spec(self, spark):
        import dataclasses

        # deliberately tiny: a narrow revisit rule (4 articles) and few
        # rounds keep the two back-to-back engine runs inside the test
        # session's memory (the full-size soak arm lives in
        # tools/engine_soak.py --conditional)
        spec = soak_crawl_spec(WEB, spark, per_host_budget=8, n_seeds=4,
                               max_rounds=12)
        return dataclasses.replace(
            spec,
            revisit_url_rules=[r"#/p[0-3]$# i"],
            revisit_after_rounds=2,
            max_revisits=1,
            conditional_get=True,
        )

    def test_generative_matches_materialized(self, spark):
        spec = self._spec(spark)
        gen = CrawlEngine(
            spark, spec, GenerativeFetcher(WEB, spec)
        ).run(max_rounds=12)
        mat = CrawlEngine(
            spark, spec,
            SyntheticFetcher(materialize_webgraph(spark, WEB), spec),
        ).run(max_rounds=12)
        assert _trace_rows(gen) == _trace_rows(mat)
        n304 = sum(1 for t in _trace_rows(gen) if t[2] == 304)
        assert n304 > 0
        # the synthetic web never changes: EVERY revisit of a known
        # article revalidates, and transfers zero bytes
        for t in _trace_rows(gen):
            if t[2] == 304:
                assert t[3] == 0
