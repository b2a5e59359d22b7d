"""Conditional-GET revisits (spec.conditional_get): engine==simulator
golden parity on the validator fixture, 304 semantics (no body, no
re-extraction, zero bytes), validator mismatch behavior, and the
flag-off control. RFC 9110 §13 applied to the P7 revisit path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    conditional_spec,
    make_conditional_webgraph,
    simulate_reference_crawl,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

pytestmark = pytest.mark.usefixtures("spark")


def _run_engine(spark, spec):
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, make_conditional_webgraph()), spec),
    )
    res = engine.run(max_rounds=100)
    return (
        res.trace.select(
            "seq", "url", "url_md5", "status", "n_attempts", "bytes_received"
        )
        .orderBy("seq")
        .collect()
    )


def test_conditional_golden_parity(spark):
    spec = conditional_spec()
    golden = simulate_reference_crawl(make_conditional_webgraph(), spec)
    rows = _run_engine(spark, spec)
    assert [
        (r["seq"], r["url"], r["status"], r["n_attempts"]) for r in rows
    ] == [
        (t["seq"], t["url"], t["status"], t["n_attempts"]) for t in golden
    ]
    # both validator arms revalidate: the ETag page and the
    # Last-Modified page answer 304 on revisit, the validator-less page
    # is a full 200 refetch
    by_status = {}
    for r in rows:
        by_status.setdefault(r["url"], []).append(r["status"])
    assert by_status["http://www.site-cg.test/list/a.htm"] == [200, 304]
    assert by_status["http://www.site-cg.test/list/c.htm"] == [200, 304]
    assert by_status["http://www.site-cg.test/list/b.htm"] == [200, 200]
    # a 304 transfers no body
    for r in rows:
        if r["status"] == 304:
            assert r["bytes_received"] == 0


def test_conditional_flag_off_control(spark):
    # same web, same revisit rules, conditional_get off: every revisit
    # is a full 200 refetch — no validators travel, no 304 exists
    spec = conditional_spec(conditional_get=False)
    golden = simulate_reference_crawl(make_conditional_webgraph(), spec)
    rows = _run_engine(spark, spec)
    assert [(r["seq"], r["url"], r["status"]) for r in rows] == [
        (t["seq"], t["url"], t["status"]) for t in golden
    ]
    assert all(r["status"] != 304 for r in rows)
    assert sum(
        1 for r in rows
        if r["url"] == "http://www.site-cg.test/list/a.htm"
    ) == 2


def test_stale_validator_full_refetch(spark):
    # fetcher-level mismatch path (a static golden web cannot change its
    # ETag mid-crawl): a stale If-None-Match must NOT revalidate — the
    # server answers 200 with the full body
    spec = conditional_spec()
    fetcher = SyntheticFetcher(
        webgraph_df(spark, make_conditional_webgraph()), spec
    )
    work = spark.createDataFrame(
        [
            ("http://www.site-cg.test/list/a.htm", '"v1"', None),
            ("http://www.site-cg.test/list/a.htm", '"stale"', None),
            ("http://www.site-cg.test/list/c.htm", None,
             "Mon, 01 Jan 2024 00:00:00 GMT"),
            ("http://www.site-cg.test/list/c.htm", None,
             "Tue, 02 Jan 2024 00:00:00 GMT"),
        ],
        "url string, if_none_match string, if_modified_since string",
    )
    rows = fetcher.fetch(work).select(
        "url", "if_none_match", "if_modified_since", "status", "body", "etag",
        "last_modified",
    ).collect()
    got = {
        (r["url"], r["if_none_match"], r["if_modified_since"]): r
        for r in rows
    }
    fresh = got[("http://www.site-cg.test/list/a.htm", '"v1"', None)]
    stale = got[("http://www.site-cg.test/list/a.htm", '"stale"', None)]
    assert fresh["status"] == 304 and fresh["body"] is None
    assert stale["status"] == 200 and stale["body"] is not None
    # the server repeats its validator either way (harvest keeps working)
    assert fresh["etag"] == '"v1"' and stale["etag"] == '"v1"'
    lm_hit = got[(
        "http://www.site-cg.test/list/c.htm", None,
        "Mon, 01 Jan 2024 00:00:00 GMT",
    )]
    lm_miss = got[(
        "http://www.site-cg.test/list/c.htm", None,
        "Tue, 02 Jan 2024 00:00:00 GMT",
    )]
    assert lm_hit["status"] == 304
    assert lm_miss["status"] == 200
    assert lm_miss["last_modified"] == "Mon, 01 Jan 2024 00:00:00 GMT"


def test_304_pages_carry_no_links(spark):
    # re-extraction is skipped on a 304: /list/a.htm links /d1.htm, but
    # d1 must be discovered exactly once (from the round-2 full fetch),
    # never re-admitted by the revisit's 304
    spec = conditional_spec()
    rows = _run_engine(spark, spec)
    d1 = [r for r in rows if r["url"].endswith("/d1.htm")]
    assert len(d1) == 1


def test_conditional_resume_parity(spark, tmp_path):
    # kill the crawl mid-way (before the revisits fire), resume on the
    # same parquet store: validators live in the committed pages rows,
    # so the resumed crawl's 304s (and whole trace) match the
    # uninterrupted run bit-for-bit — resume-safe by construction
    from lightcrawler_spark.plans.storage import RoundStore

    spec = conditional_spec()
    web = webgraph_df(spark, make_conditional_webgraph())

    full_store = RoundStore(spark, str(tmp_path / "full"))
    full = CrawlEngine(
        spark, spec, SyntheticFetcher(web, spec), store=full_store
    ).run(max_rounds=60)

    part_store = RoundStore(spark, str(tmp_path / "part"))
    CrawlEngine(
        spark, spec, SyntheticFetcher(web, spec), store=part_store
    ).run(max_rounds=2)
    resumed = CrawlEngine(
        spark, spec, SyntheticFetcher(web, spec),
        store=RoundStore(spark, str(tmp_path / "part")),
    ).run(max_rounds=60, resume=True)

    def rows(res):
        return [
            (r["seq"], r["url"], r["status"], r["bytes_received"])
            for r in res.trace.orderBy("seq").collect()
        ]

    assert rows(resumed) == rows(full)
    assert any(r[2] == 304 for r in rows(full))
