"""P4–P6 + north_rule resume: the parquet-backed RoundStore commits a
watermark per round; a restart discards in-flight (uncommitted) rounds
and the resumed crawl reproduces the uninterrupted run exactly."""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    ROBOTS_FIXTURE, default_spec, make_images, make_webgraph,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.plans.storage import RoundStore
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


@pytest.fixture(scope="module")
def web_df(spark):
    web = make_webgraph(n_lists=1, details_per_list=2, images=make_images(4))
    return spark.createDataFrame(
        [
            (p["url"], p["host"], p["status"], p["content_type"],
             p["redirect_to"], bytearray(p["body"]), p["image_id"],
             p["latency_ms"])
            for p in web
        ],
        "url string, host string, status int, content_type string, "
        "redirect_to string, body binary, image_id string, latency_ms int",
    )


def _trace_rows(result):
    return [
        (r["seq"], r["url"], r["depth"])
        for r in result.trace.orderBy("seq").collect()
    ]


def test_parquet_store_resume_matches_uninterrupted(spark, web_df, tmp_path):
    spec = default_spec(budget=2)

    # reference: uninterrupted run on a parquet store
    full_store = RoundStore(spark, str(tmp_path / "full"))
    full = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                       store=full_store, robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=50)
    assert full.pages_fetched > 4

    # interrupted run: stop after 2 rounds, then resume in a NEW engine
    part_store = RoundStore(spark, str(tmp_path / "part"))
    CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                store=part_store, robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=2)
    resumed_store = RoundStore(spark, str(tmp_path / "part"))
    resumed = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                          store=resumed_store,
                          robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=50, resume=True)

    assert _trace_rows(resumed) == _trace_rows(full)
    assert (
        sorted(r["url_md5"] for r in resumed.frontier.collect())
        == sorted(r["url_md5"] for r in full.frontier.collect())
    )


def test_purge_inflight_discards_uncommitted_round(spark, tmp_path):
    store = RoundStore(spark, str(tmp_path / "s"))
    df1 = spark.createDataFrame([("a",)], "url_md5 string")
    df2 = spark.createDataFrame([("b",)], "url_md5 string")
    store.write("frontier", 0, df1)
    store.commit_round(0)
    store.write("frontier", 1, df2)  # in-flight: never committed

    assert store.last_complete_round() == 0
    store.purge_inflight(store.last_complete_round())
    got = store.read_upto("frontier", 10)
    assert [r["url_md5"] for r in got.collect()] == ["a"]


def test_round_lineage_column(spark, tmp_path):
    """North_rule: per-partition lineage — every row carries the round
    that produced it."""
    store = RoundStore(spark, str(tmp_path / "s"))
    for rnd in range(3):
        store.write(
            "trace", rnd,
            spark.createDataFrame([(f"u{rnd}",)], "url string"),
        )
        store.commit_round(rnd)
    got = store.read_upto("trace", 2)
    assert sorted((r["url"], r["round"]) for r in got.collect()) == [
        ("u0", 0), ("u1", 1), ("u2", 2)
    ]
