"""P8 cross-round host cooldown: a host fetched in round r is ineligible
until round r + host_delay_rounds; idle politeness rounds age the
cooldown instead of terminating the crawl."""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import default_spec, make_images, make_webgraph
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


@pytest.fixture(scope="module")
def web_df(spark):
    web = make_webgraph(n_lists=2, details_per_list=3, images=make_images(8))
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


def _run(spark, web_df, **spec_kw):
    spec = default_spec(**spec_kw)
    engine = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec))
    return engine.run(max_rounds=60)


def test_cooldown_spaces_host_fetches(spark, web_df):
    result = _run(spark, web_df, budget=2, host_delay_rounds=3)
    rows = result.trace.select("round", "url").collect()
    # host of each fetch
    from lightcrawler_spark.functions.urlkit import split_url

    by_host: dict[str, list[int]] = {}
    for r in rows:
        h = split_url(r["url"]).host
        by_host.setdefault(h, []).append(r["round"])
    assert by_host, "no fetches traced"
    for host, rounds in by_host.items():
        rounds = sorted(set(rounds))
        for a, b in zip(rounds, rounds[1:]):
            assert b - a >= 3, f"{host} fetched in rounds {rounds}"


def test_cooldown_preserves_seen_set(spark, web_df):
    base = _run(spark, web_df, budget=4)
    cooled = _run(spark, web_df, budget=4, host_delay_rounds=2)
    assert (
        sorted(r["url_md5"] for r in cooled.frontier.collect())
        == sorted(r["url_md5"] for r in base.frontier.collect())
    )
    # same pages fetched overall, just spread across more rounds
    assert cooled.pages_fetched == base.pages_fetched
    assert cooled.rounds_run >= base.rounds_run
