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


def test_compaction_bounds_files_and_preserves_resume(spark, web_df, tmp_path):
    """Segment compaction (compact_every): identical trace, bounded dir
    count, resume still green over a compacted store."""
    import os

    spec = default_spec(budget=2)

    plain_store = RoundStore(spark, str(tmp_path / "plain"))
    plain = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                        store=plain_store, robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=50)

    comp_root = str(tmp_path / "comp")
    comp_store = RoundStore(spark, comp_root, compact_every=3)
    comp = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                       store=comp_store, robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=50)
    assert _trace_rows(comp) == _trace_rows(plain)

    # bounded dir count: one segment + at most compact_every round dirs
    wm = comp_store.last_complete_round()
    for table in ("pages", "frontier"):
        entries = os.listdir(os.path.join(comp_root, table))
        segs = [d for d in entries if d.startswith("seg=")]
        rounds = [d for d in entries if d.startswith("round=")]
        assert len(segs) == 1
        assert len(rounds) <= 3, entries
        # uncompacted plain store: one dir per contributing round
        assert len(segs) + len(rounds) < wm + 1

    # resume over the compacted store reproduces the full crawl
    resumed = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                          store=RoundStore(spark, comp_root, compact_every=3),
                          robots_fixture=ROBOTS_FIXTURE).run(
        max_rounds=50, resume=True)
    assert resumed.pages_fetched == plain.pages_fetched
    assert _trace_rows(resumed) == _trace_rows(plain)


def test_compaction_crash_states_read_consistently(spark, web_df, tmp_path):
    """Every intermediate crash state of compact() must read the same
    rows: half-written .tmp (ignored), segment live + absorbed dirs not
    yet deleted (segment wins), cleanup done."""
    import os
    import shutil

    spec = default_spec(budget=2)
    root = str(tmp_path / "crash")
    store = RoundStore(spark, root)
    CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                store=store, robots_fixture=ROBOTS_FIXTURE).run(max_rounds=4)
    wm = store.last_complete_round()
    want = store.read_upto("pages", wm).count()

    base = os.path.join(root, "pages")
    # state 1: .tmp exists, no segment yet
    store.read_upto("pages", wm).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, f"seg={wm}.compact.tmp"))
    assert store.read_upto("pages", wm).count() == want
    # state 2: segment renamed live, absorbed round dirs still present
    os.rename(os.path.join(base, f"seg={wm}.compact.tmp"),
              os.path.join(base, f"seg={wm}"))
    assert store.read_upto("pages", wm).count() == want
    # state 3: cleanup (what compact() finishes with)
    for d in list(os.listdir(base)):
        if d.startswith("round="):
            shutil.rmtree(os.path.join(base, d))
    assert store.read_upto("pages", wm).count() == want
    # purge also clears stray .tmp leftovers
    os.makedirs(os.path.join(base, "seg=99.compact.tmp"), exist_ok=True)
    store.purge_inflight(wm)
    assert not any(d.endswith(".tmp") for d in os.listdir(base))
