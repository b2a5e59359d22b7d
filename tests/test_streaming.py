"""Structured-Streaming ingest variant: file-source micro-batch runs with
availableNow, checked against the batch operators' results."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec


@pytest.fixture()
def links_dir(spark, tmp_path):
    rows = []
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(200):
        ext = ["htm", "jpg", "htm", "pdf"][i % 4]
        rows.append((
            f"http://www.shop.test/item/{i % 50}.{ext}",  # dupes: i%50
            f"link {i}", "<a>", 1 + (i % 3),
            t0 + datetime.timedelta(seconds=i),
        ))
    df = spark.createDataFrame(
        rows, "url string, linktext string, linkcode string, depth int, "
              "event_ts timestamp")
    p = str(tmp_path / "links_in")
    df.repartition(4).write.parquet(p)
    return p


SPEC = CrawlSpec(
    seeds=["http://www.shop.test/"],
    follow_mode=0,
    max_depth=4,
    url_filter_rules=[r"#\.(jpg|css)$# i"],
)


def test_stream_admit_matches_batch(spark, links_dir, tmp_path):
    from lightcrawler_spark.streaming.ingest import (
        admit_link_stream, start_frontier_sink,
    )

    schema = spark.read.parquet(links_dir).schema
    seen = spark.createDataFrame(
        [(F"http://www.shop.test/item/{i}.htm",) for i in range(0, 10)],
        "url string",
    ).select(F.md5("url").alias("url_md5"))

    stream = spark.readStream.schema(schema).parquet(links_dir)
    admitted = admit_link_stream(stream, SPEC, SPEC.seeds[0], seen=seen)
    out_dir = str(tmp_path / "frontier_out")
    q = start_frontier_sink(admitted, out_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    urls = {r["url"] for r in got.collect()}

    # batch reference: same predicates + dedup + anti-join
    from lightcrawler_spark.operators.admission import admission_predicate

    batch = (
        spark.read.parquet(links_dir)
        .filter(admission_predicate(SPEC, SPEC.seeds[0]))
        .withColumn("url_md5", F.md5("url"))
        .dropDuplicates(["url_md5"])
        .join(seen, "url_md5", "left_anti")
    )
    expect = {r["url"] for r in batch.collect()}
    assert urls == expect
    assert len(urls) > 0
    # no .jpg admitted, no already-seen item survived
    assert not any(u.endswith(".jpg") for u in urls)
    assert "http://www.shop.test/item/3.htm" not in urls

    # exactly-once resume: restarting the same query over the same input
    # with the same checkpoint must not duplicate rows
    q2 = start_frontier_sink(
        admit_link_stream(
            spark.readStream.schema(schema).parquet(links_dir),
            SPEC, SPEC.seeds[0], seen=seen),
        out_dir, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == len(expect)


def test_windowed_metrics(spark, tmp_path):
    from lightcrawler_spark.streaming.ingest import windowed_fetch_metrics

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("h1", 1000, 10, t0 + datetime.timedelta(seconds=s))
        for s in range(0, 180, 10)
    ] + [
        ("h2", 500, 20, t0 + datetime.timedelta(seconds=s))
        for s in range(0, 180, 30)
    ]
    df = spark.createDataFrame(
        rows, "host string, bytes_received long, latency_ms int, "
              "fetch_ts timestamp")
    p = str(tmp_path / "results_in")
    df.write.parquet(p)

    stream = spark.readStream.schema(
        spark.read.parquet(p).schema).parquet(p)
    agg = windowed_fetch_metrics(stream)
    # complete mode for the assertion: with a single availableNow batch the
    # watermark never advances past any window, so append would emit nothing
    # until the next batch — the production sink runs append + watermark
    q = (
        agg.writeStream.format("memory").queryName("metrics_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select * from metrics_test order by window_start, host").collect()
    by_key = {(r["window_start"].minute, r["host"]): r for r in got}
    assert by_key[(0, "h1")]["requests"] == 6      # 12:00 window: s=0..50
    assert by_key[(0, "h1")]["bytes_received"] == 6000
    assert by_key[(0, "h2")]["requests"] == 2      # s=0,30
    assert by_key[(1, "h1")]["requests"] == 6      # 12:01 window
    assert by_key[(2, "h1")]["requests"] == 6      # 12:02 window
    assert by_key[(2, "h2")]["requests"] == 2


def test_host_politeness_gate_stateful(spark, tmp_path):
    """applyInPandasWithState politeness: per host, at most one URL per
    crawl_delay of EVENT time; state carries across micro-batches."""
    from lightcrawler_spark.streaming.politeness import host_politeness_gate

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # h1: candidates every second → only every 5th admitted
    for s in range(20):
        rows.append(("h1", f"http://h1/{s}", t0 + datetime.timedelta(seconds=s)))
    # h2: candidates every 7 s → all admitted (7 ≥ 5)
    for s in range(0, 21, 7):
        rows.append(("h2", f"http://h2/{s}", t0 + datetime.timedelta(seconds=s)))
    df = spark.createDataFrame(rows, "host string, url string, event_ts timestamp")
    p = str(tmp_path / "cand_in")
    df.repartition(3).write.parquet(p)

    stream = spark.readStream.schema(spark.read.parquet(p).schema).parquet(p)
    gated = host_politeness_gate(stream, crawl_delay_s=5.0)
    q = (
        gated.writeStream.format("memory").queryName("polite_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from polite_test").collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["url"])
    assert sorted(by_host["h1"]) == [
        "http://h1/0", "http://h1/10", "http://h1/15", "http://h1/5",
    ]
    assert sorted(by_host["h2"]) == [
        "http://h2/0", "http://h2/14", "http://h2/7",
    ]

    # state persists across a restart on the SAME checkpoint with new
    # input arriving 1 s after the last admitted h1 candidate → blocked
    more = spark.createDataFrame(
        [("h1", "http://h1/16", t0 + datetime.timedelta(seconds=16)),
         ("h1", "http://h1/21", t0 + datetime.timedelta(seconds=21))],
        "host string, url string, event_ts timestamp",
    )
    more.write.mode("append").parquet(p)
    ck = str(tmp_path / "polite_ckpt")
    # replay from scratch through a durable checkpointed sink instead:
    out = str(tmp_path / "polite_out")
    q1 = (
        host_politeness_gate(
            spark.readStream.schema(spark.read.parquet(p).schema).parquet(p),
            crawl_delay_s=5.0)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q1.awaitTermination(120)
    urls = {r["url"] for r in spark.read.parquet(out).collect()}
    assert "http://h1/16" not in urls   # 16 s: only 1 s after 15 → blocked
    assert "http://h1/21" in urls       # 21 s: 6 s after 15 → admitted


def test_image_caption_stream_gate_matches_batch(spark, tmp_path):
    """Streaming gate == batch gate on scalar rules; phash dedup keeps
    exactly one row per surviving phash (bounded state variant)."""
    import datetime

    from lightcrawler_spark.operators.images import filter_image_caption_pairs
    from lightcrawler_spark.streaming.corpus import (
        gate_image_caption_stream, start_corpus_sink,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(120):
        w, h = (16, 16) if i % 5 == 0 else (128, 96)       # too_small every 5th
        cap = "a" if i % 7 == 0 else f"caption words here {i % 30}"
        rows.append((
            f"img_{i}", bytearray(b"\x00" * 8), w, h, "png", cap,
            1000 + (i % 30),                                # duplicate phashes
            t0 + datetime.timedelta(seconds=i),
        ))
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long, event_ts timestamp")
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "pairs_in")
    df.coalesce(1).write.parquet(src)  # one file -> one micro-batch,
    # stream order == id order within the batch

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = start_corpus_sink(
        gate_image_caption_stream(stream),
        str(tmp_path / "kept_out"), str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "kept_out")).collect()

    batch = filter_image_caption_pairs(df.drop("event_ts")).filter("keep")
    batch_rows = batch.collect()
    # same number of kept rows, same surviving phash set, and every
    # streamed row passes the batch scalar rules
    assert len(got) == len(batch_rows)
    assert {r["phash"] for r in got} == {r["phash"] for r in batch_rows}
    batch_ok_ids = {r["image_id"] for r in
                    filter_image_caption_pairs(df.drop("event_ts"))
                    .filter(F.col("reject_reason").isNull()
                            | (F.col("reject_reason") == "near_dup"))
                    .collect()}
    assert all(r["image_id"] in batch_ok_ids for r in got)
