"""Once-task offline replay (operators/replay.py) — quirk pins vs the
reference's loadLocalFiles/handleDetailPage
(worker/SpiderGovCnZhengceOnceTask.class.php:52-120)."""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.replay import (
    normalize_breaks,
    parse_raw_snapshot,
    raw_snapshot_expr,
    replay_snapshots,
)


def _parse_one(spark, blob: str) -> dict:
    row = (
        spark.createDataFrame([(blob,)], "snapshot string")
        .select(parse_raw_snapshot(F.col("snapshot")).alias("p"))
        .select("p.url", "p.source")
        .first()
    )
    return {"url": row["url"], "source": row["source"]}


def test_basic_layout(spark):
    got = _parse_one(spark, "http://a.test/x.htm  \nmeta line\nbody1\nbody2")
    assert got["url"] == "http://a.test/x.htm"  # line 1 trimmed
    assert got["source"] == "body1\nbody2"      # line 2 discarded


def test_trailing_zero_loop_stop_quirk(spark):
    # `while ($buf = fgets($f))` never reads a FINAL bare "0" (falsy in
    # PHP) — it must vanish from the body.
    got = _parse_one(spark, "http://a.test/\nm\nkeep\n0")
    assert got["source"] == "keep"
    # ...but a mid-file "0" line keeps its newline when read, so it stays.
    got = _parse_one(spark, "http://a.test/\nm\n0\nkeep")
    assert got["source"] == "0\nkeep"


def test_body_exactly_zero(spark):
    got = _parse_one(spark, "http://a.test/\nm\n0")
    assert got["source"] == ""


def test_normalize_breaks_list_and_hole(spark):
    # the five listed spellings + CR become \n; '<BR/>' is NOT in the
    # reference's str_replace list and must survive verbatim.
    src = "a<br>b<br />c<BR>d<BR />e<br/>f<BR/>g\rh"
    out = (
        spark.createDataFrame([(src,)], "s string")
        .select(normalize_breaks(F.col("s")).alias("o"))
        .first()["o"]
    )
    assert out == "a\nb\nc\nd\ne\nf<BR/>g\nh"


def test_round_trip_through_snapshot_format(spark):
    pages = spark.createDataFrame(
        [
            ("http://h1.test/p1", "sts=200", "line one\nline two"),
            ("http://h2.test/p2", "sts=404", "single"),
        ],
        "url string, meta string, body string",
    )
    blobs = pages.select(
        raw_snapshot_expr(F.col("url"), F.col("meta"), F.col("body"))
        .alias("snapshot")
    )
    got = {
        r["url"]: r["source"]
        for r in replay_snapshots(blobs).collect()
    }
    assert got == {
        "http://h1.test/p1": "line one\nline two",
        "http://h2.test/p2": "single",
    }


def test_registry_contract_runs(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["raw_replay"](spark, "/root/testdata/sf0.001")
    rows = df.limit(5).collect()
    assert rows and set(df.columns) == {"doc_id", "url", "source"}
    assert all("<BR/>" in r["source"] for r in rows)  # the hole survives
    assert all(r["url"].endswith(".htm") for r in rows)
