"""Unit tests for the corpus-curation operators added in round 3:
corpus-global line dedup (dedup_lines) and per-key quota capping
(cap_per_key)."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.sampling import cap_per_key
from lightcrawler_spark.operators.textdedup import dedup_lines

LONG_A = "this is a long boilerplate line that repeats everywhere"
LONG_B = "another long unique line of content for the first document"
LONG_C = "a different long unique line belonging to the second doc"
SHORT = "short line"  # < 30 chars: never deduped


def test_dedup_lines_first_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "\n".join([LONG_A, LONG_B, SHORT])),
            (2, "\n".join([LONG_A, LONG_C, SHORT])),
            (3, LONG_A),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, min_chars=30).collect()
    }
    # doc 1 holds the first occurrence of LONG_A — keeps everything
    assert out[1]["text_deduped"] == "\n".join([LONG_A, LONG_B, SHORT])
    assert out[1]["n_lines_removed"] == 0
    # doc 2 loses its copy of LONG_A but keeps the short line
    assert out[2]["text_deduped"] == "\n".join([LONG_C, SHORT])
    assert out[2]["n_lines_removed"] == 1
    # doc 3 is ONLY the duplicate line -> empty body, still present
    assert out[3]["text_deduped"] == ""
    assert out[3]["n_lines_removed"] == 1
    assert out[3]["n_lines"] == 1


def test_dedup_lines_position_order_within_doc(spark):
    # duplicate INSIDE one document: first position wins, order preserved
    df = spark.createDataFrame(
        [(7, "\n".join([LONG_B, LONG_A, LONG_A, LONG_C]))],
        "doc_id long, text string",
    )
    row = dedup_lines(df, min_chars=30).collect()[0]
    assert row["text_deduped"] == "\n".join([LONG_B, LONG_A, LONG_C])
    assert row["n_lines_removed"] == 1


def test_dedup_lines_short_lines_untouched(spark):
    df = spark.createDataFrame(
        [(1, SHORT + "\n" + SHORT), (2, SHORT)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_chars=30).collect()}
    assert out[1]["text_deduped"] == SHORT + "\n" + SHORT
    assert out[2]["text_deduped"] == SHORT
    assert out[1]["n_lines_removed"] == 0


def test_cap_per_key_exactness_vs_plain_window(spark):
    # 3 sources with 40/25/3 rows; quality = doc_id % 17 (collides -> id
    # tiebreak matters); salted two-stage must equal the plain window
    rows = [(i, ["a", "b", "c"][i % 3] if i < 90 else "a", i % 17)
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    order = [F.col("q").desc()]
    salted = cap_per_key(df, key_col="source", k=10, order_by=order,
                         salt_partitions=8)
    plain = cap_per_key(df, key_col="source", k=10, order_by=order,
                        salt_partitions=1)
    key = lambda r: (r["source"], r["key_rank"], r["doc_id"])
    assert sorted(map(key, salted.collect())) == sorted(
        map(key, plain.collect())
    )
    # each key capped at k, ranks contiguous from 1
    got = salted.groupBy("source").agg(
        F.count("*").alias("n"), F.max("key_rank").alias("mx")
    ).collect()
    for r in got:
        assert r["n"] <= 10 and r["mx"] == r["n"]


def test_cap_per_key_small_groups_survive_whole(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, source string"
    )
    out = cap_per_key(df, k=5, salt_partitions=4).collect()
    assert len(out) == 3
