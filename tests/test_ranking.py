"""BM25 scoring vs a direct Python reference implementation."""

import math
import re

import pytest

from lightcrawler_spark.operators.ranking import bm25_scores

DOCS = [
    (0, "Spark query engines join tables fast"),
    (1, "the quick brown fox; no relevant terms at all"),
    (2, "query query query — spark spark JOIN"),
    (3, "join join join join"),
    (4, ""),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {
        i: [w for w in re.split(r"[^0-9a-z]+", t.lower()) if w] for i, t in docs
    }
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(tk) / avgdl)
            )
        out[i] = s
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in bm25_scores(df, ["spark", "query", "join"]).collect()
    }
    exp = _py_bm25(DOCS, ["spark", "query", "join"])
    for i, _ in DOCS:
        assert got[i]["score"] == pytest.approx(exp[i], abs=1e-12)
    # tf columns and ordering sanity
    assert got[2]["tf_query"] == 3 and got[2]["tf_spark"] == 2
    assert got[2]["score"] > got[0]["score"] > got[1]["score"]
    assert got[1]["score"] == 0.0 and got[4]["score"] == 0.0


def test_bm25_term_absent_from_corpus(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["zzz"]).collect()}
    assert all(v == 0.0 for v in got.values())


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])
