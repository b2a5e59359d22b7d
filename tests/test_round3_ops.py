"""Unit tests for the round-3 fourth-session operators: semantic dedup
clusters, anchor-text aggregation, change-frequency recrawl scheduling,
sitemap parsing, and the corpus unigram LM score. Each has an
oracle-backed contract query too (__spark_entry__.py); these tests pin
the SEMANTICS with hand-computable fixtures and edge cases the sf tables
don't exercise."""

import math

from pyspark.sql import functions as F

from lightcrawler_spark.operators.indexing import aggregate_anchor_text
from lightcrawler_spark.operators.scheduler import recrawl_schedule
from lightcrawler_spark.operators.similarity import (
    semantic_dedup_assignments,
)
from lightcrawler_spark.operators.sitemap import parse_sitemaps
from lightcrawler_spark.operators.text import unigram_logprob


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_clusters_known_groups(spark):
    # three exact-duplicate families along coordinate axes + one loner;
    # identical directions share every SRP bucket, so blocking cannot
    # split a family, and cosine(parallel) = 1.0 >= any threshold
    def vec(axis, scale):
        v = [0.0] * 8
        v[axis] = scale
        return v

    rows = [
        (0, vec(0, 1.0)), (1, vec(0, 2.0)), (2, vec(0, 0.5)),   # family A
        (3, vec(1, 1.0)), (4, vec(1, 3.0)),                     # family B
        (5, vec(2, 1.0)),                                       # loner
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_assignments(emb, threshold=0.9, block_bits=2)
    got = {r.vec_id: (r.cluster, r.is_canonical) for r in out.collect()}
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (3, False),
        5: (5, True),
    }


def test_semantic_dedup_singletons_kept(spark):
    # orthogonal vectors with a high threshold: no surviving pairs →
    # every row its own canonical singleton
    rows = [(i, [1.0 if j == i else 0.0 for j in range(6)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_assignments(emb, threshold=0.5, block_bits=2)
    rows_out = out.collect()
    assert len(rows_out) == 6
    assert all(r.cluster == r.vec_id and r.is_canonical for r in rows_out)


# ---------------------------------------------------------------------------
# anchor text aggregation
# ---------------------------------------------------------------------------

def test_anchor_text_agg_order_and_topn(spark):
    links = spark.createDataFrame(
        [("t", "beta")] * 3 + [("t", "alpha")] * 3 + [("t", "gamma")] * 2
        + [("t", "delta")] * 1 + [("u", "only")],
        "target_url string, linktext string",
    )
    out = {
        r.target_url: r
        for r in aggregate_anchor_text(links, top_n=3).collect()
    }
    # count DESC then text ASC: alpha(3) before beta(3); delta(1) cut by top-3
    assert out["t"].top_anchors == "alpha|beta|gamma"
    assert out["t"].n_inlinks == 9
    assert out["t"].n_variants == 4
    assert out["u"].top_anchors == "only"
    assert out["u"].n_inlinks == 1
    assert out["u"].n_variants == 1


# ---------------------------------------------------------------------------
# recrawl scheduling
# ---------------------------------------------------------------------------

def _hist_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, unix long, content_hash string, seq long"
    ).select(
        "url",
        F.timestamp_seconds(F.col("unix")).alias("fetch_ts"),
        "content_hash",
        "seq",
    )


def test_recrawl_schedule_change_math(spark):
    base = 1_700_000_000
    rows = [
        # url A: 5 fetches over 40000 s, hashes h1 h1 h2 h2 h3 → 2 changes;
        # period = floor(40000 / 3) = 13333 → within clamps
        *[("A", base + 10_000 * i, h, i)
          for i, h in enumerate(["h1", "h1", "h2", "h2", "h3"])],
        # url B: 2 fetches, unchanged → period = 7200/1, change_rate 0
        ("B", base, "x", 0), ("B", base + 7_200, "x", 1),
        # url C: single fetch → max_interval, rate 0
        ("C", base, "y", 0),
    ]
    out = {
        r.url: r
        for r in recrawl_schedule(_hist_df(spark, rows), seq_col="seq").collect()
    }
    a = out["A"]
    assert (a.n_fetches, a.n_changes) == (5, 2)
    assert a.change_rate == 0.5
    assert a.next_interval_sec == 13_333
    assert a.next_fetch_unix == base + 40_000 + 13_333
    b = out["B"]
    assert (b.n_fetches, b.n_changes, b.change_rate) == (2, 0, 0.0)
    assert b.next_interval_sec == 7_200
    c = out["C"]
    assert (c.n_fetches, c.n_changes) == (1, 0)
    assert c.next_interval_sec == 30 * 86_400


def test_recrawl_schedule_clamps(spark):
    base = 1_700_000_000
    rows = [
        # url F (fast-changing): 3 fetches 60 s apart, every hash new →
        # period floor(120/3)=40 < min 3600 → clamped up
        ("F", base, "a", 0), ("F", base + 60, "b", 1),
        ("F", base + 120, "c", 2),
        # url S (slow): 2 fetches 100 days apart, one change →
        # period 4.32e6 > max 2.592e6 → clamped down
        ("S", base, "a", 0), ("S", base + 100 * 86_400, "b", 1),
    ]
    out = {
        r.url: r
        for r in recrawl_schedule(_hist_df(spark, rows), seq_col="seq").collect()
    }
    assert out["F"].next_interval_sec == 3_600
    assert out["F"].change_rate == 1.0
    assert out["S"].next_interval_sec == 30 * 86_400


# ---------------------------------------------------------------------------
# sitemap parsing
# ---------------------------------------------------------------------------

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      http://ex.test/a
    </loc>
    <lastmod>2024-03-01</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://ex.test/b</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://ex.test/c</loc><priority>1.0</priority></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>http://ex.test/sitemap-a.xml</loc>
    <lastmod>2024-02-02T10:00:00+00:00</lastmod>
  </sitemap>
  <sitemap><loc> http://ex.test/sitemap-b.xml </loc></sitemap>
</sitemapindex>"""


def test_sitemap_urlset_fields_and_order(spark):
    pages = spark.createDataFrame(
        [("http://ex.test/sitemap.xml", URLSET)], "sitemap_url string, body string"
    )
    rows = parse_sitemaps(pages).orderBy("seq").collect()
    # entry without <loc> is dropped (mandatory field)
    assert [r.loc for r in rows] == [
        "http://ex.test/a", "http://ex.test/b", "http://ex.test/c"
    ]
    assert rows[0].kind == "urlset"
    assert rows[0].lastmod == "2024-03-01"
    assert rows[0].changefreq == "weekly"
    assert rows[0].priority == 0.8
    assert rows[1].lastmod is None and rows[1].priority is None
    assert rows[2].priority == 1.0
    # seq preserves document order, including the dropped entry's slot
    assert [r.seq for r in rows] == [0, 1, 3]


def test_sitemap_index_detected(spark):
    pages = spark.createDataFrame(
        [("http://ex.test/sitemap.xml", INDEX)], "sitemap_url string, body string"
    )
    rows = parse_sitemaps(pages).orderBy("seq").collect()
    assert [r.kind for r in rows] == ["index", "index"]
    assert [r.loc for r in rows] == [
        "http://ex.test/sitemap-a.xml", "http://ex.test/sitemap-b.xml"
    ]
    assert rows[0].lastmod == "2024-02-02T10:00:00+00:00"
    assert rows[1].lastmod is None


def test_sitemap_garbage_yields_nothing(spark):
    pages = spark.createDataFrame(
        [("u1", "<html><body>not a sitemap</body></html>"), ("u2", "")],
        "sitemap_url string, body string",
    )
    assert parse_sitemaps(pages).count() == 0


# ---------------------------------------------------------------------------
# unigram logprob
# ---------------------------------------------------------------------------

def test_unigram_logprob_closed_form(spark):
    # corpus: "a a b" + "a c" → counts a=3, b=1, c=1, N=5
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}

    def micro(c):
        return round(math.log(c) * 1e6)

    exp1 = round((micro(3) * 2 + micro(1)) / 3 / 1e6 - math.log(5), 6)
    exp2 = round((micro(3) + micro(1)) / 2 / 1e6 - math.log(5), 6)
    assert out[1].n_tokens == 3
    assert out[1].mean_logprob == exp1
    assert out[2].n_tokens == 2
    assert out[2].mean_logprob == exp2
    # the common-token doc scores higher (more corpus-typical)
    assert out[1].mean_logprob > out[2].mean_logprob


def test_unigram_logprob_empty_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "!!! ???"), (3, "")],
        "doc_id long, text string",
    )
    out = unigram_logprob(docs)
    assert [r.doc_id for r in out.orderBy("doc_id").collect()] == [1]
