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


# ---------------------------------------------------------------------------
# robots Sitemap: discovery
# ---------------------------------------------------------------------------

def test_robots_sitemap_directives(spark):
    from lightcrawler_spark.operators.sitemap import discover_robots_sitemaps

    body = (
        "# comment\r\n"
        "User-agent: *\r\n"
        "Disallow: /private\r\n"
        "Sitemap: http://a.test/sm1.xml\r\n"
        "  SITEMAP:http://a.test/sm2.xml\r\n"
        "\tsitemap: http://a.test/sm3.xml\r\n"
        "NotSitemap: http://a.test/decoy.xml\r\n"
        "Sitemap :  http://a.test/space-before-colon.xml\r\n"
    )
    robots = spark.createDataFrame(
        [("a.test", body), ("b.test", "User-agent: *\nDisallow: /")],
        "host string, body string",
    )
    rows = discover_robots_sitemaps(robots).orderBy("host", "seq").collect()
    # decoy + space-before-colon rejected; order preserved; b.test empty
    assert [(r.host, r.seq, r.sitemap_url) for r in rows] == [
        ("a.test", 0, "http://a.test/sm1.xml"),
        ("a.test", 1, "http://a.test/sm2.xml"),
        ("a.test", 2, "http://a.test/sm3.xml"),
    ]


# ---------------------------------------------------------------------------
# tf-idf keywords
# ---------------------------------------------------------------------------

def test_tfidf_keywords_ranks_distinctive_terms(spark):
    import math as m

    docs = spark.createDataFrame(
        [
            (1, "common zebra common common"),
            (2, "common common yak"),
            (3, "common plain plain"),
        ],
        "doc_id long, text string",
    )
    from lightcrawler_spark.operators.ranking import tfidf_keywords

    out = tfidf_keywords(docs, top_k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}

    def idf_micro(df):
        return round(m.log(4.0 / (1 + df)) * 1e6) + 1_000_000

    # doc 1: the +1 smoothing floors idf at 1.0, so common (tf=3,
    # score 3.0) outranks zebra (tf=1, idf ln2+1 ≈ 1.693) — the sklearn
    # convention: raw frequency wins unless the rare term repeats
    assert rows[(1, 1)].term == "common"
    assert rows[(1, 1)].score_micro == 3 * idf_micro(3)
    assert rows[(1, 2)].term == "zebra"
    assert rows[(1, 2)].score_micro == idf_micro(1)
    # doc 3: plain tf=2 df=1 dominates
    assert rows[(3, 1)].term == "plain"
    assert rows[(3, 1)].score_micro == 2 * idf_micro(1)
    # every doc emits at most top_k rows
    assert out.groupBy("doc_id").count().agg({"count": "max"}).first()[0] <= 2


# ---------------------------------------------------------------------------
# aspect bucketing
# ---------------------------------------------------------------------------

def test_aspect_bucket_assignments(spark):
    from lightcrawler_spark.operators.images import (
        SDXL_ASPECT_BUCKETS,
        assign_aspect_buckets,
    )

    imgs = spark.createDataFrame(
        [
            (1, 1000, 1000),   # square → 1024x1024
            (2, 1290, 1000),   # ≈1.29 → 1216x832? no: nearest of
                               # 1.0,1.286,0.778,1.462,... → 1152/896=1.2857
            (3, 500, 1200),    # ≈0.417 → 640x1536 (0.4167)
            (4, 2000, 820),    # ≈2.44 → 1536x640 (2.4)
        ],
        "image_id long, w int, h int",
    )
    out = {r.image_id: r for r in assign_aspect_buckets(imgs).collect()}
    assert (out[1].bucket_w, out[1].bucket_h) == (1024, 1024)
    assert (out[2].bucket_w, out[2].bucket_h) == (1152, 896)
    assert (out[3].bucket_w, out[3].bucket_h) == (640, 1536)
    assert (out[4].bucket_w, out[4].bucket_h) == (1536, 640)
    # brute-force argmin agrees on every bucket choice
    for r in out.values():
        ar = r.w / r.h
        best = min(
            ((abs(ar - bw / bh), i) for i, (bw, bh) in enumerate(SDXL_ASPECT_BUCKETS))
        )[1]
        assert r.bucket_idx == best


def test_aspect_bucket_exact_tie_breaks_to_lower_index(spark):
    from lightcrawler_spark.operators.images import assign_aspect_buckets

    # custom 2-bucket grid with an EXACT tie: aspect 1.5 vs buckets at
    # 1.0 and 2.0 → dist 0.5 both (exact in binary) → lower index wins
    imgs = spark.createDataFrame([(1, 3, 2)], "image_id long, w int, h int")
    row = assign_aspect_buckets(imgs, buckets=((10, 10), (20, 10))).collect()[0]
    assert row.bucket_idx == 0
    assert (row.bucket_w, row.bucket_h) == (10, 10)
