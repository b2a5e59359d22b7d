"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a SURVEY.md §2 operator (or a training-data
pipeline op) phrased over the driver-provided tables at ``sf_dir``; the
matching ``oracle_sql()`` string computes the identical result in DuckDB
(tables pre-registered as views). Column names AND value rounding are
aligned on both sides. Entries without an oracle (noted inline) are
non-SQL-expressible (Arrow-UDF kernels, iterative engine runs) and get
the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec
from lightcrawler_spark.functions.spark_udfs import resolve_link_udf
from lightcrawler_spark.operators import scheduler
from lightcrawler_spark.operators.admission import (
    admission_predicate,
    apply_robots_filter,
    host_expr,
    robots_rules_df,
)
from lightcrawler_spark.operators.dedup import (
    anti_join_seen,
    bloom_prefilter,
    build_bloom_shards,
)
from lightcrawler_spark.operators.extract import synthesize_pagination
from lightcrawler_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from lightcrawler_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_counts,
)
from lightcrawler_spark.operators.textdedup import (
    exact_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_udf,
)
from lightcrawler_spark.plans.bfs import bfs_oracle_sql, crawl_bfs


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BFS crawl-frontier expansion (round loop + anti-join
    dedup — the engine's core) over the lineitem web graph at sf0.001."""
    return crawl_bfs(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# crawl-semantics queries (SURVEY.md §2.2, §2.3, §2.5, §2.6)
# ---------------------------------------------------------------------------

def q_canonicalize_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1–C3: resolve a relative link (incl. entity decode, ../ pop,
    default-port strip, host lowercasing) against a base URL."""
    c = _t(spark, sf_dir, "customer")
    base = F.concat(
        F.lit("http://WWW.Shop"), (F.col("c_custkey") % 20).cast("string"),
        F.lit(".com:80/cat/sub/index.html"),
    )
    link = F.concat(
        F.lit("../item"), F.col("c_custkey").cast("string"),
        F.lit(".htm?a=1&amp;b=2"),
    )
    return c.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        resolve_link_udf(link, base).alias("url"),
    )


def q_frontier_dedup_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: frontier dedup — new links anti-joined against the seen set
    on md5(url)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    new = li.select(
        F.concat(
            F.lit("http://h"), (F.col("l_partkey") % 50).cast("string"),
            F.lit(".test/p/"), F.col("l_partkey").cast("string"),
        ).alias("url")
    ).distinct().withColumn("url_md5", F.md5("url"))
    seen = part.filter(F.col("p_size") > 25).select(
        F.md5(
            F.concat(
                F.lit("http://h"), (F.col("p_partkey") % 50).cast("string"),
                F.lit(".test/p/"), F.col("p_partkey").cast("string"),
            )
        ).alias("url_md5")
    )
    return anti_join_seen(new, seen).select("url_md5", "url")


def q_priority_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3: priority assignment by first-matching rule, then per-host
    pop of the top-3 by (priority DESC, insert_seq ASC)."""
    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")).alias("host"),
        F.concat(
            F.lit("http://h"), (F.col("user_id") % 10).cast("string"),
            F.lit(".test/"), F.col("event_type"), F.lit("/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("event_id").cast("long").alias("insert_seq"),
    )
    prioritized = scheduler.assign_priority(
        frontier, [(r"#/click/#", 5), (r"#/purchase/#", 3)]
    )
    return scheduler.pop_per_host(prioritized, 3).select(
        "host", "url",
        F.col("priority_level").cast("int").alias("priority_level"),
        F.col("pop_rank").cast("int").alias("pop_rank"),
    )


def q_admission_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5/F6/F7: the admission battery (protocol, depth, deny
    regexes on url + linktext, allow-list OR) as one predicate."""
    part = _t(spark, sf_dir, "part")
    ext = (
        F.when(F.col("p_size") % 4 == 0, "htm")
        .when(F.col("p_size") % 4 == 1, "jpg")
        .when(F.col("p_size") % 4 == 2, "css")
        .otherwise("pdf")
    )
    links = part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.concat(
            F.lit("http://www.shop.test/item/"),
            F.col("p_partkey").cast("string"), F.lit("."), ext,
        ).alias("url"),
        F.col("p_name").alias("linktext"),
        F.lit("<a>").alias("linkcode"),
        (F.col("p_size") % 6).cast("int").alias("depth"),
    )
    spec = CrawlSpec(
        seeds=["http://www.shop.test/"],
        follow_mode=0,
        max_depth=4,
        url_filter_rules=[r"#\.(jpg|css)$# i"],
        linktext_filter_rules=[r"#lavender# i"],
        url_follow_rules=[r"#\.htm$#"],
        linktext_follow_rules=[r"#cornflower# i"],
    )
    return links.filter(
        admission_predicate(spec, "http://www.shop.test/")
    ).select("p_partkey", "url", "linktext", "depth")


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: robots.txt Disallow prefixes as a broadcast anti-join."""
    part = _t(spark, sf_dir, "part")
    path = (
        F.when(F.col("p_size") % 3 == 0, "/private/doc")
        .when(F.col("p_size") % 3 == 1, "/pub/doc")
        .otherwise("/doc")
    )
    links = part.select(
        F.concat(
            F.lit("http://h"), (F.col("p_partkey") % 5).cast("string"),
            F.lit(".test"), path, F.col("p_partkey").cast("string"),
            F.lit(".htm"),
        ).alias("url")
    )
    robots = [
        ("h0.test", "User-agent: *\nDisallow: /private/\n"),
        ("h1.test", "User-agent: *\nDisallow: /private/\n"),
        ("h2.test", "User-agent: specialbot\nDisallow: /\n"),  # not our UA
    ]
    rules = robots_rules_df(spark, robots, "PHPCrawl")
    return apply_robots_filter(links, rules).select("url")


def q_politeness_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: per-host politeness budget — fetch round assignment with
    budget 2 per host per round."""
    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")).alias("host"),
        F.col("event_id").cast("long").alias("insert_seq"),
        F.lit(0).alias("priority_level"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority_level").desc(), F.col("insert_seq").asc()
    )
    return frontier.withColumn("rank", F.row_number().over(w)).select(
        "host", "insert_seq",
        F.floor((F.col("rank") - 1) / 2).cast("long").alias("round_no"),
    )


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: pagination synthesis from the JS page counter."""
    part = _t(spark, sf_dir, "part")
    pages = part.select(
        F.concat(
            F.lit("http://shop.test/list"), F.col("p_partkey").cast("string"),
            F.lit("/index_0.htm"),
        ).alias("url"),
        F.concat(
            F.lit("<script>var countPage = "),
            (F.col("p_size") % 10).cast("string"), F.lit("</script>"),
        ).alias("body_text"),
    )
    return synthesize_pagination(pages).select("referer", "url")


def q_status_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: crawl status aggregation (events as the fetch log)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("requests"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count_distinct(F.col("user_id")).cast("long").alias("users"),
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analog tumbling window: hourly counts per event type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap splits sessions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ: route through LTZ (session tz = UTC) to
    # get epoch seconds — matches DuckDB's epoch() on the naive value
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dup_key"),
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_signatures(docs, k=5, num_hashes=8).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[F.col(f"sig_{j}") for j in range(8)],
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return ngram_jaccard_pairs(docs, k=8, threshold=0.1).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("inter").cast("long").alias("inter"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return with_lang_id(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("en_score").cast("long").alias("en_score"),
        F.col("zh_score").cast("long").alias("zh_score"),
        F.col("es_score").cast("long").alias("es_score"),
        "lang_pred",
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return with_quality_score(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "punct_ratio", "upper_ratio", "mean_word_len", "quality_score",
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return with_token_counts(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("alnum_tokens").cast("long").alias("alnum_tokens"),
        F.col("n_chars_calc").cast("long").alias("n_chars_calc"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return with_fingerprint(docs, k=16).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "fingerprint",
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, q, k=3).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, q, k=3, n_bits=4).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks)
# ---------------------------------------------------------------------------

def q_crawl_golden_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BSP crawl engine end-to-end on the deterministic fixture web,
    sequential budget — verified against the reference-semantics
    simulator via a VALUES-literal oracle."""
    from lightcrawler_spark.fixtures import (
        ROBOTS_FIXTURE,
        default_spec,
        make_images,
        make_webgraph,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    web = make_webgraph(n_lists=1, details_per_list=2, images=make_images(4))
    web_df = spark.createDataFrame(
        [
            (p["url"], p["host"], p["status"], p["content_type"],
             p["redirect_to"], bytearray(p["body"]), p["image_id"],
             p["latency_ms"])
            for p in web
        ],
        "url string, host string, status int, content_type string, "
        "redirect_to string, body binary, image_id string, latency_ms int",
    )
    spec = default_spec(budget=1)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(web_df, spec),
        robots_fixture=ROBOTS_FIXTURE,
    )
    # micro-rounds: AQE's per-stage replanning dominates at fixture scale
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        result = engine.run(max_rounds=100)
        out = result.trace.select(
            F.col("seq").cast("long").alias("seq"),
            "url", "url_md5",
            F.col("depth").cast("int").alias("depth"),
        ).orderBy("seq")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return out


def _golden_fixture_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        ROBOTS_FIXTURE,
        default_spec,
        make_images,
        make_webgraph,
        simulate_reference_crawl,
    )

    web = make_webgraph(n_lists=1, details_per_list=2, images=make_images(4))
    golden = simulate_reference_crawl(web, default_spec(budget=1), ROBOTS_FIXTURE)
    rows = ",\n".join(
        f"({t['seq']}, '{t['url']}', '{t['url_md5']}', {t['depth']})"
        for t in golden
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, url, url_md5, "
        "CAST(depth AS INT) AS depth FROM (VALUES\n"
        + rows
        + "\n) AS t(seq, url, url_md5, depth) ORDER BY seq"
    )


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit simhash per document (Arrow UDF — no SQL oracle)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        simhash_udf(F.col("text")).alias("simhash"),
    )


def q_image_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint per-row invariants over the image+caption table
    (decode dims, PSNR ≥ 40 dB lossy, exact lossless, phash) —
    mapInPandas kernel, rows-only check."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.operators.images import verify_images

    rows = make_images(64)
    df = spark.createDataFrame(
        [
            (r["image_id"], bytearray(r["bytes"]), r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"])
            for r in rows
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    return verify_images(df).filter(
        F.col("dims_ok") & F.col("psnr_ok") & F.col("exact_ok") & F.col("phash_ok")
    )


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-Bloom seen-filter prefilter (Arrow UDF — rows-only):
    survivors of probable-seen pruning before the exact anti-join."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    seen = part.select(
        F.concat(F.lit("http://b.test/p/"), F.col("p_partkey").cast("string")).alias("url")
    )
    new = li.select(
        F.concat(F.lit("http://b.test/p/"), (F.col("l_partkey") * 3).cast("string")).alias("url")
    ).distinct()
    shards = build_bloom_shards(seen, num_shards=16, fpp=0.01)
    return bloom_prefilter(new, shards, num_shards=16).select("url")


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_bfs": crawl_bfs,
        "canonicalize_resolve": q_canonicalize_resolve,
        "frontier_dedup_anti": q_frontier_dedup_anti,
        "priority_pop": q_priority_pop,
        "admission_filter": q_admission_filter,
        "robots_filter": q_robots_filter,
        "politeness_rounds": q_politeness_rounds,
        "pagination": q_pagination,
        "status_report": q_status_report,
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "ngram_jaccard": q_ngram_jaccard,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_fingerprint,
        "embedding_topk": q_embedding_topk,
        "embedding_lsh": q_embedding_lsh,
        "crawl_golden_fixture": q_crawl_golden_fixture,
        "simhash_docs": q_simhash_docs,
        "image_verify": q_image_verify,
        "bloom_prefilter": q_bloom_prefilter,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_bfs": bfs_oracle_sql(),
        "canonicalize_resolve": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       'http://www.shop' || (c_custkey % 20) || '.com/cat/item'
         || c_custkey || '.htm?a=1&b=2' AS url
FROM customer
""",
        "frontier_dedup_anti": """
WITH new_links AS (
  SELECT DISTINCT 'http://h' || (l_partkey % 50) || '.test/p/' || l_partkey AS url
  FROM lineitem
),
seen AS (
  SELECT md5('http://h' || (p_partkey % 50) || '.test/p/' || p_partkey) AS url_md5
  FROM part WHERE p_size > 25
)
SELECT md5(url) AS url_md5, url
FROM new_links
WHERE md5(url) NOT IN (SELECT url_md5 FROM seen)
""",
        "priority_pop": """
WITH frontier AS (
  SELECT 'h' || (user_id % 10) AS host,
         'http://h' || (user_id % 10) || '.test/' || event_type || '/'
           || event_id AS url,
         CAST(event_id AS BIGINT) AS insert_seq,
         CASE WHEN event_type = 'click' THEN 5
              WHEN event_type = 'purchase' THEN 3 ELSE 0 END AS priority_level
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY host ORDER BY priority_level DESC, insert_seq ASC
  ) AS pop_rank FROM frontier
)
SELECT host, url, CAST(priority_level AS INT) AS priority_level,
       CAST(pop_rank AS INT) AS pop_rank
FROM ranked WHERE pop_rank <= 3
""",
        "admission_filter": """
WITH links AS (
  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
         'http://www.shop.test/item/' || p_partkey || '.' ||
           CASE WHEN p_size % 4 = 0 THEN 'htm'
                WHEN p_size % 4 = 1 THEN 'jpg'
                WHEN p_size % 4 = 2 THEN 'css'
                ELSE 'pdf' END AS url,
         p_name AS linktext,
         CAST(p_size % 6 AS INT) AS depth
  FROM part
)
SELECT p_partkey, url, linktext, depth
FROM links
WHERE depth <= 4
  AND NOT regexp_matches(url, '(?i)\\.(jpg|css)$')
  AND NOT regexp_matches(linktext, '(?i)lavender')
  AND (regexp_matches(url, '\\.htm$')
       OR regexp_matches(linktext, '(?i)cornflower'))
""",
        "robots_filter": """
WITH links AS (
  SELECT 'http://h' || (p_partkey % 5) || '.test' ||
           CASE WHEN p_size % 3 = 0 THEN '/private/doc'
                WHEN p_size % 3 = 1 THEN '/pub/doc'
                ELSE '/doc' END || p_partkey || '.htm' AS url,
         'h' || (p_partkey % 5) || '.test' AS host
  FROM part
)
SELECT url FROM links
WHERE NOT (host IN ('h0.test', 'h1.test')
           AND url LIKE 'http://' || host || '/private/%')
""",
        "politeness_rounds": """
WITH frontier AS (
  SELECT 'h' || (user_id % 10) AS host,
         CAST(event_id AS BIGINT) AS insert_seq
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY insert_seq ASC) AS rnk
  FROM frontier
)
SELECT host, insert_seq, CAST((rnk - 1) // 2 AS BIGINT) AS round_no
FROM ranked
""",
        "pagination": """
WITH pages AS (
  SELECT 'http://shop.test/list' || p_partkey || '/index_0.htm' AS referer,
         'http://shop.test/list' || p_partkey || '/' AS dir,
         p_size % 10 AS n FROM part
)
SELECT referer, dir || 'index_' || i || '.htm' AS url
FROM (SELECT referer, dir, unnest(generate_series(1, n - 1)) AS i
      FROM pages WHERE n > 1)
""",
        "status_report": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS requests,
       round(sum(value), 4) AS total_value,
       round(avg(value), 4) AS avg_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events GROUP BY event_type
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
""",
        "sessionize": """
WITH marked AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) > 1800 THEN 1
              WHEN lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM marked GROUP BY user_id
""",
        "dedup_exact": """
WITH keyed AS (
  SELECT doc_id, md5(text) AS dup_key,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, dup_key
FROM keyed WHERE rn = 1
""",
        "minhash_signatures": """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
        FROM d)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       min(md5('0' || chr(31) || sh)) AS sig_0,
       min(md5('1' || chr(31) || sh)) AS sig_1,
       min(md5('2' || chr(31) || sh)) AS sig_2,
       min(md5('3' || chr(31) || sh)) AS sig_3,
       min(md5('4' || chr(31) || sh)) AS sig_4,
       min(md5('5' || chr(31) || sh)) AS sig_5,
       min(md5('6' || chr(31) || sh)) AS sig_6,
       min(md5('7' || chr(31) || sh)) AS sig_7
FROM g GROUP BY doc_id
""",
        "ngram_jaccard": """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
g AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS sh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM d)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.1
""",
        "lang_id": """
WITH s AS (
  SELECT doc_id,
    (length(text) - length(replace(text, ' the ', ''))) // 5
    + (length(text) - length(replace(text, ' and ', ''))) // 5
    + (length(text) - length(replace(text, ' of ', ''))) // 4
    + (length(text) - length(replace(text, ' to ', ''))) // 4
    + (length(text) - length(replace(text, ' in ', ''))) // 4 AS en_score,
    (length(text) - length(replace(text, '的', '')))
    + (length(text) - length(replace(text, '是', '')))
    + (length(text) - length(replace(text, '了', '')))
    + (length(text) - length(replace(text, '在', '')))
    + (length(text) - length(replace(text, '和', ''))) AS zh_score,
    (length(text) - length(replace(text, ' el ', ''))) // 4
    + (length(text) - length(replace(text, ' la ', ''))) // 4
    + (length(text) - length(replace(text, ' de ', ''))) // 4
    + (length(text) - length(replace(text, ' que ', ''))) // 5
    + (length(text) - length(replace(text, ' los ', ''))) // 5 AS es_score
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(en_score AS BIGINT) AS en_score,
       CAST(zh_score AS BIGINT) AS zh_score,
       CAST(es_score AS BIGINT) AS es_score,
       CASE WHEN zh_score >= en_score AND zh_score >= es_score AND zh_score > 0
              THEN 'zh'
            WHEN en_score >= es_score AND en_score > 0 THEN 'en'
            WHEN es_score > 0 THEN 'es'
            ELSE 'und' END AS lang_pred
FROM s
""",
        "quality_score": """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS upper_c,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) + 1.0 AS words
  FROM documents
),
r AS (
  SELECT doc_id,
         round(punct / greatest(n, 1.0), 6) AS punct_ratio,
         round(upper_c / greatest(n, 1.0), 6) AS upper_ratio,
         round(n / words, 4) AS mean_word_len,
         n, punct, upper_c, words
  FROM q
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, punct_ratio, upper_ratio, mean_word_len,
       round(
         least(n / 10.0, 50.0)
         + CASE WHEN punct_ratio > 0.001 AND punct_ratio < 0.2 THEN 25.0 ELSE 0.0 END
         + CASE WHEN mean_word_len > 3.0 AND mean_word_len < 12.0 THEN 25.0 ELSE 0.0 END,
       4) AS quality_score
FROM r
""",
        "token_counts": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
         AS ws_tokens,
       CAST(len(list_filter(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                            x -> length(x) > 0)) AS BIGINT) AS alnum_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc
FROM documents
""",
        "doc_fingerprint": """
WITH g AS (
  SELECT doc_id, md5(substr(text, i, 16)) AS h
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 15, 1), 16)) AS i
        FROM documents)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, min(h) AS fingerprint
FROM g GROUP BY doc_id
""",
        "embedding_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
         ) AS rank
  FROM pairs
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
        "embedding_lsh": """
WITH w AS (
  SELECT b, i, CAST(ascii(substr(md5(b || '_' || i), 1, 1)) - 79 AS DOUBLE) AS wt
  FROM (SELECT unnest(generate_series(0, 3)) AS b),
       (SELECT unnest(generate_series(1, 64)) AS i)
),
ux AS (
  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
bits AS (
  SELECT vec_id, b,
         CASE WHEN sum(x * wt) >= 0 THEN '1' ELSE '0' END AS bit
  FROM ux JOIN w USING (i) GROUP BY vec_id, b
),
buckets AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY b) AS bucket
  FROM bits GROUP BY vec_id
),
q AS (SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qe, bk.bucket
      FROM embeddings e JOIN buckets bk ON bk.vec_id = e.vec_id
      WHERE e.vec_id < 10),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim
  FROM q
  JOIN buckets bk ON bk.bucket = q.bucket
  JOIN embeddings e ON e.vec_id = bk.vec_id
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
         ) AS rank
  FROM pairs
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
        "crawl_golden_fixture": _golden_fixture_values_sql(),
        # simhash_docs / image_verify / bloom_prefilter: Arrow-UDF kernels
        # with no ANSI-SQL equivalent → rows-only checks (intentional).
    }
