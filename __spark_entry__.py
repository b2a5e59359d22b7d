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

import functools as _functools
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


def q_per_host_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 at scale: per-host budget pop + deterministic host interleave
    (the engine's per_host_politeness round serialization —
    lightcrawler_spark/operators/scheduler.py pop_per_host +
    interleave_rank; generalizes PHPCrawler.class.php:906-925's global
    budget per host, SURVEY §2.5 P8)."""
    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias("host"),
        F.col("event_id").cast("long").alias("insert_seq"),
        (F.col("user_id") % 3).cast("int").alias("priority_level"),
    )
    work = scheduler.interleave_rank(scheduler.pop_per_host(frontier, 4))
    return work.select("host", "insert_seq", "pop_rank", "fetch_rank")


def q_crawl_delay_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 extension: robots Crawl-delay as per-host budget overrides
    (operators/scheduler.py pop_per_host host_budgets dim — hosts that
    declared a delay get floor(round_duration/delay), others the
    default). The dim is one tiny broadcast row per declaring host, so
    the scale shape stays the host-partitioned rank window + filter."""
    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias("host"),
        F.col("event_id").cast("long").alias("insert_seq"),
        (F.col("user_id") % 3).cast("int").alias("priority_level"),
    )
    budgets = spark.createDataFrame(
        [("h0", 1), ("h1", 2), ("h2", 6)], "host string, host_budget int"
    )
    work = scheduler.pop_per_host(frontier, 4, host_budgets=budgets)
    return work.select("host", "insert_seq", "pop_rank")


def q_backoff_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 extension: adaptive throttle backoff (operators/scheduler.py:
    backoff_blocked_hosts — the function the engine itself calls). From
    a synthetic fetched-pages history, hosts whose last 429/503 was in
    round t are blocked for rounds t+1..t+ceil(Retry-After/duration)
    (default wait without the header); the blocked dim is evaluated at
    three probe rounds. One partial-agg groupBy(host), no window — the
    tiny result broadcasts into the frontier anti-join."""
    ev = _t(spark, sf_dir, "events")
    pages = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string")).alias("host"),
        ((F.col("event_id") % 10) + 1).cast("int").alias("round"),
        F.when(F.col("event_id") % 7 == 0, F.lit(429))
        .when(F.col("event_id") % 11 == 0, F.lit(503))
        .otherwise(F.lit(200))
        .cast("int")
        .alias("status"),
        F.when(
            F.col("event_id") % 3 == 0,
            ((F.col("event_id") % 5) * 7).cast("int"),
        ).alias("retry_after"),
    )
    parts = [
        scheduler.backoff_blocked_hosts(
            pages, probe, round_duration_s=5.0, default_backoff_rounds=2
        ).withColumn("check_round", F.lit(probe).cast("int"))
        for probe in (8, 11, 14)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("check_round", "host")


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
    """N-gram Jaccard near-dup pairs on the SCALE-SHAPED plan: candidate
    pairs blocked by language, so the inverted-index self-join never
    crosses blocks (the corpus-scale formulation, oracle-verified)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(
        docs, k=8, threshold=0.1, block_cols=["lang"]
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("inter").cast("long").alias("inter"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph → per-document cluster assignment
    (operators/graph.py): min-label-propagation connected components
    over the lang-blocked n-gram Jaccard pairs, one shuffle-bounded job
    per iteration, convergence detected via Observation (label sum is
    strictly decreasing until the fixpoint). The canonical flag marks
    the row a corpus-scale dedup pass keeps."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(
        docs, k=8, threshold=0.1, block_cols=["lang"]
    )
    return dedup_cluster_assignments(pairs, docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup clusters: phash pigeonhole band pairs
    (operators/images.py:phash_near_dup_pairs — 16-bit-chunk equi-join,
    exact popcount ≤ 6 after) → min-label connected components
    (operators/graph.py). Input synthesized relationally (60 groups of
    5 phashes whose members differ in ≤ 2 low bits, bases spread across
    chunks via shifted xors) so the DuckDB oracle re-derives the table,
    the band-join semantics AND the clusters. Scale shape: candidate
    pairs come from a chunk equi-join (never all-pairs), clusters from
    one shuffle-bounded job per CC iteration."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.images import phash_near_dup_pairs

    imgs = (
        spark.range(300)
        .select(
            F.col("id").alias("image_id"),
            (F.col("id") % 60).alias("_g"),
            F.floor(F.col("id") / 60).cast("long").alias("_j"),
        )
        .select(
            "image_id",
            "_j",
            (F.col("_g") * F.lit(2654435761))
            .bitwiseXOR(F.shiftleft(F.col("_g") * F.lit(40503), 32))
            .alias("_base"),
        )
        .select(
            "image_id",
            F.when(
                F.col("_j") > 0,
                F.col("_base").bitwiseXOR(
                    F.pow(F.lit(2.0), (F.col("_j") * 2).cast("double"))
                    .cast("long")
                ),
            )
            .otherwise(F.col("_base"))
            .alias("phash"),
        )
    )
    pairs = phash_near_dup_pairs(imgs, max_hamming=6, id_col="image_id")
    return dedup_cluster_assignments(pairs, imgs, id_col="image_id").select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (operators/text.py:with_pii_scrub): URLs →
    emails → phones scrubbed sequentially with JVM regexp_replace,
    per-category counts from regexp_count. Deterministic PII is
    appended to each document so every pattern fires; the DuckDB oracle
    applies the identical regexes (ASCII classes only — same meaning in
    Java regex and RE2)."""
    from lightcrawler_spark.operators.text import with_pii_scrub

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via https://ex.test/p?id="),
            F.col("doc_id").cast("string"),
            F.lit(" or call +1 (555) 010-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("text"),
    )
    return with_pii_scrub(aug).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_url").cast("long").alias("n_url"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        "text_scrubbed",
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition signals
    (operators/text.py:with_repetition_stats): duplicated-line fraction,
    duplicated-line CHAR fraction, and top word-2/3-gram char coverage —
    all per-row array expressions (split → sort_array → aggregate), so
    the pass is a shuffle-free scan. Deterministic boilerplate lines are
    appended so the dup metrics fire; the DuckDB oracle computes the
    same quantities relationally (unnest → group-and-count)."""
    from lightcrawler_spark.operators.text import with_repetition_stats

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nboiler plate nav line\nboiler plate nav line"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\nrepeat me\nrepeat me")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return with_repetition_stats(aug).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_lines").cast("long").alias("n_lines"),
        "dup_line_frac",
        "dup_line_char_frac",
        "top2gram_char_frac",
        "top3gram_char_frac",
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/textdedup.py:decontaminate):
    flag training docs sharing any word 5-gram with a (deterministic)
    eval slice — doc_id % 7 == 0 plays the benchmark set, everything
    else is the training corpus. Scale shape: the eval n-gram set is
    broadcast; the training side is a scan + broadcast-hash probe, the
    only shuffle being the partial-aggregated per-doc hit count."""
    from lightcrawler_spark.operators.textdedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    return decontaminate(train, ev, n=5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_eval_ngram_hits").cast("long").alias("n_eval_ngram_hits"),
        "contaminated",
    )


def q_training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix assembly
    (operators/sampling.py): keep each doc iff the first 32 md5 bits of
    its doc_id map below the per-language rate — a single codegen'd
    filter next to the scan (no shuffle, resume-stable, nested across
    rate changes). The oracle replicates the hash with
    ('0x'||substr(md5(..),1,8))::uint64 / 2^32."""
    from lightcrawler_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    rates = {"en": 0.5, "zh": 0.25, "es": 0.75}
    return stratified_sample(docs, rates, keep_u=False).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "source",
    )


def q_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus rebalancing (operators/sampling.py:
    temperature_rebalance): downsample each language toward the
    α=0.5-smoothed mix, r_lang = sqrt(n_min/n_lang), decided row-locally
    by the doc's md5 uniform — no shuffle, resume-stable. The keep rule
    is evaluated as u·u·n_lang < n_min (all-exact IEEE ops) so the kept
    set is bit-identical in the DuckDB oracle."""
    from lightcrawler_spark.operators.sampling import temperature_rebalance

    docs = _t(spark, sf_dir, "documents")
    return temperature_rebalance(docs, alpha=0.5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "rebalance_rate",
        "sample_u",
    )


def q_dup_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span masking (operators/textdedup.py:
    mask_duplicate_ngrams) — the practical exact-substring-dedup analog
    (Lee et al. 2022): word 4-grams occurring in ≥2 distinct documents
    are corpus-duplicated; every token they cover is dropped from the
    body. groupBy(gram) partial-agg + equi-join + one groupBy(doc) —
    no window, no UDF; the oracle re-derives spans with
    generate_series/unnest."""
    from lightcrawler_spark.operators.textdedup import mask_duplicate_ngrams

    docs = _t(spark, sf_dir, "documents")
    return mask_duplicate_ngrams(docs, n=4, min_docs=2).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "dup_positions",
        "dup_token_fraction",
        "text_masked",
    )


def q_clip_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style image+caption alignment gate (operators/clipscore.py)
    — the LAION curation step: cosine(text_embedding, image_embedding)
    ≥ τ keeps the pair. Encoders are labeled deterministic stand-ins
    (hashed bag-of-words / channel-stat vector in integer micro-units);
    the scoring plan — one Arrow decode pass + codegen'd caption side +
    row-local exact-integer cosine, zero joins/shuffles — is the real
    production shape. The oracle pins the image vectors (same shared
    kernel) and genuinely recomputes the text hashing and the cosine."""
    from lightcrawler_spark.operators.clipscore import clip_scores

    df = _image_df(spark)
    return clip_scores(df, threshold=0.2).select(
        "image_id", "clip_score", "keep"
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global top-k vocabulary (operators/text.py:vocab_topk) —
    tokenizer-build seed list + coverage report. One map-side-combined
    groupBy(token) then TakeOrderedAndProject top-k (never a global
    sort); the cumulative-coverage window runs over ≤ k rows by
    construction. Deterministic tie-break (count DESC, token ASC)."""
    from lightcrawler_spark.operators.text import vocab_topk

    docs = _t(spark, sf_dir, "documents")
    return vocab_topk(docs, k=25).select(
        "tok", F.col("cnt").cast("long").alias("cnt"),
        "vocab_rank", "cum_frac",
    )


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end training-corpus build, composed purely from
    the verified operators: PII scrub → Gopher repetition gate
    (dup_line_frac ≤ 0.3, top2gram_char_frac ≤ 0.2) → exact dedup
    (lowest-id canonical) → benchmark decontamination (word 5-grams vs
    the doc_id % 7 eval slice, raw text) → deterministic stratified
    sample (en 0.5 / zh 0.25 / es 0.75). Every stage keeps the scale
    shape it was audited with (scan-local maps, one hash-groupBy, a
    broadcast probe, a codegen'd filter); the oracle re-derives the
    whole chain as one CTE pipeline."""
    from lightcrawler_spark.operators.sampling import stratified_sample
    from lightcrawler_spark.operators.text import (
        with_pii_scrub,
        with_repetition_stats,
    )
    from lightcrawler_spark.operators.textdedup import decontaminate, exact_dedup

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    scrub = with_pii_scrub(train).select(
        "doc_id", "lang", "source", F.col("text_scrubbed").alias("text")
    )
    rep = with_repetition_stats(scrub).filter(
        (F.col("dup_line_frac") <= 0.3) & (F.col("top2gram_char_frac") <= 0.2)
    )
    ded = exact_dedup(rep.select("doc_id", "lang", "source", "text"))
    clean = decontaminate(ded, ev, n=5).filter(~F.col("contaminated"))
    out = stratified_sample(
        clean, {"en": 0.5, "zh": 0.25, "es": 0.75}, keep_u=False
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global line-level exact dedup
    (operators/textdedup.py:dedup_lines): a line survives only in its
    first occurrence across the corpus, ordered by (doc_id, position);
    lines under 30 chars never participate. Deterministic boilerplate
    lines are appended so the pass fires. Scale shape: winner selection
    is a partial-aggregating groupBy(md5(line)).agg(min(struct)) — NOT a
    rank window — so a 10^8-occurrence boilerplate line collapses
    map-side; the mark-join is a binary-key equi-join AQE can
    skew-split."""
    from lightcrawler_spark.operators.textdedup import dedup_lines

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nFollow us on social media for the latest updates"
                  " and news"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nSubscribe to our newsletter to never miss an"
                      " update again"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup_lines(aug, min_chars=30, keep_text=False).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_lines",
        "n_lines_removed",
        "text_deduped",
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap (operators/sampling.py:cap_per_key): at most
    20 docs per source, preferring the longest (n_chars desc, doc_id
    tiebreak). Scale shape: salted two-stage top-k — a hot domain's rows
    spread over 8 local window partitions whose per-partition top-20
    bound the exact final rank's input at 160 rows/key, so no single
    window partition ever holds a whole domain."""
    from lightcrawler_spark.operators.sampling import cap_per_key

    docs = _t(spark, sf_dir, "documents")
    return cap_per_key(
        docs, key_col="source", k=20,
        order_by=[F.col("n_chars").desc()], salt_partitions=8,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("key_rank").cast("long").alias("key_rank"),
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


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs on the SCALE-SHAPED plan: SRP
    bucket blocking (block_bits=4) over the FULL table — the equi-join
    on bucket replaces the all-pairs cross join; the md5-derived
    hyperplanes make the bucket assignment (and therefore the survivor
    set) SQL-replicable, so the oracle verifies this exact plan."""
    from lightcrawler_spark.operators.similarity import cosine_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, threshold=0.35, block_bits=4).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "sim",
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


def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators/similarity.py:ivf_topk): sampled-centroid
    coarse quantizer, argmax-cosine list assignment, n_probe=2 probed
    lists, exact re-rank — the inverted-file scale path next to SRP-LSH;
    wholly relational, so the DuckDB oracle runs the identical algebra."""
    from lightcrawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, q, k=3, n_centroids=8, n_probe=2).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained coarse quantizer (operators/clustering.py:
    kmeans_centroids): 3 Lloyd iterations, k=8, exact int64 micro-unit
    arithmetic throughout — deterministic at any parallelism, so the
    unrolled-CTE DuckDB oracle hash-matches the centroids bit-for-bit.
    Assignment is a zero-shuffle literal-inlined projection; the update
    is one map-side-combined groupBy per iteration. Trains the
    `centroids` table ivf_topk accepts.

    Driver projection is SCALAR (cid, dim, value) — posexplode of the
    centroid vector — because the driver's canonicalizer pandas-sorts
    every column and cannot factorize list cells (CORRECTNESS_r04 err;
    array-free-projection rule enforced registry-wide by
    tests/test_entry_contract.py::test_no_array_or_map_driver_columns).
    The oracle unnests the same k×dim cells via the dims CTE."""
    from lightcrawler_spark.operators.clustering import kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_centroids(emb, k=8, iters=3).select(
        F.col("cid").cast("long").alias("cid"),
        F.posexplode("centroid").alias("dim", "value"),
    ).select(
        "cid",
        F.col("dim").cast("long").alias("dim"),
        F.col("value").cast("long").alias("value"),
    )


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment over the trained quantizer
    (operators/clustering.py:kmeans_assignments): pure codegen
    projection — the k centroids are inlined literals, distance is an
    exact int64 fold, ties break to the lowest cid — zero join, zero
    shuffle over the corpus."""
    from lightcrawler_spark.operators.clustering import (
        kmeans_assignments,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=3)
    return kmeans_assignments(emb, cents).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cid").cast("long").alias("cid"),
        F.col("dist").cast("long").alias("dist"),
    )


def q_kmeans_assign_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-k nearest-centroid assignment
    (operators/clustering.py:kmeans_assignments_bcast): the centroids
    travel as ONE broadcast data row instead of inlined plan literals,
    so k×dim is bounded by executor memory, not codegen constant-pool
    pressure — the path a 10^10-vector IVF (k ≈ 4096+) takes. Same
    trained quantizer and output contract as kmeans_assign, so it
    shares the oracle; a hash-match certifies the two assignment paths
    are bit-identical under independent execution."""
    from lightcrawler_spark.operators.clustering import (
        kmeans_assignments_bcast,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=3)
    return kmeans_assignments_bcast(emb, cents).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cid").cast("long").alias("cid"),
        F.col("dist").cast("long").alias("dist"),
    )


def q_semantic_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's k-means blocking (operators/
    clustering.py:semantic_dedup_kmeans; Abbas et al. 2023): cluster,
    pair within clusters only (cid equi-join, never n²), exact cosine
    ≥ 0.35, min-label connected components, min-id canonical per group
    — the k-means-block counterpart of `embedding_near_dup`'s SRP
    blocking, sharing the output contract of
    similarity.semantic_dedup_assignments."""
    from lightcrawler_spark.operators.clustering import semantic_dedup_kmeans

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return semantic_dedup_kmeans(emb, k=4, iters=2, threshold=0.35).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the KMEANS-TRAINED coarse quantizer — the
    composition that closes the loop: operators/clustering.py:
    kmeans_centroids trains the `centroids` table, dequantized
    micro-units feed operators/similarity.py:ivf_topk, which does its
    own argmax-cosine list assignment + n_probe=2 + exact re-rank.
    Production IVF trains its quantizer instead of sampling it
    (embedding_ivf is the sampled-centroid variant of the same search);
    the oracle re-derives training AND search in one CTE chain."""
    from lightcrawler_spark.operators.clustering import kmeans_centroids
    from lightcrawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=2).select(
        F.col("cid").cast("long").alias("vec_id"),
        F.transform(
            "centroid", lambda c: c.cast("double") / F.lit(1000000.0)
        ).alias("embedding"),
    )
    q = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, q, k=3, n_probe=2, centroids=cents).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the TRAINED-IVF search (q_ivf_trained's exact
    configuration) against the exact cosine top-3
    (operators/similarity.py:ann_recall) — the trained-IVF row of the
    eval matrix next to ann_recall's SRP-LSH row: quantifies what
    n_probe=2 over a k=8 trained quantizer gives up vs brute force.
    Both sides are k·Q-row tables, broadcast-sized at any corpus."""
    from lightcrawler_spark.operators.clustering import kmeans_centroids
    from lightcrawler_spark.operators.similarity import ann_recall, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = kmeans_centroids(emb, k=8, iters=2).select(
        F.col("cid").cast("long").alias("vec_id"),
        F.transform(
            "centroid", lambda c: c.cast("double") / F.lit(1000000.0)
        ).alias("embedding"),
    )
    exact = brute_force_topk(emb, q, k=3)
    approx = ivf_topk(emb, q, k=3, n_probe=2, centroids=cents)
    return ann_recall(exact, approx).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "recall",
    )


def q_semdedup_block_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation for SemDeDup's k-means stage
    (operators/clustering.py:kmeans_block_pairs at threshold=-1 = the
    pure blocking output): recall/precision of same-cluster candidacy
    against exact all-pairs cosine ≥ 0.35 truth on a bounded slice —
    the measurement loop that justifies k, exactly the role dedup_recall
    plays for MinHash banding and ann_recall for SRP/IVF search. One
    row: counts + ratios (counts are O(1) driver scalars)."""
    from lightcrawler_spark.operators.clustering import kmeans_block_pairs
    from lightcrawler_spark.operators.similarity import cosine_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    truth = cosine_near_dup_pairs(emb, threshold=0.35).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    cand = kmeans_block_pairs(emb, k=4, iters=2, threshold=-1.0).select(
        "id_a", "id_b", F.lit(1).alias("_c")
    )
    # full-outer + one aggregate: all three counts in ONE job — the
    # truth cross and the block join each execute once, not twice
    row = (
        truth.join(cand, ["id_a", "id_b"], "full_outer")
        .agg(
            F.count("_t").alias("n_truth"),
            F.count("_c").alias("n_candidates"),
            F.count(F.when(F.col("_t").isNotNull()
                           & F.col("_c").isNotNull(), 1)).alias("n_hits"),
        )
        .collect()[0]
    )
    base = spark.createDataFrame(
        [(row["n_truth"], row["n_candidates"], row["n_hits"])],
        "n_truth long, n_candidates long, n_hits long",
    )
    # F.round (HALF_UP) matches DuckDB round; Python round() would not
    return base.select(
        "n_truth", "n_candidates", "n_hits",
        F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
        F.round(F.col("n_hits") / F.col("n_candidates"), 6).alias("precision"),
    )


def _kmeans_oracle_cte(k: int, iters: int, dim: int = 64,
                       source: str = "SELECT vec_id, embedding"
                                     " FROM embeddings") -> str:
    """Unrolled-iteration CTE chain re-deriving Lloyd's k-means with
    independent relational algebra: per-(vector, centroid, dim) exploded
    squared differences summed by GROUP BY (vs the kernel's inlined
    zip_with fold), rank-1 argmin (vs array_min of structs), exact
    nonneg-mod floor division (vs Python //). Ends at CTE c{iters} =
    (cid, cv) in micro-units. Exactness holds because both sides do the
    identical float64→round→int64 quantization once and integer math
    after — the element must be cast to DOUBLE explicitly, because
    DuckDB's FLOAT * INT arithmetic stays float32 (verified: 133/500
    sf0.01 vectors quantize ≥1 component off by one micro-unit on the
    float32 path) while the kernel's quantize_micro_expr promotes to
    double before the multiply."""
    parts = [
        "q AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv"
        f" FROM ({source}))",
        f"dims AS (SELECT unnest(range({dim})) AS pos)",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,"
        f" qv AS cv FROM (SELECT * FROM q ORDER BY vec_id LIMIT {k}))",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts += [
            f"d{t} AS (SELECT q.vec_id, c.cid,"
            " sum((q.qv[p.pos+1] - c.cv[p.pos+1])"
            " * (q.qv[p.pos+1] - c.cv[p.pos+1])) AS dist"
            f" FROM q, c{p} c, dims p GROUP BY 1, 2)",
            f"a{t} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,"
            " row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY dist, cid) AS rn FROM d{t}) WHERE rn = 1)",
            f"m{t} AS (SELECT a{t}.cid, p.pos, sum(q.qv[p.pos+1]) AS s,"
            f" count(*) AS n FROM a{t} JOIN q USING (vec_id), dims p"
            " GROUP BY 1, 2)",
            f"n{t} AS (SELECT cid,"
            " list((s - ((s % n) + n) % n) // n ORDER BY pos) AS cv"
            f" FROM m{t} GROUP BY cid)",
            f"c{t} AS (SELECT i.cid, coalesce(x.cv, i.cv) AS cv"
            f" FROM c{p} i LEFT JOIN n{t} x USING (cid))",
        ]
    return ",\n".join(parts)


def _kmeans_centroids_oracle_sql() -> str:
    # scalar (cid, dim, value) projection — the dims CTE supplies the
    # 0-based positions, so one row per centroid cell (driver rule: no
    # array/map columns in driver-facing projections)
    return (
        "WITH " + _kmeans_oracle_cte(8, 3) + "\n"
        "SELECT CAST(cid AS BIGINT) AS cid,"
        " CAST(p.pos AS BIGINT) AS dim,"
        " CAST(cv[p.pos+1] AS BIGINT) AS value\n"
        "FROM c3, dims p"
    )


def _kmeans_assign_oracle_sql() -> str:
    return (
        "WITH " + _kmeans_oracle_cte(8, 3) + ",\n"
        "df AS (SELECT q.vec_id, c.cid,"
        " sum((q.qv[p.pos+1] - c.cv[p.pos+1])"
        " * (q.qv[p.pos+1] - c.cv[p.pos+1])) AS dist"
        " FROM q, c3 c, dims p GROUP BY 1, 2)\n"
        "SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(cid AS BIGINT) AS cid, CAST(dist AS BIGINT) AS dist\n"
        "FROM (SELECT vec_id, cid, dist, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM df)\n"
        "WHERE rn = 1"
    )


def _ivf_trained_cte() -> str:
    """WITH-body shared by ivf_trained and ivf_recall: k-means training
    CTEs + dequantized centroids + the embedding_ivf search algebra,
    ending at CTE r = ranked candidates."""
    return (
        _kmeans_oracle_cte(8, 2) + ",\n"
        "cents AS (SELECT cid,"
        " list_transform(cv, c -> c / 1000000.0) AS cvec FROM c2),\n"
        "lists AS (\n"
        "  SELECT neighbor_id, c_vec, cid FROM (\n"
        "    SELECT e.vec_id AS neighbor_id,"
        " e.embedding::DOUBLE[] AS c_vec, c.cid,\n"
        "           row_number() OVER (\n"
        "             PARTITION BY e.vec_id\n"
        "             ORDER BY round(list_cosine_similarity("
        "e.embedding::DOUBLE[], c.cvec), 6) DESC, c.cid ASC\n"
        "           ) AS crank\n"
        "    FROM embeddings e, cents c\n"
        "  ) WHERE crank <= 1\n"
        "),\n"
        "probes AS (\n"
        "  SELECT query_id, q_vec, cid FROM (\n"
        "    SELECT q.vec_id AS query_id,"
        " q.embedding::DOUBLE[] AS q_vec, c.cid,\n"
        "           row_number() OVER (\n"
        "             PARTITION BY q.vec_id\n"
        "             ORDER BY round(list_cosine_similarity("
        "q.embedding::DOUBLE[], c.cvec), 6) DESC, c.cid ASC\n"
        "           ) AS crank\n"
        "    FROM embeddings q, cents c WHERE q.vec_id < 10\n"
        "  ) WHERE crank <= 2\n"
        "),\n"
        "cand AS (\n"
        "  SELECT p.query_id, l.neighbor_id,\n"
        "         round(list_cosine_similarity(p.q_vec, l.c_vec), 6)"
        " AS sim\n"
        "  FROM probes p JOIN lists l USING (cid)\n"
        "  WHERE p.query_id <> l.neighbor_id\n"
        "),\n"
        "r AS (\n"
        "  SELECT query_id, neighbor_id, sim,\n"
        "         row_number() OVER (\n"
        "           PARTITION BY query_id ORDER BY sim DESC,"
        " neighbor_id ASC\n"
        "         ) AS rank\n"
        "  FROM cand\n"
        ")"
    )


def _ivf_trained_oracle_sql() -> str:
    """Training (unrolled k-means CTEs) + search (the embedding_ivf
    algebra) in one chain: centroids = c2 dequantized to DOUBLE lists,
    then argmax-cosine list assignment, 2 probed lists, exact re-rank."""
    return (
        "WITH " + _ivf_trained_cte() + "\n"
        "SELECT CAST(query_id AS BIGINT) AS query_id,\n"
        "       CAST(neighbor_id AS BIGINT) AS neighbor_id,\n"
        "       sim, CAST(rank AS INT) AS rank\n"
        "FROM r WHERE rank <= 3"
    )


def _ivf_recall_oracle_sql() -> str:
    """Recall@3 of the trained-IVF search against the exact cosine
    top-3 — the trained-IVF row of the eval matrix (ann_recall covers
    SRP-LSH). Reuses the shared training+search WITH-body, adds the
    brute-force exact side and the recall aggregate."""
    return (
        "WITH " + _ivf_trained_cte() + ",\n"
        "ap AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 3),\n"
        "qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe\n"
        "       FROM embeddings WHERE vec_id < 10),\n"
        "expairs AS (\n"
        "  SELECT qx.query_id, e.vec_id AS neighbor_id,\n"
        "         round(list_cosine_similarity(qx.qe,"
        " e.embedding::DOUBLE[]), 6) AS sim\n"
        "  FROM qx, embeddings e WHERE e.vec_id <> qx.query_id\n"
        "),\n"
        "ex AS (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT query_id, neighbor_id,\n"
        "           row_number() OVER (\n"
        "             PARTITION BY query_id ORDER BY sim DESC,"
        " neighbor_id ASC\n"
        "           ) AS rank\n"
        "    FROM expairs) WHERE rank <= 3\n"
        ")\n"
        "SELECT CAST(ex.query_id AS BIGINT) AS query_id,\n"
        "       CAST(count(*) AS BIGINT) AS n_exact,\n"
        "       CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,\n"
        "       round(count(ap.neighbor_id) * 1.0 / count(*), 6)"
        " AS recall\n"
        "FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id\n"
        "                    AND ap.neighbor_id = ex.neighbor_id\n"
        "GROUP BY ex.query_id"
    )


def _semdedup_block_recall_oracle_sql() -> str:
    """Training + assignment re-derived by the kmeans CTEs, candidacy =
    same-cid pairs, truth = exact all-pairs cosine ≥ 0.35 on the same
    slice, ratios in SQL."""
    cte = _kmeans_oracle_cte(
        4, 2,
        source="SELECT vec_id, embedding FROM embeddings"
               " WHERE vec_id < 200",
    )
    return (
        "WITH " + cte + ",\n"
        "df AS (SELECT q.vec_id, c.cid,"
        " sum((q.qv[p.pos+1] - c.cv[p.pos+1])"
        " * (q.qv[p.pos+1] - c.cv[p.pos+1])) AS dist"
        " FROM q, c2 c, dims p GROUP BY 1, 2),\n"
        "asg AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,"
        " row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)"
        " AS rn FROM df) WHERE rn = 1),\n"
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
        " WHERE vec_id < 200),\n"
        "truth AS (SELECT a.vec_id AS ia, b.vec_id AS ib\n"
        "          FROM e a JOIN e b ON a.vec_id < b.vec_id\n"
        "          WHERE round(list_cosine_similarity(a.v, b.v), 6)"
        " >= 0.35),\n"
        "cand AS (SELECT a.vec_id AS ia, b.vec_id AS ib\n"
        "         FROM asg a JOIN asg b ON a.cid = b.cid"
        " AND a.vec_id < b.vec_id),\n"
        "hits AS (SELECT 1 FROM truth JOIN cand USING (ia, ib)),\n"
        "s AS (SELECT (SELECT count(*) FROM truth) AS n_truth,\n"
        "             (SELECT count(*) FROM cand) AS n_candidates,\n"
        "             (SELECT count(*) FROM hits) AS n_hits)\n"
        "SELECT CAST(n_truth AS BIGINT) AS n_truth,\n"
        "       CAST(n_candidates AS BIGINT) AS n_candidates,\n"
        "       CAST(n_hits AS BIGINT) AS n_hits,\n"
        "       round(n_hits / n_truth, 6) AS recall,\n"
        "       round(n_hits / n_candidates, 6) AS precision\n"
        "FROM s"
    )


def _semantic_dedup_kmeans_oracle_sql() -> str:
    cte = _kmeans_oracle_cte(
        4, 2,
        source="SELECT vec_id, embedding FROM embeddings"
               " WHERE vec_id < 300",
    )
    return (
        "WITH RECURSIVE " + cte + ",\n"
        "df AS (SELECT q.vec_id, c.cid,"
        " sum((q.qv[p.pos+1] - c.cv[p.pos+1])"
        " * (q.qv[p.pos+1] - c.cv[p.pos+1])) AS dist"
        " FROM q, c2 c, dims p GROUP BY 1, 2),\n"
        "asg AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,"
        " row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)"
        " AS rn FROM df) WHERE rn = 1),\n"
        "e AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v, asg.cid\n"
        "      FROM embeddings e JOIN asg USING (vec_id)\n"
        "      WHERE e.vec_id < 300),\n"
        "pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b\n"
        "          FROM e a JOIN e b ON a.cid = b.cid"
        " AND a.vec_id < b.vec_id\n"
        "          WHERE round(list_cosine_similarity(a.v, b.v), 6)"
        " >= 0.35),\n"
        "sym AS (SELECT id_a AS s, id_b AS t2 FROM pairs\n"
        "        UNION ALL SELECT id_b, id_a FROM pairs),\n"
        "reach(node, comp) AS (\n"
        "  SELECT vec_id, vec_id FROM e\n"
        "  UNION\n"
        "  SELECT sym.t2, reach.comp FROM reach"
        " JOIN sym ON sym.s = reach.node\n"
        ")\n"
        "SELECT CAST(node AS BIGINT) AS vec_id,\n"
        "       CAST(min(comp) AS BIGINT) AS cluster,\n"
        "       (node = min(comp)) AS is_canonical\n"
        "FROM reach GROUP BY node"
    )


# ---------------------------------------------------------------------------
# content-extraction queries (SURVEY.md §2.4 E11–E19, §2.3 C7/C8/C11,
# §2.5 P7/P12, §2.1 S9)
# ---------------------------------------------------------------------------

def q_publish_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: Chinese/dash date strings → DATE via the UnifyPublishtime
    regex."""
    from lightcrawler_spark.operators.content import unify_publish_time

    o = _t(spark, sf_dir, "orders")
    y, m, d = F.year("o_orderdate"), F.month("o_orderdate"), F.dayofmonth("o_orderdate")
    s = (
        F.when(F.col("o_orderkey") % 3 == 0,
               F.concat(y.cast("string"), F.lit("年"), m.cast("string"),
                        F.lit("月"), d.cast("string"), F.lit("日发布")))
        .when(F.col("o_orderkey") % 3 == 1,
              F.concat(y.cast("string"), F.lit("-"), m.cast("string"),
                       F.lit("-"), d.cast("string")))
        .otherwise(F.lit("未注明日期"))
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        unify_publish_time(s).alias("pub_date"),
    )


_ORGS = ["国务院", "财政部", "中国证监会", "北京市人民政府"]


def q_doc_no_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: bracket-style variants → canonical `org(year)no号`."""
    from lightcrawler_spark.operators.content import unify_doc_ori_no

    p = _t(spark, sf_dir, "part")
    org = F.element_at(F.array(*[F.lit(o) for o in _ORGS]),
                       (F.col("p_partkey") % 4 + 1).cast("int"))
    yr = (F.lit(1990) + F.col("p_partkey") % 30).cast("string")
    no = (F.col("p_partkey") % 500).cast("string")
    raw = (
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(org, F.lit("〔"), yr, F.lit("〕第"), no, F.lit("号")))
        .when(F.col("p_partkey") % 3 == 1,
              F.concat(org, F.lit("（"), yr, F.lit("）"), no, F.lit("号")))
        .otherwise(F.concat(org, F.lit("["), yr, F.lit("]第"), no, F.lit("号")))
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        raw.alias("raw_no"),
        unify_doc_ori_no(raw).alias("doc_no"),
    )


def q_title_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: <title> split on _/- , first segment."""
    from lightcrawler_spark.operators.content import title_guess

    p = _t(spark, sf_dir, "part")
    t = (
        F.when(F.col("p_partkey") % 3 == 0,
               F.concat(F.col("p_name"), F.lit("_政策文件_政府网")))
        .when(F.col("p_partkey") % 3 == 1,
              F.concat(F.col("p_name"), F.lit(" - Site Name")))
        .otherwise(F.col("p_name"))
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        title_guess(t).alias("title"),
    )


def q_t_valid_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: 自YYYY年M月D日起施行 → DATE."""
    from lightcrawler_spark.operators.content import t_valid_date

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 < 2)
    y, m, d = F.year("o_orderdate"), F.month("o_orderdate"), F.dayofmonth("o_orderdate")
    line = (
        F.when(F.col("o_orderkey") % 5 == 0,
               F.concat(F.lit("本办法自"), y.cast("string"), F.lit("年"),
                        m.cast("string"), F.lit("月"), d.cast("string"),
                        F.lit("日起施行。")))
        .otherwise(F.lit("本条不含生效日期。"))
    )
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        t_valid_date(line).alias("t_valid"),
    )


def q_negs_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16: 《…》 named entities, distinct, exploded to rows."""
    from lightcrawler_spark.operators.content import negs_list

    p = _t(spark, sf_dir, "part")
    text = F.concat(
        F.lit("依据《"), F.col("p_type"), F.lit("》与《"), F.col("p_brand"),
        F.lit("》以及《"), F.col("p_type"), F.lit("》。"),
    )
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.explode(negs_list(text)).alias("neg"),
    )


def q_attachment_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15: doc-extension links + CMS image urls from page bodies."""
    from lightcrawler_spark.operators.content import harvest_attachments

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 0)
    body = F.concat(
        F.lit('<a href="/files/f'), F.col("p_partkey").cast("string"),
        F.when(F.col("p_partkey") % 4 == 0, F.lit(".pdf"))
        .otherwise(F.lit(".html")),
        F.lit('">att</a><img src="/userfiles/image/'),
        (F.col("p_partkey") % 100).cast("string"),
        F.when(F.col("p_partkey") % 8 == 0, F.lit(".jpg"))
        .otherwise(F.lit(".gif")),
        F.lit('"/>'),
    )
    pages = p.select(
        F.concat(F.lit("http://x.test/p"), F.col("p_partkey").cast("string")).alias("url"),
        body.alias("body_text"),
    )
    return harvest_attachments(pages).select("referer", "att_url", "kind")


def q_attachment_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: extension → type code enum."""
    from lightcrawler_spark.operators.content import attachment_type_code

    p = _t(spark, sf_dir, "part")
    ext = F.element_at(
        F.array(*[F.lit(e) for e in
                  ("htm", "pdf", "doc", "docx", "xls", "xlsx", "txt", "json", "bin")]),
        (F.col("p_partkey") % 9 + 1).cast("int"),
    )
    url = F.concat(F.lit("http://x.test/f"), F.col("p_partkey").cast("string"),
                   F.lit("."), ext)
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        url.alias("url"),
        attachment_type_code(url).alias("type_code"),
    )


def q_index_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E11: metadata key/value line filter."""
    from lightcrawler_spark.operators.content import index_block_filter

    n = _t(spark, sf_dir, "nation")
    lines = n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        F.when(F.col("n_nationkey") % 3 == 0,
               F.concat(F.lit("索引号：GOV-"), F.col("n_nationkey").cast("string")))
        .when(F.col("n_nationkey") % 3 == 1,
              F.concat(F.lit("这是一行比较长的正文内容不是元数据行"),
                       F.col("n_name")))
        .otherwise(F.concat(F.lit(" 标 题："), F.col("n_name"))).alias("line"),
    )
    return index_block_filter(lines).select("n_nationkey", "line")


def q_title_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: normalized Levenshtein similarity between title variants."""
    from lightcrawler_spark.operators.products import title_similarity

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    a = F.col("p_name")
    b = F.concat(F.col("p_name"), F.lit(" (2024)"))
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        title_similarity(a, b).alias("sim"),
        title_similarity(a, F.col("p_type")).alias("sim_mfgr"),
    )


def q_product_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: 4-key any-match product-sink dedup."""
    from lightcrawler_spark.operators.products import dedup_products_against

    p = _t(spark, sf_dir, "part")
    new = p.select(
        F.md5(F.concat(F.lit("u"), F.col("p_partkey").cast("string"))).alias("url_md5"),
        F.when(F.col("p_partkey") % 7 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("国发("), (F.col("p_partkey") % 40 + 1980).cast("string"),
                            F.lit(")"), (F.col("p_partkey") % 300).cast("string"),
                            F.lit("号"))).alias("doc_ori_no"),
        F.concat(F.lit("d"), (F.col("p_partkey") % 900).cast("string")).alias("doc_id"),
        ((F.col("p_partkey") * 37 + 11) % 10000).cast("long").alias("simhash"),
    )
    existing = _t(spark, sf_dir, "supplier").select(
        F.md5(F.concat(F.lit("u"), (F.col("s_suppkey") * 3).cast("string"))).alias("url_md5"),
        F.concat(F.lit("国发("), (F.col("s_suppkey") % 40 + 1980).cast("string"),
                 F.lit(")"), (F.col("s_suppkey") % 300).cast("string"),
                 F.lit("号")).alias("doc_ori_no"),
        F.concat(F.lit("d"), (F.col("s_suppkey") % 11).cast("string")).alias("doc_id"),
        ((F.col("s_suppkey") * 41 + 11) % 10000).cast("long").alias("simhash"),
    )
    return dedup_products_against(new, existing).select(
        "url_md5", "doc_ori_no", "doc_id", "simhash"
    )


def q_cookie_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: cookie jar upsert + per-request lookup (tail-match domain,
    prefix-match path, last-stored-wins per name)."""
    from lightcrawler_spark.operators.cookies import (
        cookies_for_requests, upsert_cookies,
    )

    n = _t(spark, sf_dir, "nation")
    k2 = F.col("n_nationkey") % 20
    jar = n.select(
        F.col("n_nationkey").cast("long").alias("seq"),
        F.concat(F.lit("n"), k2.cast("string"), F.lit(".test")).alias("source_domain"),
        F.concat(F.lit("n"), k2.cast("string"), F.lit(".test")).alias("domain"),
        F.concat(F.lit("/p"), (k2 % 3).cast("string")).alias("path"),
        F.concat(F.lit("c"), (k2 % 5).cast("string")).alias("name"),
        F.concat(F.lit("v"), F.col("n_nationkey").cast("string")).alias("value"),
    )
    jar = upsert_cookies(None, jar)
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    reqs = c.select(
        F.concat(F.lit("http://"),
                 F.when(F.col("c_custkey") % 2 == 0, F.lit("")).otherwise(F.lit("sub.")),
                 F.lit("n"), (F.col("c_custkey") % 20).cast("string"),
                 F.lit(".test/p"), (F.col("c_custkey") % 4).cast("string"),
                 F.lit("/page")).alias("url"),
        F.concat(F.lit("n"), (F.col("c_custkey") % 20).cast("string"),
                 F.lit(".test")).alias("domain"),
        F.concat(F.when(F.col("c_custkey") % 2 == 0, F.lit("")).otherwise(F.lit("sub.")),
                 F.lit("n"), (F.col("c_custkey") % 20).cast("string"),
                 F.lit(".test")).alias("host"),
        F.concat(F.lit("/p"), (F.col("c_custkey") % 4).cast("string"),
                 F.lit("/page")).alias("path"),
    )
    return cookies_for_requests(reqs, jar).select("url", "name", "value")


def q_cookie_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 harvest-back: Set-Cookie header lines → jar rows
    (PHPCrawlerCookieDescriptor::getFromHeaderLine semantics — name/value
    from the first ;-part, path/domain attributes with quote stripping,
    dot-prefixed explicit domains, source-directory path default)."""
    from lightcrawler_spark.operators.cookies import harvest_set_cookies

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    k = F.col("c_custkey")
    results = c.select(
        F.concat(F.lit("http://www.h"), (k % 15).cast("string"),
                 F.lit(".test/dir"), (k % 4).cast("string"),
                 F.lit("/page.htm")).alias("url"),
        (k % 50 + 1).cast("int").alias("fetch_rank"),
        F.array(
            F.concat(F.lit("sid"), (k % 7).cast("string"), F.lit("="),
                     F.lit("v"), k.cast("string")),
            F.when(
                k % 3 == 0,
                F.concat(F.lit('lang = zh ; Domain=h'), (k % 15).cast("string"),
                         F.lit('.test; Path="/docs"')),
            ).otherwise(
                F.concat(F.lit('theme="dark"; path=/t'), (k % 2).cast("string"))
            ),
        ).alias("set_cookies"),
    )
    return harvest_set_cookies(results, round_no=2).select(
        "seq", "source_domain", "domain", "path", "name", "value"
    )


def q_send_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: regex-matched POST/auth rules attached to the work-list."""
    from lightcrawler_spark.operators.senddata import attach_send_data

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 400)
    work = p.select(
        F.concat(
            F.lit("http://forms.test/"),
            F.when(F.col("p_partkey") % 3 == 0, F.lit("search"))
            .when(F.col("p_partkey") % 3 == 1, F.lit("login"))
            .otherwise(F.lit("page")),
            F.lit("/"), F.col("p_partkey").cast("string"),
        ).alias("url")
    )
    # rule 2 collides on `q` — later rule must overwrite while the key
    # keeps its first-occurrence position (PHP $post_data_array[k]=v)
    rules = spark.createDataFrame(
        [
            (1, "/search/", "post", "q=laws&page=1"),
            (2, "/search/", "post", "lang=zh&q=override"),
            (3, "/(search|login)/", "auth", "user:pass1"),
            (4, "/login/", "auth", "user:pass2"),
        ],
        "rule_order long, url_regex string, kind string, payload string",
    )
    return attach_send_data(work, rules).select("url", "post_data", "auth")


def q_format_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: Formatter::formaturl — the reference's second resolver with
    its quirks (https NOT passed through, port dropped, backslash fix,
    ../ popping)."""
    from lightcrawler_spark.functions.spark_udfs import format_url_udf

    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    k = F.col("c_custkey")
    base = F.concat(
        F.lit("http://WWW.Host"), (k % 10).cast("string"),
        F.lit(".com:8080/dir"), (k % 7).cast("string"),
        F.lit("/sub/page.htm"),
    )
    link = (
        F.when(k % 5 == 0, F.concat(F.lit("item"), k.cast("string"), F.lit(".htm")))
        .when(k % 5 == 1, F.concat(F.lit("/root"), k.cast("string"), F.lit(".htm")))
        .when(k % 5 == 2, F.concat(F.lit("..\\up"), k.cast("string"), F.lit(".htm")))
        .when(k % 5 == 3, F.concat(F.lit("http://keep.me/x"), k.cast("string")))
        .otherwise(F.concat(F.lit("https://evil.example/x"), k.cast("string")))
    )
    return c.select(
        k.cast("long").alias("c_custkey"),
        format_url_udf(base, link).alias("url"),
    )


def q_handler_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: first-matching handler regex routes the row (detail /
    attachment / fallback list)."""
    from lightcrawler_spark.operators.products import route_by_handlers

    p = _t(spark, sf_dir, "part")
    urls = p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.concat(
            F.lit("http://s.test/"),
            F.when(F.col("p_size") % 3 == 0,
                   F.concat(F.lit("detail/d"), F.col("p_partkey").cast("string"),
                            F.lit(".htm")))
            .when(F.col("p_size") % 3 == 1,
                  F.concat(F.lit("att/f"), F.col("p_partkey").cast("string"),
                           F.lit(".doc")))
            .otherwise(F.concat(F.lit("page/p"), F.col("p_partkey").cast("string"),
                                F.lit(".htm"))),
        ).alias("url"),
    )
    handlers = [(r"#/detail/# i", "detail"), (r"#\.(doc|docx)$# i", "attachment")]
    return route_by_handlers(urls, handlers).select("p_partkey", "url", "route")


def q_extraction_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: the status==200 && bytes>100 extraction gate."""
    from lightcrawler_spark.operators.products import extraction_gate

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    k = F.col("o_orderkey")
    pages = o.select(
        k.cast("long").alias("o_orderkey"),
        F.when(k % 3 == 2, 404).otherwise(200).cast("int").alias("status"),
        F.when(k % 3 == 0, (k % 150).cast("long"))
        .otherwise(F.lit(5000).cast("long")).alias("bytes_received"),
    )
    return extraction_gate(pages).select("o_orderkey", "status", "bytes_received")


def q_index_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: XSDocument projection for the search_docs table (clamped
    fields + whitespace index tokens)."""
    from lightcrawler_spark.operators.indexing import build_search_docs

    d = _t(spark, sf_dir, "documents")
    products = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
        F.col("text").alias("content"),
        F.col("lang").alias("tags"),
    )
    out = build_search_docs(products)
    return out.select(
        "doc_id", "title", "tags", "n_tokens",
        F.element_at("tokens", 1).alias("token_1"),
    )


def q_doc_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20: binary attachment → text, routed by magic bytes (pdf/word
    converters are honest sandbox stubs; the LCTX fake container and
    plain path prove the full Spark plumbing)."""
    from lightcrawler_spark.operators.indexing import extract_doc_text

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    k = F.col("doc_id")
    payload = F.encode(
        F.when(k % 4 == 0, F.concat(F.lit("LCTX"), F.col("text").substr(1, 100)))
        .when(k % 4 == 1, F.concat(F.lit("%PDF-1.4 "), F.col("text").substr(1, 20)))
        .when(k % 4 == 2, F.concat(F.lit("PK"), F.lit(chr(3)), F.lit(chr(4)),
                                   F.lit("zipdata")))
        .otherwise(F.col("text").substr(1, 60)),
        "utf-8",
    )
    out = extract_doc_text(
        d.select(k.cast("long").alias("doc_id"), payload.alias("payload")),
        # forced stub path: keeps the DuckDB oracle deterministic even on
        # machines where pdftotext/antiword exist
        external_converters=False,
    )
    return out.select(
        "doc_id", "extractor",
        F.substring("doc_text", 1, 50).alias("text_head"),
    )


def q_requeue_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: deterministic selective re-queue of processed list pages."""
    from lightcrawler_spark.operators.products import requeue_list_pages

    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        F.col("event_id").cast("long").alias("insert_seq"),
        F.when(F.col("event_id") % 4 == 0, F.lit("list"))
        .otherwise(F.lit("detail")).alias("route"),
    )
    return requeue_list_pages(frontier, max_pages=50).select(
        "insert_seq", "route", "state"
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks)
# ---------------------------------------------------------------------------

def _prefilter_property_row(seen: DataFrame, new: DataFrame,
                            survivors: DataFrame) -> DataFrame:
    """Bounded-property summary certifying a probabilistic seen-filter
    prefilter (the r4 verdict's 'count + FPR-interval' oracle form —
    the survivor SET itself has no SQL equivalent, but its defining
    properties do):

    - n_new_total / n_new_exact: exact link counts (SQL-derivable);
    - n_seen_survivors MUST be 0 — the filters probe the same
      xxhash64 key they inserted, so a seen URL can never survive
      (no false negatives by construction);
    - fp_within_budget: wrongly-pruned truly-new URLs (the only
      error mode left) stay within 3× the 1% build budget, floored
      at 5 for tiny scale factors.

    Two aggregation passes cross-joined into one row — ONE over `new`
    (left join against the seen dim gives total AND exact-new in the
    same scan) and ONE over `survivors`, so the expensive Arrow-UDF
    prefilter subtree executes exactly once (r5 review finding: the
    earlier four-agg crossJoin evaluated the survivors plan — shard
    build included — twice, since Spark does not dedupe common
    subtrees across a crossJoin)."""
    seen_dim = seen.distinct().withColumn("_s", F.lit(1))
    new_agg = new.join(seen_dim, "url", "left").agg(
        F.count(F.lit(1)).alias("n_new_total"),
        F.sum(F.col("_s").isNull().cast("long")).alias("n_new_exact"),
    )
    surv_agg = survivors.join(seen_dim, "url", "left").agg(
        F.count(F.lit(1)).alias("_n_surv"),
        F.count("_s").alias("n_seen_survivors"),
    )
    return new_agg.crossJoin(surv_agg).select(
        F.col("n_new_total").cast("long").alias("n_new_total"),
        F.col("n_new_exact").cast("long").alias("n_new_exact"),
        F.col("n_seen_survivors").cast("long").alias("n_seen_survivors"),
        (
            (F.col("n_new_exact") - F.col("_n_surv"))
            <= F.greatest(
                F.ceil(F.col("n_new_exact") * F.lit(0.03)),
                F.lit(5),
            )
        ).alias("fp_within_budget"),
    )


def _prefilter_property_oracle_sql() -> str:
    """Shared oracle for both prefilter property rows: the exact counts
    re-derived relationally; the no-false-negative zero and the
    FPR-interval TRUE are the asserted constants — a hash mismatch
    means the filter violated its probabilistic contract."""
    return """
WITH seen AS (
  SELECT DISTINCT 'http://b.test/p/' || CAST(p_partkey AS VARCHAR) AS url
  FROM part
),
newu AS (
  SELECT DISTINCT 'http://b.test/p/' || CAST(l_partkey * 3 AS VARCHAR) AS url
  FROM lineitem
)
SELECT
  CAST((SELECT count(*) FROM newu) AS BIGINT) AS n_new_total,
  CAST((SELECT count(*) FROM newu
        WHERE url NOT IN (SELECT url FROM seen)) AS BIGINT) AS n_new_exact,
  CAST(0 AS BIGINT) AS n_seen_survivors,
  TRUE AS fp_within_budget
"""


def q_cuckoo_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-cuckoo seen-filter prefilter (deletable variant of the
    Bloom path — Arrow UDF). Driver projection is the bounded-property
    row (_prefilter_property_row): exact counts + no-false-negative
    zero + FPR-interval boolean, all oracle-checkable; the raw survivor
    set stays covered by tests/test_seen_bloom.py."""
    from lightcrawler_spark.operators.dedup import (
        build_cuckoo_shards, cuckoo_prefilter,
    )

    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    seen = part.select(
        F.concat(F.lit("http://b.test/p/"), F.col("p_partkey").cast("string")).alias("url")
    )
    new = li.select(
        F.concat(F.lit("http://b.test/p/"), (F.col("l_partkey") * 3).cast("string")).alias("url")
    ).distinct()
    shards = build_cuckoo_shards(seen, num_shards=16)
    survivors = cuckoo_prefilter(new, shards, num_shards=16).select("url")
    return _prefilter_property_row(seen, new, survivors)


def q_content_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7/E8/E9/E10: HTML→text kernel over synthesized pages (Arrow UDF)
    — the nav menu block must be pruned (E9) and the paragraph path must
    win (E10); verified value-exact against a DuckDB oracle that builds
    the expected text from the same template."""
    from lightcrawler_spark.operators.content import html_to_text_udf

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    body = F.concat(
        F.lit("<html><head><title>Doc_"), F.col("doc_id").cast("string"),
        F.lit("</title><script>var junk=1;</script></head><body>"),
        # E9 fodder: anchor-dense nav block (ratio 1.0, avg len 2)
        F.lit('<div><ul><li><a href="/1">首页</a></li>'
              '<li><a href="/2">新闻中心</a></li>'
              '<li><a href="/3">政策</a></li></ul></div>'),
        F.lit("<h1>Head "),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p>'), F.col("text").substr(1, 200),
        F.lit('</p><p><img src="/userfiles/image/'),
        F.col("doc_id").cast("string"),
        F.lit('.jpg"/></p><table><tr><td>索引号</td><td>GOV-'),
        F.col("doc_id").cast("string"),
        F.lit("</td></tr></table></body></html>"),
    )
    out = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        html_to_text_udf(body).alias("s"),
    )
    return out.select(
        "doc_id",
        F.col("s.page_title").alias("page_title"),
        F.col("s.content").alias("content"),
        F.size("s.images").cast("int").alias("n_images"),
        F.size("s.text_p").cast("int").alias("n_paragraphs"),
    )


def q_summary_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: Chinese label→value summary extraction (Arrow UDF —
    rows-only)."""
    from lightcrawler_spark.operators.content import extract_summary_udf

    n = _t(spark, sf_dir, "nation")
    text = F.concat(
        F.lit("索引号：GOV-"), F.col("n_nationkey").cast("string"),
        F.lit("\n发文机关:机关"), (F.col("n_nationkey") % 5).cast("string"),
        F.lit("\n发布日期：20"), (F.col("n_nationkey") % 10 + 10).cast("string"),
        F.lit("年1月2日\n正文从这里开始。"),
    )
    return n.select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        extract_summary_udf(text).alias("s"),
    ).select(
        "n_nationkey",
        F.col("s.index_ori_no").alias("index_ori_no"),
        F.col("s.author").alias("author"),
        F.col("s.publish_time").alias("publish_time"),
    )

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
    return _run_engine_trace(spark, engine)


def _run_engine_trace(spark: SparkSession, engine) -> DataFrame:
    # micro-rounds: AQE's per-stage replanning dominates at fixture scale
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        result = engine.run(max_rounds=100)
        out = result.trace.select(
            F.col("seq").cast("long").alias("seq"),
            "url", "url_md5",
            F.col("depth").cast("int").alias("depth"),
            F.col("status").cast("int").alias("status"),
            F.col("n_attempts").cast("int").alias("n_attempts"),
        ).orderBy("seq")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return out


def q_crawl_golden_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F3/P9 end-to-end: redirect-only bootstrap across domains with
    filter re-basing, meta/rel nofollow, inline retries — engine trace
    vs the reference-semantics simulator (VALUES-literal oracle)."""
    from lightcrawler_spark.fixtures import (
        make_redirect_webgraph,
        redirect_spec,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = redirect_spec(budget=1)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_redirect_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_values_sql(golden: list[dict]) -> str:
    rows = ",\n".join(
        f"({t['seq']}, '{t['url']}', '{t['url_md5']}', {t['depth']}, "
        f"{t['status']}, {t['n_attempts']})"
        for t in golden
    )
    return (
        "SELECT CAST(seq AS BIGINT) AS seq, url, url_md5, "
        "CAST(depth AS INT) AS depth, CAST(status AS INT) AS status, "
        "CAST(n_attempts AS INT) AS n_attempts FROM (VALUES\n"
        + rows
        + "\n) AS t(seq, url, url_md5, depth, status, n_attempts) ORDER BY seq"
    )


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
    return _golden_values_sql(golden)


def _clip_score_values_sql() -> str:
    """Oracle for the CLIP-style gate: image vectors pinned via the
    SAME shared kernel the Spark UDF runs (`clip_image_vec_micro` —
    integer micro-units, so the literals are exact); captions pinned as
    strings. The text hashing (md5 bucket + sign), the signed
    bucket-count vector, and the exact-integer cosine are genuinely
    recomputed by DuckDB — a hash match certifies the scoring logic,
    not just pinned outputs."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image
    from lightcrawler_spark.operators.clipscore import clip_image_vec_micro

    vals = []
    for r in make_images(64):
        v = clip_image_vec_micro(decode_image(r["bytes"]))
        cap = r["caption"].replace("'", "''")
        vals.append(
            f"('{r['image_id']}','{cap}',{','.join(str(x) for x in v)})"
        )
    return (
        "WITH imgs(image_id, caption, f0,f1,f2,f3,f4,f5,f6,f7) AS "
        "(VALUES\n" + ",\n".join(vals) + "\n),\n"
        """toks AS (
  SELECT image_id, tok
  FROM imgs, UNNEST(string_split(lower(caption), ' ')) AS t(tok)
  WHERE tok <> ''
),
h AS (
  SELECT image_id,
    (('0x' || substr(md5(tok || 'clip'), 1, 8))::UBIGINT % 8)::BIGINT AS b,
    CASE WHEN ('0x' || substr(md5(tok || 'clip'), 9, 1))::UBIGINT < 8
         THEN 1 ELSE -1 END AS s
  FROM toks
),
vec AS (SELECT image_id, b, SUM(s)::BIGINT AS v FROM h GROUP BY 1, 2),
agg AS (
  SELECT i.image_id,
    SUM(v * CASE b WHEN 0 THEN f0 WHEN 1 THEN f1 WHEN 2 THEN f2
                   WHEN 3 THEN f3 WHEN 4 THEN f4 WHEN 5 THEN f5
                   WHEN 6 THEN f6 ELSE f7 END)::BIGINT AS dot,
    SUM(v * v)::BIGINT AS t2
  FROM imgs i JOIN vec USING (image_id) GROUP BY 1
),
fsqt AS (
  SELECT image_id,
    (f0*f0 + f1*f1 + f2*f2 + f3*f3 + f4*f4 + f5*f5 + f6*f6 + f7*f7)::BIGINT
      AS fsq
  FROM imgs
)
SELECT i.image_id,
  ROUND(CASE WHEN COALESCE(t2, 0) > 0 AND fsq > 0
             THEN dot / sqrt((t2 * fsq)::DOUBLE) ELSE 0.0 END, 6)
    AS clip_score,
  (ROUND(CASE WHEN COALESCE(t2, 0) > 0 AND fsq > 0
              THEN dot / sqrt((t2 * fsq)::DOUBLE) ELSE 0.0 END, 6) >= 0.2)
    AS keep
FROM imgs i LEFT JOIN agg USING (image_id) JOIN fsqt USING (image_id)
"""
    )


def _crossmodal_recall_values_sql() -> str:
    """Oracle for crossmodal_recall: image vectors pinned via the SAME
    shared kernel (`clip_image_vec_micro`, exact integer micro-units);
    captions pinned as strings. DuckDB then genuinely re-derives the
    text hashing, every pairwise exact-integer cosine (48×48), the
    (sim DESC, neighbor ASC) ranking, the self-hit set, and the per-K
    recall — a hash match certifies the whole retrieval-eval chain."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image
    from lightcrawler_spark.operators.clipscore import clip_image_vec_micro

    vals = []
    for r in make_images(48):
        v = clip_image_vec_micro(decode_image(r["bytes"]))
        cap = (r["caption"] + " " + r["image_id"]).replace("'", "''")
        vals.append(
            f"('{r['image_id']}','{cap}',{','.join(str(x) for x in v)})"
        )
    return (
        "WITH imgs(image_id, caption, f0,f1,f2,f3,f4,f5,f6,f7) AS "
        "(VALUES\n" + ",\n".join(vals) + "\n),\n"
        """toks AS (
  SELECT image_id, tok
  FROM imgs, UNNEST(string_split(lower(caption), ' ')) AS t(tok)
  WHERE tok <> ''
),
h AS (
  SELECT image_id,
    (('0x' || substr(md5(tok || 'clip'), 1, 8))::UBIGINT % 8)::BIGINT AS b,
    CASE WHEN ('0x' || substr(md5(tok || 'clip'), 9, 1))::UBIGINT < 8
         THEN 1 ELSE -1 END AS s
  FROM toks
),
vec AS (SELECT image_id AS cap_id, b, SUM(s)::BIGINT AS v
        FROM h GROUP BY 1, 2),
t2 AS (SELECT cap_id, SUM(v * v)::BIGINT AS t2 FROM vec GROUP BY 1),
f2 AS (
  SELECT image_id,
    (f0*f0 + f1*f1 + f2*f2 + f3*f3 + f4*f4 + f5*f5 + f6*f6 + f7*f7)::BIGINT
      AS f2
  FROM imgs
),
dots AS (
  SELECT v.cap_id AS query_id, i.image_id AS neighbor_id,
    SUM(v.v * CASE v.b WHEN 0 THEN i.f0 WHEN 1 THEN i.f1 WHEN 2 THEN i.f2
                       WHEN 3 THEN i.f3 WHEN 4 THEN i.f4 WHEN 5 THEN i.f5
                       WHEN 6 THEN i.f6 ELSE i.f7 END)::BIGINT AS dot
  FROM vec v CROSS JOIN imgs i GROUP BY 1, 2
),
scored AS (
  SELECT q.image_id AS query_id, i.image_id AS neighbor_id,
    ROUND(CASE WHEN COALESCE(t2.t2, 0) > 0 AND f2.f2 > 0
               THEN COALESCE(d.dot, 0) / sqrt((t2.t2 * f2.f2)::DOUBLE)
               ELSE 0.0 END, 6) AS sim
  FROM imgs q CROSS JOIN imgs i
  LEFT JOIN dots d ON d.query_id = q.image_id
                  AND d.neighbor_id = i.image_id
  LEFT JOIN t2 ON t2.cap_id = q.image_id
  JOIN f2 ON f2.image_id = i.image_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM scored
),
hits AS (SELECT query_id, rnk FROM ranked WHERE query_id = neighbor_id),
ks(k) AS (VALUES (1), (3), (5), (10))
SELECT CAST(ks.k AS INT) AS k,
       (SELECT COUNT(*) FROM imgs)::BIGINT AS n_queries,
       COUNT(h.query_id)::BIGINT AS n_hits,
       ROUND(COUNT(h.query_id)
             / (SELECT COUNT(*) FROM imgs)::DOUBLE, 6) AS recall
FROM ks LEFT JOIN hits h ON h.rnk <= ks.k
GROUP BY ks.k
"""
    )


def _jpeg_scrub_fixture() -> list[tuple[int, bytes | None]]:
    """Shared fixture for the jpeg_meta_scrub contract: every verdict
    path of the JPEG container scrub — clean JFIF, EXIF without GPS,
    EXIF with the GPS-IFD pointer, XMP, COM, all-three, a truncated
    APP1 (corrupt), a PNG passthrough, a NULL blob."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import (
        make_exif_app1,
        make_jpeg_container,
        make_xmp_app1,
    )

    png_bytes = next(
        r["bytes"] for r in make_images(2) if r["fmt"] == "png"
    )
    return [
        (0, make_jpeg_container()),
        (1, make_jpeg_container((make_exif_app1(gps=False),))),
        (2, make_jpeg_container((make_exif_app1(gps=True),))),
        (3, make_jpeg_container((make_xmp_app1(),))),
        (4, make_jpeg_container((), comment=b"shot on TestCam")),
        (5, make_jpeg_container(
            (make_exif_app1(gps=True), make_xmp_app1()), comment=b"c")),
        (6, b"\xff\xd8\xff\xe1\x00\x10short"),
        (7, png_bytes),
        (8, None),
    ]


def _jpeg_scrub_expected(raw: bytes | None):
    """Independent scalar re-derivation of the scrub verdicts for the
    oracle — explicit index arithmetic, deliberately NOT the
    imagecodec walker, so a kernel bug cannot cancel out. Returns
    (clean_md5, n_removed, bytes_removed, had_exif, had_gps, had_xmp)
    with None fields for NULL/corrupt rows."""
    import hashlib

    nulls = (None, None, None, None, None, None)
    if raw is None:
        return nulls
    if raw[:2] != b"\xff\xd8":
        return (hashlib.md5(raw).hexdigest(), 0, 0, False, False, False)
    if raw[-2:] != b"\xff\xd9":
        return nulls
    i, n = 2, len(raw)
    kept = [b"\xff\xd8"]
    removed = removed_b = 0
    exif = gps = xmp = False
    while True:
        if i + 4 > n or raw[i] != 0xFF:
            return nulls
        m = raw[i + 1]
        while m == 0xFF:
            i += 1
            if i + 4 > n:
                return nulls
            m = raw[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            return nulls
        ln = raw[i + 2] * 256 + raw[i + 3]
        if ln < 2 or i + 2 + ln > n:
            return nulls
        end = i + 2 + ln
        if 0xE1 <= m <= 0xEF or m == 0xFE:
            removed += 1
            removed_b += end - i
            if m == 0xE1:
                p = raw[i + 4:end]
                if p[:6] == b"Exif\x00\x00":
                    exif = True
                    gps = gps or _tiff_gps_independent(p[6:])
                elif p[:29] == b"http://ns.adobe.com/xap/1.0/\x00":
                    xmp = True
        else:
            kept.append(raw[i:end])
        i = end
        if m == 0xDA:
            break
    kept.append(raw[i:])
    clean = b"".join(kept)
    return (hashlib.md5(clean).hexdigest(), removed, removed_b,
            exif, gps, xmp)


def _tiff_gps_independent(t: bytes) -> bool:
    if len(t) < 8 or t[0:2] not in (b"II", b"MM"):
        return False
    little = t[0:2] == b"II"

    def rd(b):
        return int.from_bytes(b, "little" if little else "big")

    if rd(t[2:4]) != 42:
        return False
    off = rd(t[4:8])
    if off + 2 > len(t):
        return False
    for j in range(rd(t[off:off + 2])):
        e = off + 2 + 12 * j
        if e + 2 > len(t):
            return False
        if rd(t[e:e + 2]) == 0x8825:
            return True
    return False


def _jpeg_scrub_values_sql() -> str:
    """Oracle for jpeg_meta_scrub: every fixture row's verdict
    re-derived by the independent scalar parser (_jpeg_scrub_expected)
    and pinned as VALUES."""
    vals = []
    for i, raw in _jpeg_scrub_fixture():
        md5h, nrem, brem, ex, gp, xm = _jpeg_scrub_expected(raw)

        def q(v, s=False):
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "true" if v else "false"
            return f"'{v}'" if s else str(v)

        vals.append(
            f"({i}, {q(md5h, s=True)}, {q(nrem)}, {q(brem)}, "
            f"{q(ex)}, {q(gp)}, {q(xm)})"
        )
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id,\n"
        "       clean_md5,\n"
        "       CAST(n_removed AS INT) AS n_removed,\n"
        "       CAST(bytes_removed AS BIGINT) AS bytes_removed,\n"
        "       had_exif, had_gps, had_xmp\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "image_id, clean_md5, n_removed, bytes_removed, "
        "had_exif, had_gps, had_xmp)"
    )


def _text_overlay_fixture_images() -> list:
    """Shared fixture for the text_overlay_gate contract: every verdict
    path of the text-overlay screen. Construction shared; the statistics
    are computed twice (vectorized numpy in the kernel vs scalar loops
    in _text_overlay_values_sql)."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(encode_image(a.astype(np.uint8), "png"))

    def striped_row(w):
        return np.array([255 * ((x // 2) % 2) for x in range(w)])

    w = h = 24
    banded = np.zeros((h, w, 3))
    for y in range(h):
        banded[y, :, :] = (
            striped_row(w)[:, None] if (y // 4) % 2 == 0 else 128
        )
    photo = np.zeros((h, w, 3))
    for y in range(h):
        for x in range(w):
            photo[y, x, :] = min(255, x * 10 + y)
    solid = np.full((h, w, 3), 77)
    # grayscale static: R=G=B noise DOES trip the transition test
    # (independent-RGB noise largely cancels in the channel sum — the
    # gate's false-positive surface is high-contrast monochrome noise)
    noise = np.random.default_rng(7).integers(
        0, 256, size=(h, w, 1)
    ).repeat(3, axis=2)
    sparse = np.full((h, w, 3), 128.0)
    for y in range(4):
        sparse[y, :, :] = striped_row(w)[:, None]
    tiny = np.zeros((4, 4, 3))
    tiny[:, :, :] = np.array([255 * ((x // 2) % 2) for x in range(4)])[
        None, :, None
    ]
    rows = [
        ("banded", enc(banded)),
        ("photo", enc(photo)),
        ("solid", enc(solid)),
        ("noise", enc(noise)),
        ("sparse", enc(sparse)),
        ("tiny", enc(tiny)),
        ("corrupt", bytearray(b"\x89PNGnope")),
        ("nullblob", None),
    ]
    return rows


def _text_overlay_values_sql() -> str:
    """Oracle for text_overlay_gate: per-image stats re-derived with
    scalar loops (Counter-free, no numpy) over the SHARED fixture;
    the >= 35% verdict re-derived IN SQL with the same exact-integer
    cross-multiplication."""
    from lightcrawler_spark.imagecodec import decode_image

    vals = []
    for name, blob in _text_overlay_fixture_images():
        if blob is None:
            vals.append(f"('{name}', NULL, NULL, NULL, NULL)")
            continue
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            vals.append(f"('{name}', NULL, NULL, NULL, NULL)")
            continue
        h, w = arr.shape[0], arr.shape[1]
        row_min = max(6, w // 8)
        text_rows = 0
        max_t = 0
        total = 0
        for y in range(h):
            t = 0
            for x in range(w - 1):
                g0 = int(arr[y, x, 0]) + int(arr[y, x, 1]) + int(arr[y, x, 2])
                g1 = (int(arr[y, x + 1, 0]) + int(arr[y, x + 1, 1])
                      + int(arr[y, x + 1, 2]))
                if abs(g1 - g0) >= 288:
                    t += 1
            if t >= row_min:
                text_rows += 1
            max_t = max(max_t, t)
            total += t
        vals.append(f"('{name}', {h}, {text_rows}, {max_t}, {total})")
    num, den = (0.35).as_integer_ratio()
    return (
        "SELECT image_id,\n"
        "  CAST(n_rows AS BIGINT) AS txt_n_rows,\n"
        "  CAST(text_rows AS BIGINT) AS txt_text_rows,\n"
        "  CAST(max_t AS BIGINT) AS txt_max_row_trans,\n"
        "  CAST(total_t AS BIGINT) AS txt_total_trans,\n"
        "  CASE WHEN n_rows IS NULL THEN NULL\n"
        f"       ELSE text_rows * {den} >= n_rows * {num} END AS text_heavy\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "image_id, n_rows, text_rows, max_t, total_t)"
    )


def _image_verify_values_sql() -> str:
    """Every fixture image must pass every invariant — the VALUES oracle
    pins the full verdict set (ids × fmts, all four flags true)."""
    from lightcrawler_spark.fixtures import make_images

    rows = ",\n".join(
        f"('{r['image_id']}', '{r['fmt']}', true, true, true, true)"
        for r in make_images(64)
    )
    return (
        "SELECT image_id, fmt, dims_ok, psnr_ok, exact_ok, phash_ok "
        "FROM (VALUES\n" + rows +
        "\n) AS t(image_id, fmt, dims_ok, psnr_ok, exact_ok, phash_ok)"
    )


def _image_resize_values_sql() -> str:
    """Expected resize output computed driver-side with the same
    deterministic numpy codec (no Spark): decode → 16×12 nearest
    neighbor → re-encode → byte length."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, encode_image

    import numpy as np

    rows = []
    for r in make_images(64):
        arr = decode_image(r["bytes"])
        yi = (np.arange(12) * arr.shape[0] // 12).astype(int)
        xi = (np.arange(16) * arr.shape[1] // 16).astype(int)
        resized = arr[yi][:, xi]
        n = len(encode_image(resized, r["fmt"]))
        rows.append(f"('{r['image_id']}', '{r['fmt']}', 16, 12, {n})")
    return (
        "SELECT image_id, fmt, CAST(resized_w AS INT) AS resized_w, "
        "CAST(resized_h AS INT) AS resized_h, "
        "CAST(resized_bytes AS BIGINT) AS resized_bytes FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(image_id, fmt, resized_w, resized_h, resized_bytes)"
    )


def _image_features_values_sql() -> str:
    """Expected features computed driver-side with the same numpy math
    (4-decimal rounding inside the kernel makes the literals exact)."""
    import numpy as np

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, phash64

    rows = []
    for r in make_images(64):
        arr = decode_image(r["bytes"]).astype(np.float64)
        gray = arr.mean(axis=2)
        gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
        gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
        match = phash64(arr.astype(np.uint8)) == r["phash"]
        rows.append(
            f"('{r['image_id']}', {str(bool(match)).lower()}, "
            f"{round(float(gx + gy), 4)})"
        )
    return (
        "SELECT image_id, phash_match, "
        "CAST(edge_density AS DOUBLE) AS edge_density FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(image_id, phash_match, edge_density)"
    )


def _video_frames_values_sql() -> str:
    """Frame lengths follow directly from the fixture container layout
    (length-prefixed make_images bytes) — independent of the sampling
    kernel."""
    from lightcrawler_spark.fixtures import make_images

    frames = [len(r["bytes"]) for r in make_images(30)]
    rows = ",\n".join(
        f"('vid{v}', {i}, {frames[i]})"
        for v in range(4)
        for i in range(0, 30, 10)
    )
    return (
        "SELECT video_id, CAST(frame_idx AS INT) AS frame_idx, "
        "CAST(frame_len AS BIGINT) AS frame_len FROM (VALUES\n" + rows +
        "\n) AS t(video_id, frame_idx, frame_len)"
    )


def _golden_redirects_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        make_redirect_webgraph,
        redirect_spec,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(make_redirect_webgraph(), redirect_spec(budget=1))
    return _golden_values_sql(golden)


def q_crawl_golden_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap bootstrap end-to-end (spec.ingest_sitemaps,
    operators/sitemap.py wired into CrawlEngine round 0): robots
    `Sitemap:` directives → out-of-band fetch → urlset + ONE level of
    <sitemapindex> recursion → C3-resolved locs through the full F1-F8
    battery → frontier rows after the seeds in discovery order. The
    fixture exercises relative locs, a robots-disallowed loc, a
    cross-domain loc, duplicate/seed-duplicate locs and a nested index
    (ignored); engine trace vs the reference-semantics simulator
    (VALUES-literal oracle)."""
    from lightcrawler_spark.fixtures import (
        SITEMAP_ROBOTS_FIXTURE,
        make_sitemap_webgraph,
        sitemap_spec,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = sitemap_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_sitemap_webgraph()), spec
        ),
        robots_fixture=SITEMAP_ROBOTS_FIXTURE,
    )
    return _run_engine_trace(spark, engine)


def _golden_sitemap_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        SITEMAP_ROBOTS_FIXTURE,
        make_sitemap_webgraph,
        simulate_reference_crawl,
        sitemap_spec,
    )

    golden = simulate_reference_crawl(
        make_sitemap_webgraph(), sitemap_spec(), SITEMAP_ROBOTS_FIXTURE
    )
    return _golden_values_sql(golden)


def q_crawl_golden_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 revisit scheduling end-to-end (spec.revisit_url_rules,
    CrawlEngine._revisit_candidates): URLs matching the revisit rule
    re-enter the frontier after revisit_after_rounds rounds, once,
    carrying their ORIGINAL depth/priority/referer and ranking after
    all fresh discovery (insert_seq 1<<61 offset); the crawl idles
    through immature revisits instead of draining. Engine trace vs the
    reference-semantics simulator (VALUES-literal oracle)."""
    from lightcrawler_spark.fixtures import (
        make_revisit_webgraph,
        revisit_spec,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = revisit_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_revisit_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_revisit_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        make_revisit_webgraph,
        revisit_spec,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(make_revisit_webgraph(), revisit_spec())
    return _golden_values_sql(golden)


def q_image_caption_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule product: crawl the fixture web (pagination feeds on,
    image bodies received) and assemble the image+caption table
    (input_hint schema) — VALUES oracle pins every id/caption/dims/fmt/
    phash against the fixture source of truth."""
    from lightcrawler_spark.fixtures import (
        ROBOTS_FIXTURE,
        default_spec,
        make_images,
        make_webgraph,
        webgraph_df,
    )
    from lightcrawler_spark.plans.assemble import build_image_caption_table
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    images = make_images(4)
    web = make_webgraph(n_lists=1, details_per_list=2, images=images)
    spec = default_spec(
        max_depth=4, budget=16,
        content_type_receive_rules=[r"#text/html# i", r"#image/# i"],
        pagination_rules=[(r"var\s+countPage\s*=\s*(\d+)", "index_{i}.htm")],
    )
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec),
        robots_fixture=ROBOTS_FIXTURE,
    )
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        result = engine.run(max_rounds=40)
        out = build_image_caption_table(result.pages).select(
            "image_id", "caption",
            F.col("w").cast("int").alias("w"),
            F.col("h").cast("int").alias("h"),
            "fmt",
            F.col("phash").cast("long").alias("phash"),
        ).orderBy("image_id")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return out


def _image_augment_values_sql() -> str:
    """Expected augmentations computed driver-side with the same numpy
    permutations + codec: (w, h, encoded length, phash) per (image, op)."""
    import numpy as np

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, encode_image, phash64

    def apply(arr, op):
        if op == "hflip":
            return arr[:, ::-1]
        if op == "vflip":
            return arr[::-1, :]
        if op == "rot90":
            return np.rot90(arr)
        return arr[::-1, ::-1]

    rows = []
    for r in make_images(64):
        arr = decode_image(r["bytes"])
        for op in ("hflip", "vflip", "rot90", "rot180"):
            aug = np.ascontiguousarray(apply(arr, op))
            enc = encode_image(aug, r["fmt"])
            rows.append(
                f"('{r['image_id']}', '{op}', {aug.shape[1]}, {aug.shape[0]}, "
                f"{len(enc)}, {phash64(aug)})"
            )
    return (
        "SELECT image_id, op, CAST(aug_w AS INT) AS aug_w, "
        "CAST(aug_h AS INT) AS aug_h, CAST(aug_len AS BIGINT) AS aug_len, "
        "CAST(aug_phash AS BIGINT) AS aug_phash FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(image_id, op, aug_w, aug_h, aug_len, aug_phash)"
    )


def _image_caption_assembly_values_sql() -> str:
    from lightcrawler_spark.fixtures import make_image_array, make_images
    from lightcrawler_spark.imagecodec import decode_image, encode_image, phash64

    rows = []
    for r in make_images(4):
        rows.append(
            f"('{r['image_id']}', '{r['caption']}', {r['w']}, {r['h']}, "
            f"'{r['fmt']}', {r['phash']})"
        )
    # the cdn banner of list 0 (caption-less image page)
    banner = encode_image(make_image_array(1000, 32, 16), "png")
    rows.append(
        f"('banner0', '', 32, 16, 'png', {phash64(decode_image(banner))})"
    )
    return (
        "SELECT image_id, caption, CAST(w AS INT) AS w, CAST(h AS INT) AS h, "
        "fmt, CAST(phash AS BIGINT) AS phash FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(image_id, caption, w, h, fmt, phash) ORDER BY image_id"
    )


def q_image_caption_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style joint quality gate over the input_hint image+caption
    schema (operators/images.py:filter_image_caption_pairs): resolution
    floor, aspect bound, caption token window, punctuation ratio, then
    phash first-wins dedup among survivors. Input synthesized
    deterministically from spark.range so the DuckDB oracle re-derives
    the identical table AND re-applies the identical rules — the logic
    is what's under test, not pinned values."""
    from lightcrawler_spark.operators.images import filter_image_caption_pairs

    base = spark.range(500).select(
        F.concat(
            F.lit("img_"), F.lpad(F.col("id").cast("string"), 4, "0")
        ).alias("image_id"),
        (F.lit(16) + (F.col("id") * 37) % 200).cast("int").alias("w"),
        (F.lit(16) + (F.col("id") * 53) % 200).cast("int").alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("gif")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.when(F.col("id") % 17 == 0, F.lit("!!! ??? ###"))
        .when(F.col("id") % 23 == 0, F.rtrim(F.repeat(F.lit("w "), 150)))
        .otherwise(
            F.rtrim(
                F.repeat(F.lit("lorem "), (F.col("id") % 12).cast("int"))
            )
        )
        .alias("caption"),
        ((F.col("id") * 97) % 64).cast("long").alias("phash"),
    )
    return filter_image_caption_pairs(base).select(
        "image_id", "keep", "reject_reason"
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
    ).select("image_id", "fmt", "dims_ok", "psnr_ok", "exact_ok", "phash_ok")


def _image_df(spark: SparkSession, n: int = 64) -> DataFrame:
    from lightcrawler_spark.fixtures import make_images

    rows = make_images(n)
    return spark.createDataFrame(
        [
            (r["image_id"], bytearray(r["bytes"]), r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"])
            for r in rows
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: decode → nearest-neighbor resize → re-encode
    (mapInPandas kernel — rows-only)."""
    from lightcrawler_spark.operators.images import resize_images

    out = resize_images(_image_df(spark), out_w=16, out_h=12)
    return out.select(
        "image_id", "fmt", "resized_w", "resized_h",
        F.length("bytes_resized").cast("long").alias("resized_bytes"),
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: per-image feature extraction (phash, channel stats,
    edge density) — Arrow UDF, rows-only."""
    from lightcrawler_spark.operators.images import image_features_udf

    df = _image_df(spark)
    return df.select(
        "image_id", "phash", image_features_udf(F.col("bytes")).alias("f")
    ).select(
        "image_id",
        (F.col("f.feat_phash") == F.col("phash")).alias("phash_match"),
        F.round(F.col("f.feat_edge_density"), 6).alias("edge_density"),
    )


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: every-Nth frame sampling over a length-prefixed frame
    container (decoder stubbed — no codec lib in sandbox; plumbing real).
    Rows-only."""
    import struct

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.operators.images import sample_video_frames

    frames = [r["bytes"] for r in make_images(30)]
    blob = b"".join(struct.pack(">I", len(f)) + f for f in frames)
    df = spark.createDataFrame(
        [(f"vid{i}", bytearray(blob)) for i in range(4)],
        "video_id string, bytes binary",
    )
    out = sample_video_frames(df, every_nth=10)
    return out.select(
        "video_id", "frame_idx",
        F.length("frame_bytes").cast("long").alias("frame_len"),
    )


def _audio_df(spark: SparkSession, n: int, ns, silence, amp, rate=None,
              channels=None, period: int = 32) -> DataFrame:
    """Synthesize WAV blobs executor-side from spark.range params (square
    wave, trailing silence) — the oracle re-derives every downstream
    value arithmetically from the same params."""
    from lightcrawler_spark.operators.audio import synth_square_wav_udf

    rate = rate if rate is not None else F.lit(16000)
    channels = channels if channels is not None else F.lit(1)
    return spark.range(n).select(
        F.col("id").alias("audio_id"),
        synth_square_wav_udf(
            rate.cast("int"), ns.cast("int"), channels.cast("int"),
            amp.cast("int"), F.lit(period).cast("int"), silence.cast("int"),
        ).alias("bytes"),
    )


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: REAL RIFF/PCM container parse over a binary
    column (operators/audio.py — unlike the image codecs this needs no
    stand-in; WAV is struct arithmetic, unit-tested against stdlib
    ``wave``). Blobs synthesized distributed from range params; the
    oracle re-derives channels/rate/frames/duration arithmetically, so a
    hash match proves the byte-level parse round-trips the synthesis."""
    from lightcrawler_spark.operators.audio import with_audio_meta

    df = _audio_df(
        spark, 120,
        ns=F.lit(1024) + (F.col("id") % 7) * 512,
        silence=F.lit(0),
        amp=F.lit(500) + F.col("id"),
        rate=F.lit(8000) * (F.lit(1) + F.col("id") % 3),
        channels=F.lit(1) + F.col("id") % 2,
    )
    return with_audio_meta(df).select(
        F.col("audio_id").cast("long").alias("audio_id"),
        "channels", "sample_rate", "bits",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("duration_us").cast("long").alias("duration_us"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: exact-integer PCM features (peak, Σsample²,
    sign-change count, zero-sample count) — the audio analog of the
    Gopher text-quality gates, Arrow-batched, zero shuffle. Square-wave
    synthesis keeps every feature in closed form for the oracle."""
    from lightcrawler_spark.operators.audio import audio_features_udf

    df = _audio_df(
        spark, 100,
        ns=F.lit(1024),
        silence=(F.col("id") % 4) * 128,
        amp=F.lit(200) + F.col("id"),
    )
    f = F.col("f")
    return df.select(
        F.col("audio_id").cast("long").alias("audio_id"),
        audio_features_udf("bytes").alias("f"),
    ).select(
        "audio_id",
        f["n_frames"].alias("n_frames"),
        f["peak"].alias("peak"),
        f["sum_sq"].alias("sum_sq"),
        f["zero_crossings"].alias("zero_crossings"),
        f["n_zero"].alias("n_zero"),
    )


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: linear-interp resample 16 kHz → 8 kHz inside
    mapInPandas (blob in, blob out, same Arrow batch), then re-parse +
    re-feature the OUTPUT bytes. Integer-ratio decimation lands on input
    samples exactly, so the oracle re-derives the resampled wave's
    features in closed form — a hash match certifies the full
    decode → resample → re-encode → re-decode loop."""
    from lightcrawler_spark.operators.audio import (
        audio_features_udf,
        audio_meta_udf,
        resample_audio,
    )

    df = _audio_df(
        spark, 80,
        ns=F.lit(1024),
        silence=(F.col("id") % 3) * 128,
        amp=F.lit(300) + F.col("id"),
    )
    out = resample_audio(df, out_rate=8000)
    f, m = F.col("f"), F.col("m")
    return out.select(
        F.col("audio_id").cast("long").alias("audio_id"),
        F.col("out_frames").cast("long").alias("out_frames"),
        audio_meta_udf("bytes_resampled").alias("m"),
        audio_features_udf("bytes_resampled").alias("f"),
    ).select(
        "audio_id", "out_frames",
        m["sample_rate"].alias("out_rate"),
        f["peak"].alias("out_peak"),
        f["sum_sq"].alias("out_sum_sq"),
        f["zero_crossings"].alias("out_zero_crossings"),
    )


def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method evaluation: recall/precision of the MinHash-LSH
    candidate generator (8 hashes × 4 bands, the corpus-scale path)
    against exact n-gram Jaccard ≥ 0.5 ground truth (the all-pairs
    baseline, bounded input). The measurement loop that justifies the
    banding parameters — same role for text dedup that ann_recall plays
    for similarity search. One row: counts + ratios."""
    from lightcrawler_spark.operators.textdedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    truth = ngram_jaccard_pairs(docs, k=5, threshold=0.5).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    cand = minhash_lsh_pairs(docs, k=5, num_hashes=8, bands=4).select(
        "id_a", "id_b", F.lit(1).alias("_c")
    )
    # full-outer + one aggregate: all three counts in ONE job (the
    # truth all-pairs and the band join each execute once, not twice)
    row = (
        truth.join(cand, ["id_a", "id_b"], "full_outer")
        .agg(
            F.count("_t").alias("n_truth"),
            F.count("_c").alias("n_candidates"),
            F.count(F.when(F.col("_t").isNotNull()
                           & F.col("_c").isNotNull(), 1)).alias("n_hits"),
        )
        .collect()[0]
    )
    base = spark.createDataFrame(
        [(row["n_truth"], row["n_candidates"], row["n_hits"])],
        "n_truth long, n_candidates long, n_hits long",
    )
    # F.round (HALF_UP) matches DuckDB round; Python round() would not
    return base.select(
        "n_truth", "n_candidates", "n_hits",
        F.round(F.col("n_hits") / F.col("n_truth"), 6).alias("recall"),
        F.round(F.col("n_hits") / F.col("n_candidates"), 6).alias("precision"),
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation (operators/similarity.py:ann_recall):
    recall@3 of SRP-LSH against the exact cosine top-k, per query — the
    measurement loop that justifies the bucketed scale path. Both sides
    are k·Q-row tables, so the evaluator is broadcast-sized regardless
    of corpus size; the oracle re-derives BOTH rankings (deterministic
    tie-break sim DESC, neighbor ASC) and the set intersection."""
    from lightcrawler_spark.operators.similarity import ann_recall

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=3)
    approx = lsh_topk(emb, q, k=3, n_bits=4)
    return ann_recall(exact, approx).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "recall",
    )


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (operators/ranking.py) — the scorer behind
    the S10 index sink's consumer (the reference delegates to xunsearch,
    worker/IndexManager.class.php:41-132). Scale shape: corpus stats
    (N, avgdl, per-QUERY-term df) collapse to driver scalars in one
    aggregate, then scoring is a single codegen'd scan with the scalars
    inlined as literals — no join. The oracle recomputes the identical
    expression tree (same literal forms, same associativity) in DuckDB;
    scores rounded to 6dp on both sides."""
    from lightcrawler_spark.operators.ranking import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    out = bm25_scores(docs, ["spark", "query", "join"])
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dl").cast("long").alias("dl"),
        F.col("tf_spark").cast("long").alias("tf_spark"),
        F.col("tf_query").cast("long").alias("tf_query"),
        F.col("tf_join").cast("long").alias("tf_join"),
        F.round("score", 6).alias("score"),
    )


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash dedup END-TO-END: shingles → min-wise signatures → LSH
    band bucketing (equi-join on band keys, never all-pairs) → connected
    components → per-doc cluster + canonical flag. Composes
    textdedup.minhash_lsh_pairs with graph.dedup_cluster_assignments —
    the full corpus-scale near-dup pass as one oracle-backed query (the
    DuckDB oracle re-derives signatures, band collisions AND the
    recursive closure)."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.textdedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = minhash_lsh_pairs(docs, k=5, num_hashes=8, bands=4)
    return dedup_cluster_assignments(pairs, docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment
    (operators/chunking.py:assign_shards): multimodal samples laid out
    in id order, binned by byte offset into ~1 MiB shards, samples never
    split (overflow-by-one-sample semantics flagged). Runs on the same
    distributed prefix sum as sequence_pack; the oracle is the serial
    byte cumsum."""
    from lightcrawler_spark.operators.chunking import assign_shards

    samples = spark.range(2000).select(
        F.col("id").alias("image_id"),
        (F.lit(5000) + (F.col("id") % 37) * 301).alias("n_bytes"),
    )
    out = assign_shards(samples, shard_bytes=1 << 20, num_partitions=8)
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
        F.col("shard_idx").cast("long").alias("shard_idx"),
        F.col("offset_in_shard").cast("long").alias("offset_in_shard"),
        "overflows_shard",
    )


def q_aspect_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketed batch assignment
    (operators/chunking.py:assign_aspect_buckets): every image joins the
    bucket with the nearest aspect ratio (integer-exact cross-multiplied
    argmin, ties to the lower bucket_id), then batches of 4 are cut
    within buckets in image_id order — the SDXL/NovelAI training-prep
    step that keeps each batch at one target resolution. Spark side runs
    the GROUPED distributed prefix sum (range partitions × buckets, no
    per-bucket mega-window); the oracle re-derives the same assignment
    with plain windows."""
    from lightcrawler_spark.operators.chunking import assign_aspect_buckets

    imgs = spark.range(256).select(
        F.format_string("img_%012d", F.col("id")).alias("image_id"),
        (F.lit(24) + (F.col("id") % 5) * 8).cast("int").alias("w"),
        (F.lit(24) + (F.col("id") % 7) * 4).cast("int").alias("h"),
    )
    out = assign_aspect_buckets(imgs, batch_size=4, num_partitions=8)
    return out.select(
        "image_id",
        "w",
        "h",
        F.col("bucket_id").cast("int").alias("bucket_id"),
        F.col("bucket_w").cast("int").alias("bucket_w"),
        F.col("bucket_h").cast("int").alias("bucket_h"),
        F.col("rank_in_bucket").cast("long").alias("rank_in_bucket"),
        F.col("batch_idx").cast("long").alias("batch_idx"),
        "batch_is_ragged",
    )


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph PageRank (operators/graph.py:pagerank) — the
    frontier-prioritization signal that replaces the reference's regex
    priority lists at web scale. One shuffle-bounded job per iteration
    (edges ⋈ ranks + groupBy-sum, localCheckpoint between), dangling
    mass via Observation. The 64-node graph is synthesized so every
    out-degree is a power of two and damping is 0.5: all intermediates
    are dyadic rationals, doubles are EXACT and order-independent, and
    the chained-CTE DuckDB oracle hash-matches bit-for-bit (proven
    against Fraction arithmetic in tests/test_graph.py)."""
    from lightcrawler_spark.operators.graph import pagerank

    n = 64
    base = spark.range(n)
    edges = base.select(
        F.col("id").alias("src"), ((F.col("id") * 2 + 1) % n).alias("dst")
    ).unionByName(
        base.filter(F.col("id") % 2 == 0).select(
            F.col("id").alias("src"), F.floor(F.col("id") / 2).alias("dst")
        )
    )
    nodes = base.select(F.col("id").alias("node"))
    return pagerank(edges, nodes=nodes, iterations=3, damping=0.5).select(
        F.col("node").cast("long").alias("node"), "rank"
    )


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/chunking.py): whitespace-token
    sliding windows (48 tokens, overlap 8) as a pure JVM expression tree
    — split → sequence → explode → slice, zero shuffle, pushdown-safe
    whole-array ops."""
    from lightcrawler_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=48, overlap=8).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing
    (operators/chunking.py:pack_sequences): global token offsets via the
    distributed prefix-sum (range partition → per-partition cumsum →
    broadcast partition-total prefix), NOT a single-partition window —
    the plan is asserted partitioned in tests/test_chunking.py. The
    oracle is DuckDB's serial running sum, so a hash match proves the
    two-stage decomposition is exact."""
    from lightcrawler_spark.operators.chunking import pack_sequences
    from lightcrawler_spark.operators.text import with_token_counts

    docs = _t(spark, sf_dir, "documents")
    toks = with_token_counts(docs).select(
        "doc_id", F.col("ws_tokens").cast("long").alias("n_tokens")
    )
    out = pack_sequences(toks, ctx_len=256, num_partitions=8)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.col("seq_idx").cast("long").alias("seq_idx"),
        F.col("offset_in_seq").cast("long").alias("offset_in_seq"),
        "spans_boundary",
    )


def q_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: geometric augmentation fan-out
    (operators/images.py:augment_images) — op list exploded
    relationally, pixels permuted in one mapInPandas pass (exact
    flips/rotations, bit-reproducible). The VALUES oracle pins byte
    length AND phash of every augmented image, computed driver-side with
    the same numpy ops — orientation-sensitive, so a transposed or
    mis-flipped kernel cannot hash-match."""
    from lightcrawler_spark.operators.images import augment_images, phash_udf

    df = _image_df(spark)
    out = augment_images(df.select("image_id", "bytes", "fmt"))
    return out.select(
        "image_id", "op",
        F.col("aug_w").cast("int").alias("aug_w"),
        F.col("aug_h").cast("int").alias("aug_h"),
        F.length("bytes_aug").cast("long").alias("aug_len"),
        phash_udf(F.col("bytes_aug")).alias("aug_phash"),
    )


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-Bloom seen-filter prefilter (Arrow UDF): survivors of
    probable-seen pruning before the exact anti-join. Driver projection
    is the bounded-property row (_prefilter_property_row): exact counts
    + no-false-negative zero + FPR-interval boolean, all
    oracle-checkable; the raw survivor set stays covered by
    tests/test_seen_bloom.py."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    seen = part.select(
        F.concat(F.lit("http://b.test/p/"), F.col("p_partkey").cast("string")).alias("url")
    )
    new = li.select(
        F.concat(F.lit("http://b.test/p/"), (F.col("l_partkey") * 3).cast("string")).alias("url")
    ).distinct()
    shards = build_bloom_shards(seen, num_shards=16, fpp=0.01)
    survivors = bloom_prefilter(new, shards, num_shards=16).select("url")
    return _prefilter_property_row(seen, new, survivors)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup to CLUSTERS
    (operators/similarity.py:semantic_dedup_assignments): SRP-bucketed
    cosine near-dup pairs (equi-join on the 4-bit bucket, never
    all-pairs) → min-label connected components → canonical flags —
    the embedding counterpart of `minhash_dedup`. The recursive-CTE
    oracle re-derives buckets, pairs and the closure."""
    from lightcrawler_spark.operators.similarity import (
        semantic_dedup_assignments,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_assignments(emb, threshold=0.35, block_bits=4).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation per link target
    (operators/indexing.py:aggregate_anchor_text): groupBy(target, text)
    with map-side combine, then rank window + final rollup both
    partitioned by target — one shuffle boundary, deterministic '|'
    serialization of the top-3 anchor variants."""
    from lightcrawler_spark.operators.indexing import aggregate_anchor_text

    li = _t(spark, sf_dir, "lineitem")
    links = li.select(
        F.concat(
            F.lit("http://t"), (F.col("l_partkey") % 40).cast("string"),
            F.lit(".test/p/"), (F.col("l_partkey") % 120).cast("string"),
        ).alias("target_url"),
        F.concat(
            F.lit("anchor "), (F.col("l_suppkey") % 5).cast("string")
        ).alias("linktext"),
    )
    return aggregate_anchor_text(links, top_n=3).select(
        "target_url",
        F.col("n_inlinks").cast("long").alias("n_inlinks"),
        F.col("n_variants").cast("long").alias("n_variants"),
        "top_anchors",
    )


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-frequency recrawl scheduling
    (operators/scheduler.py:recrawl_schedule — Cho & Garcia-Molina
    freshness policy): per-URL lag window over the fetch history counts
    content-hash changes; the revisit interval is the clamped mean
    change period. Fetch history synthesized from `events` (ts = fetch
    time, md5(event_type) = content hash, event_id = deterministic
    tie-break)."""
    from lightcrawler_spark.operators.scheduler import recrawl_schedule

    ev = _t(spark, sf_dir, "events")
    hist = ev.select(
        F.concat(
            F.lit("http://recrawl.test/p/"),
            (F.col("event_id") % 300).cast("string"),
        ).alias("url"),
        F.col("ts").alias("fetch_ts"),
        F.md5(F.col("event_type")).alias("content_hash"),
        F.col("event_id").alias("seq"),
    )
    return recrawl_schedule(hist, seq_col="seq").select(
        "url",
        F.col("n_fetches").cast("long").alias("n_fetches"),
        F.col("n_changes").cast("long").alias("n_changes"),
        "change_rate",
        F.col("next_interval_sec").cast("long").alias("next_interval_sec"),
        F.col("next_fetch_unix").cast("long").alias("next_fetch_unix"),
    )


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap/sitemap-index parsing (operators/sitemap.py): lazy
    dot-all block split + per-field extraction, pure JVM regexp. Bodies
    are synthesized relationally (3-entry urlsets with optional-field
    variation + 2-entry index docs), so the DuckDB oracle re-builds the
    identical XML and re-parses it with the same RE2-compatible
    patterns — the hash certifies the parse, not a fixture."""
    from lightcrawler_spark.operators.sitemap import parse_sitemaps

    base = spark.range(12)
    sid = F.col("id").cast("string")
    month = ((F.col("id") % 9) + 1).cast("string")
    urlset = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset>\n <url>\n  <loc>\n   http://s'),
        sid, F.lit(".test/p/"), (F.col("id") * 10).cast("string"),
        F.lit("\n  </loc>\n  <lastmod>2024-0"), month,
        F.lit("-15</lastmod>\n  <changefreq>daily</changefreq>\n  <priority>0."),
        (F.col("id") % 10).cast("string"),
        F.lit("</priority>\n </url>\n <url><loc>http://s"),
        sid, F.lit(".test/p/"), (F.col("id") * 10 + 1).cast("string"),
        F.lit("</loc></url>\n <url><loc>http://s"),
        sid, F.lit(".test/p/"), (F.col("id") * 10 + 2).cast("string"),
        F.lit("</loc><priority>1.0</priority></url>\n</urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex>\n <sitemap>\n  <loc>http://s"), sid,
        F.lit(".test/sitemap1.xml</loc>\n  <lastmod>2024-02-0"), month,
        F.lit("</lastmod>\n </sitemap>\n <sitemap><loc> http://s"), sid,
        F.lit(".test/sitemap2.xml </loc></sitemap>\n</sitemapindex>"),
    )
    pages = base.select(
        F.concat(F.lit("http://s"), sid, F.lit(".test/sitemap.xml")).alias(
            "sitemap_url"
        ),
        F.when(F.col("id") % 4 == 3, index).otherwise(urlset).alias("body"),
    )
    return parse_sitemaps(pages).select(
        "sitemap_url", "kind", "seq", "loc", "lastmod", "changefreq",
        "priority",
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram LM score (operators/text.py:unigram_logprob) — the
    model-free perplexity filter. Integer micro-nat summation makes the
    per-doc aggregate exact and order-independent, so Spark and DuckDB
    agree without tolerance."""
    from lightcrawler_spark.operators.text import unigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return unigram_logprob(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_logprob",
    )


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt `Sitemap:` directive discovery
    (operators/sitemap.py:discover_robots_sitemaps) — the hop that turns
    per-host robots bodies into sitemap fetch targets. Bodies are
    synthesized with CRLF line endings, mixed-case keys, indentation, a
    no-space-after-colon form, and a `NotSitemap:` decoy; the DuckDB
    oracle rebuilds the identical bytes (e'' escapes) and applies the
    same RE2-compatible multiline regex."""
    from lightcrawler_spark.operators.sitemap import discover_robots_sitemaps

    base = spark.range(10)
    sid = F.col("id").cast("string")
    body_with = F.concat(
        F.lit("# robots for h"), sid,
        F.lit(".test\r\nUser-agent: *\r\nDisallow: /private\r\n"
              "NotSitemap: http://no.test/x\r\nSitemap: http://h"), sid,
        F.lit(".test/sitemap.xml\r\n\tsitemap: http://h"), sid,
        F.lit(".test/sm"), (F.col("id") % 3).cast("string"),
        F.lit(".xml\r\nSITEMAP:http://cdn.test/global"), sid,
        F.lit(".xml\r\nDisallow: /tmp"),
    )
    body_without = F.concat(
        F.lit("User-agent: *\r\nDisallow: /"), sid
    )
    robots = base.select(
        F.concat(F.lit("h"), sid, F.lit(".test")).alias("host"),
        F.when(F.col("id") % 3 == 2, body_without)
        .otherwise(body_with)
        .alias("body"),
    )
    return discover_robots_sitemaps(robots)


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF keywords
    (operators/ranking.py:tfidf_keywords): term/document frequencies via
    two map-side-combined aggregates, idf quantized to integer micro
    units so `score_micro = tf × idf_micro` ranks bit-deterministically
    in both engines."""
    from lightcrawler_spark.operators.ranking import tfidf_keywords

    docs = _t(spark, sf_dir, "documents")
    return tfidf_keywords(docs, top_k=5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.col("score_micro").cast("long").alias("score_micro"),
        "rank",
    )


def q_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-ratio bucketing
    (operators/images.py:assign_aspect_buckets): argmin over the literal
    bucket grid via array_min of (dist, idx, bw, bh) structs —
    lexicographic struct comparison IS the deterministic tie-broken
    argmin, all inside codegen. The oracle re-ranks the same double
    distances relationally."""
    from lightcrawler_spark.operators.images import assign_aspect_buckets

    imgs = spark.range(400).select(
        F.col("id").alias("image_id"),
        (F.lit(256) + (F.col("id") * 37) % 1280).cast("int").alias("w"),
        (F.lit(256) + (F.col("id") * 53) % 1280).cast("int").alias("h"),
    )
    return assign_aspect_buckets(imgs).select(
        F.col("image_id").cast("long").alias("image_id"),
        "w", "h", "aspect", "bucket_idx", "bucket_w", "bucket_h",
    )


def _trap_url_expr() -> F.Column:
    """Deterministic URL zoo for the trap detector — eight families per
    id%8, each sweeping one signal across its threshold."""
    i = F.col("id")
    host = F.concat(F.lit("https://h"), (i % 7).cast("string"),
                    F.lit(".example.com"))
    fam = (i % 8).cast("int")
    return F.when(
        fam == 0,
        F.concat(host, F.lit("/docs/page"), i.cast("string"), F.lit(".html")),
    ).when(
        fam == 1,
        F.concat(host, F.expr("repeat('/item', CAST(1 + id % 5 AS INT))"),
                 F.lit("/p.html")),
    ).when(
        fam == 2,
        F.concat(host, F.expr("repeat('/d', CAST(5 + id % 12 AS INT))")),
    ).when(
        fam == 3,
        F.concat(host, F.lit("/page.jsp?a=1&JSESSIONID=x"), i.cast("string")),
    ).when(
        fam == 4,
        F.concat(host, F.lit("/s?a=1"),
                 F.expr("repeat('&p=1', CAST(3 + id % 9 AS INT))")),
    ).when(
        fam == 5,
        F.concat(host, F.expr("repeat('/2024', CAST(1 + id % 4 AS INT))"),
                 F.lit("/post")),
    ).when(
        fam == 6,
        F.concat(host, F.lit("/p?q="),
                 F.expr("repeat('x', CAST(480 + (id % 10) * 8 AS INT))")),
    ).otherwise(
        F.concat(host, F.lit("/a/b/a?x=1"))
    )


def q_url_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spider-trap detection (operators/traps.py:with_trap_signals) —
    Heritrix-style pathological-URL heuristics (repeated path segments,
    depth, session-id keys, query-param and calendar explosions) as pure
    row-local JVM expressions, evaluable inside the F1-F9 admission
    battery before the frontier anti-join. The oracle re-derives every
    signal relationally (unnest + group-count for the max segment
    multiplicity) over the same synthesized URL zoo."""
    from lightcrawler_spark.operators.traps import with_trap_signals

    urls = spark.range(400).select("id", _trap_url_expr().alias("url"))
    return with_trap_signals(urls).select(
        F.col("id").cast("long").alias("id"),
        "url", "path_depth", "max_seg_repeat", "n_query_params",
        "has_session_id", "n_calendar_segs", "url_len", "is_trap",
    )


def q_host_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous host→fetcher-shard assignment
    (operators/scheduler.py:assign_crawl_shards): shard = argmax over
    md5(host:shard), computed as array_max of (weight, shard) structs —
    row-local, no shuffle. The oracle recomputes the argmax with a
    correlated ORDER-BY-LIMIT-1 subquery over the same md5 weights."""
    from lightcrawler_spark.operators.scheduler import assign_crawl_shards

    hosts = spark.range(300).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
    )
    return assign_crawl_shards(hosts, n_shards=8).select(
        "id", "host", F.col("shard").cast("int").alias("shard")
    )


# (kind, pinned-prefix-hex). Magic kinds pin only the magic (the md5
# filler enters the 16-byte sniff window behind them); the text kinds
# pin all 16 bytes so the window is fully deterministic.
_MIME_KINDS: list[tuple[str, str]] = [
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("gif", "474946383961"),
    ("pdf", "25504446"),
    ("gzip", "1F8B"),
    ("zip", "504B0304"),
    ("wav", "524946462408000057415645"),
    ("avi", "52494646210C000041564920"),
    ("html", b"  <html><body>Hi".hex().upper()),
    ("plain", b"Hello plain txt!".hex().upper()),
    ("textnl", b"line one\nline 2!".hex().upper()),
    ("binary", "C0DE00FFC0DE00FF"),
]


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME sniffing (operators/mime.py:sniff_mime) — the
    bytes-are-truth router the header-trusting reference lacks
    (PHPCrawlerHTTPRequest.class.php:1150-1174). The Spark side builds
    REAL binary blobs (pinned magic + md5 filler) and sniffs their
    hexed 16-byte prefix; the oracle re-derives the same hex window and
    independently re-applies the rule battery (prefix tests + the
    RE2-compatible whitespace/printable regexes)."""
    from lightcrawler_spark.operators.mime import sniff_mime

    k = (F.col("id") % len(_MIME_KINDS)).cast("int")
    kind, hx = None, None
    for j, (name, prefix) in enumerate(_MIME_KINDS):
        kind = F.when(k == j, name) if kind is None else kind.when(k == j, name)
        hx = F.when(k == j, prefix) if hx is None else hx.when(k == j, prefix)
    blobs = spark.range(480).select(
        F.col("id").cast("long").alias("id"),
        kind.alias("kind"),
        F.to_binary(
            F.concat(hx, F.md5(F.col("id").cast("string"))), F.lit("hex")
        ).alias("bytes"),
    )
    return sniff_mime(blobs).select("id", "kind", "mime")


def q_warc_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC archive assembly (operators/warc.py:warc_records) — records
    positioned in the global byte stream via the two-stage distributed
    prefix sum (range partition → per-partition cumsum → broadcast
    prefix of partition totals; only O(P) rows centralize). The oracle
    is DuckDB's SERIAL running sum over the same assembled record text —
    a hash match proves the distributed offset decomposition exact,
    byte-for-byte, digest-for-digest."""
    from lightcrawler_spark.operators.warc import warc_records

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("text").alias("payload"),
    )
    return warc_records(pages).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url", "content_length", "record_length", "record_md5",
        "warc_offset",
    )


def q_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality gating
    (operators/sampling.py:domain_quality_gate) — RefinedWeb-style
    source curation: block a domain once it has ≥ min_docs documents
    AND its mean score falls below τ. The verdict is exact int64 math
    (sum < τ·n — no float-mean threshold), aggregated with map-side
    combine and joined back as a broadcast dim."""
    from lightcrawler_spark.operators.sampling import domain_quality_gate

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        (F.length("text") % 997).cast("long").alias("score_milli"),
    )
    return domain_quality_gate(
        docs, key_col="source", score_col="score_milli",
        min_docs=50, tau_milli=450,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source", "score_milli", "domain_docs", "domain_mean_milli",
        "domain_blocked",
    )


def _image_dhash_values_sql() -> str:
    """Expected dHashes computed driver-side with the same kernel over
    the fixture source of truth (imagecodec.dhash64 over make_images) —
    the Spark side re-decodes the real blobs distributed."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, dhash64

    rows = ",\n".join(
        f"('{r['image_id']}', {dhash64(decode_image(r['bytes']))})"
        for r in make_images(64)
    )
    return (
        "SELECT image_id, CAST(dhash AS BIGINT) AS dhash FROM (VALUES\n"
        + rows + "\n) AS t(image_id, dhash)"
    )


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-hash computation (operators/images.py:with_dhash) —
    the gradient-sign hash family next to phash64's DCT family; banding
    over both cuts near-dup false merges. One Arrow decode pass per
    batch; VALUES oracle pins every hash against the fixture pixels."""
    from lightcrawler_spark.operators.images import with_dhash

    return with_dhash(_image_df(spark)).select(
        "image_id", F.col("dhash_calc").cast("long").alias("dhash")
    )


def _cdx_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL zoo for the CDX query: www-prefixed hosts (must strip) and
    query strings (must survive into the SURT path part)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"), F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("?b=2&a=1"))
            .otherwise(F.lit("")),
        ).alias("url"),
        F.col("text").alias("payload"),
    )


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index derivation (operators/warc.py:cdx_entries) — SURT keys
    over assembled WARC records: lexicographic order on the key clusters
    a host and its subdomains contiguously, which is what makes the
    (offset, length) archive randomly addressable at 100 TB. Oracle
    re-derives the SURT transform AND the serial offsets."""
    from lightcrawler_spark.operators.warc import cdx_entries, warc_records

    recs = warc_records(_cdx_pages(spark, sf_dir))
    return cdx_entries(recs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "surt_key", "warc_offset", "record_length",
    )


def q_dust_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST-rule canonical dedup key (operators/traps.py:dust_key) —
    the aggressive alias-collapse key (case-fold scheme/host, drop
    fragments + session/tracking params, sort the query, collapse
    duplicate slashes) computed NEXT TO the reference-exact C2
    normalization, which must stay byte-compatible and can strip
    nothing. Row-local expressions; oracle mirrors every rule."""
    from lightcrawler_spark.operators.traps import dust_key

    i = F.col("id")
    fam = (i % 6).cast("int")
    base = F.concat(F.lit("p"), (i % 50).cast("string"))
    url = (
        F.when(fam == 0, F.concat(
            F.lit("HTTPS://WWW.Example.COM/a/"), base,
            F.lit("?utm_source=x&b=2&a=1")))
        .when(fam == 1, F.concat(
            F.lit("http://h.test//a//"), base, F.lit("/#frag")))
        .when(fam == 2, F.concat(
            F.lit("http://h.test/"), base,
            F.lit("?PHPSESSID=zz&z=9&m=5")))
        .when(fam == 3, F.concat(F.lit("http://h.test/"), base, F.lit("?")))
        .when(fam == 4, F.concat(F.lit("https://h.test")))
        .otherwise(F.concat(
            F.lit("http://h.test/"), base, F.lit("?b=2&a=1&b=1")))
    )
    urls = spark.range(300).select(
        F.col("id").cast("long").alias("id"), url.alias("url")
    )
    return urls.select("id", "url", dust_key(F.col("url")).alias("dust_key"))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot diffing (operators/diffing.py:snapshot_diff) —
    added/removed/changed/unchanged per URL across two rounds via one
    full-outer equi-join + a codegen'd CASE; the 'changed' rate feeds
    the recrawl scheduler. Snapshots derive from the documents table
    with a deterministic mutation slice."""
    from lightcrawler_spark.operators.diffing import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://h"), (F.col("doc_id") % 37).cast("string"),
                   F.lit(".test/d/"), F.col("doc_id").cast("string"))
    old = docs.filter(F.col("doc_id") < 400).select(
        url.alias("url"), F.md5(F.col("text")).alias("content_md5"))
    new = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 500)).select(
        url.alias("url"),
        F.md5(
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.col("text"), F.lit("v2")))
            .otherwise(F.col("text"))
        ).alias("content_md5"),
    )
    return snapshot_diff(old, new).select(
        "url", "old_hash", "new_hash", "change"
    )


# Shared fixture for the longest-match robots query: parsed + regex-
# translated ONCE by the engine's own parser; the oracle embeds the
# resulting rule dim as VALUES and re-applies precedence independently.
_ROBOTS_LM_FIXTURE = [
    ("h0.test", "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"
                "Disallow: /tmp*\n"),
    ("h1.test", "User-agent: *\nDisallow: /\nAllow: /docs\n"),
    ("h2.test", "User-agent: spark-frontier\nDisallow: /a$\n"
                "Allow: /exact*z$\nUser-agent: other\nDisallow: /docs\n"),
    # RFC 9309 §2.2.1 group semantics (round 4 fix): consecutive UA lines
    # form ONE group, and the exact-match group SUPPRESSES the * group —
    # under the old union parser /private would be tie-allowed here.
    ("h3.test", "User-agent: aaa\nUser-agent: spark-frontier\n"
                "Disallow: /private\n"
                "User-agent: *\nAllow: /private\nDisallow: /docs\n"),
]

_ROBOTS_LM_PATHS = [
    "/private/pub/x", "/private/secret", "/tmp123", "/docs/guide",
    "/other/page", "/a", "/ab", "/exactMIDz", "/exactMIDzz", "/",
]


def q_robots_longest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 most-specific-match robots verdict
    (operators/admission.py:apply_robots_longest_match) — Allow +
    longest-pattern precedence (ties → Allow), '*'/'$' metacharacters;
    the extension modern sites require beyond the reference's
    Disallow-only parser. Scale shape: broadcast rule dim → regex match
    fan-out → partial-agg max(struct(len, allow)) — the struct ordering
    IS the precedence rule — then a broadcast verdict join-back."""
    from lightcrawler_spark.operators.admission import (
        apply_robots_longest_match,
        robots_rules_extended_df,
    )

    rules = robots_rules_extended_df(
        spark, _ROBOTS_LM_FIXTURE, "spark-frontier"
    )
    i = F.col("id")
    path = None
    for j, p in enumerate(_ROBOTS_LM_PATHS):
        cond = (i % len(_ROBOTS_LM_PATHS)) == j
        path = F.when(cond, p) if path is None else path.when(cond, p)
    links = spark.range(300).select(
        F.col("id").cast("long").alias("id"),
        F.concat(F.lit("http://h"), (i % 4).cast("string"),
                 F.lit(".test"), path).alias("url"),
    )
    return apply_robots_longest_match(links, rules).select(
        "id", "url", "allowed", F.col("matched_len").cast("int").alias("matched_len")
    )


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-local boilerplate removal
    (operators/text.py:strip_boilerplate_lines) — jusText-style
    short/stopword-poor/chrome-phrase line classification with exact
    integer thresholds, folding back per doc in one groupBy. Chrome
    lines are appended deterministically so the pass fires; the oracle
    re-derives classification and ordered reassembly relationally."""
    from lightcrawler_spark.operators.text import strip_boilerplate_lines

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nHome | About | Contact"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.lit("\nCopyright 2026 Example Inc"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("\nthe terms of use apply to all of the pages"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return strip_boilerplate_lines(aug).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_lines", "n_boiler", F.md5("clean_text").alias("clean_md5"),
    )


def q_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder budget apportionment
    (operators/scheduler.py:apportion_budget) — split a global fetch
    budget B over hosts proportional to pending frontier size, integer
    budgets summing EXACTLY to B, every host within 1 of its exact
    share. Quota math is exact int64 (DIV/pmod); the remainder top-R is
    a range-partitioned rank (pack_sequences decomposition), never a
    single-partition window. Oracle = the serial row_number form."""
    from lightcrawler_spark.operators.scheduler import apportion_budget

    hosts = spark.range(800).select(
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".test")).alias("host"),
        ((F.col("id") * 37) % 500 + 1).cast("long").alias("pending"),
    )
    return apportion_budget(hosts, total_budget=10000).select(
        "host", "pending", "budget"
    )


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE first-merge pair statistics (operators/text.py:
    bpe_pair_counts) — adjacent-char pair frequencies over the ascii
    word stream; pair_rank=1 is the merge a BPE trainer performs next.
    Pairs are whole-array zip_with/slice expressions (pushdown-safe),
    counting is map-side-combined, top-k via TakeOrderedAndProject."""
    from lightcrawler_spark.operators.text import bpe_pair_counts

    docs = _t(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, k=25).select(
        "pair", F.col("cnt").cast("long").alias("cnt"), "pair_rank"
    )


def _letterbox_expected():
    """Driver-side replica of the letterbox kernel over the fixture
    source of truth (same math as operators/images.py:letterbox_images,
    canvas 20×16 fill 114)."""
    import hashlib

    import numpy as np

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, encode_image

    out_w, out_h = 20, 16
    rows = []
    for r in make_images(64):
        arr = decode_image(r["bytes"])
        h, w = arr.shape[0], arr.shape[1]
        if w * out_h >= h * out_w:
            cw, ch = out_w, max(1, (h * out_w) // w)
        else:
            ch, cw = out_h, max(1, (w * out_h) // h)
        ys = (np.arange(ch) * h) // ch
        xs = (np.arange(cw) * w) // cw
        canvas = np.full((out_h, out_w, 3), 114, dtype=np.uint8)
        x0, y0 = (out_w - cw) // 2, (out_h - ch) // 2
        canvas[y0:y0 + ch, x0:x0 + cw] = arr[ys[:, None], xs[None, :]]
        enc = encode_image(canvas, r["fmt"])
        rows.append((r["image_id"], x0, y0, cw, ch,
                     hashlib.md5(enc).hexdigest()))
    return rows


def _image_letterbox_values_sql() -> str:
    rows = ",\n".join(
        f"('{i}', {x}, {y}, {w}, {h}, '{m}')"
        for i, x, y, w, h, m in _letterbox_expected()
    )
    return (
        "SELECT image_id, CAST(box_x AS INT) AS box_x, "
        "CAST(box_y AS INT) AS box_y, CAST(box_w AS INT) AS box_w, "
        "CAST(box_h AS INT) AS box_h, boxed_md5 FROM (VALUES\n" + rows +
        "\n) AS t(image_id, box_x, box_y, box_w, box_h, boxed_md5)"
    )


def q_image_letterbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving letterbox preprocessing
    (operators/images.py:letterbox_images) — the CLIP/ViT/YOLO path
    where stretch-resize would distort geometry: integer-exact content
    box, centered on a fill-114 canvas, box geometry emitted for
    coordinate mapping. VALUES oracle pins box geometry AND the md5 of
    every re-encoded canvas against the shared kernel."""
    from lightcrawler_spark.operators.images import letterbox_images

    out = letterbox_images(_image_df(spark), out_w=20, out_h=16)
    return out.select(
        "image_id", "box_x", "box_y", "box_w", "box_h",
        F.md5(F.col("bytes_boxed")).alias("boxed_md5"),
    )


def q_latency_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-adaptive per-host budgets
    (operators/scheduler.py:latency_budgets) — budget =
    clamp(floor(round_ms·n/Σms), 1, cap) from observed fetch latencies,
    exact int64 on the (n, Σ) sufficient statistics (never a float
    mean). One map-side-combining groupBy; the result broadcasts into
    pop_per_host like the Crawl-delay overrides."""
    from lightcrawler_spark.operators.scheduler import latency_budgets

    pages = spark.range(4000).select(
        F.concat(F.lit("h"), (F.col("id") % 40).cast("string"),
                 F.lit(".test")).alias("host"),
        (F.lit(50) + (F.col("id") * 13) % 400).cast("long").alias("fetch_ms"),
    )
    return latency_budgets(
        pages, round_duration_ms=10000, default_budget=4, max_budget=64
    ).select("host", "n_obs", "sum_ms", "host_budget")


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization
    (operators/similarity.py:quantize_embeddings) — the SQ8 compression
    a 100 TB embedding store runs (4× memory/shuffle cut): scale =
    127/max|x|, code = round(x·scale), every step one IEEE op on exact
    float32→double casts so codes are bit-stable. The oracle recomputes
    scales and codes from the same parquet floats."""
    from lightcrawler_spark.operators.similarity import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    # scalar (vec_id, dim, code) cells — the array-free driver
    # projection rule (see q_kmeans_centroids)
    return quantize_embeddings(emb).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round(F.col("q_scale"), 6).alias("q_scale_r"),
        F.posexplode("q_codes").alias("dim", "code"),
    ).select(
        "vec_id", "q_scale_r",
        F.col("dim").cast("long").alias("dim"),
        F.col("code").cast("int").alias("code"),
    )


def q_param_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST rule MINING (operators/traps.py:mine_param_relevance) —
    learn per-host content-irrelevant query params from crawl evidence:
    URLs identical up to one param with identical content support
    irrelevance; differing content contradicts. Two map-side-combined
    aggregations over one explode; verdict = support≥2 ∧ no
    contradictions. Synthetic evidence: a.test's `sess` and b.test's
    `ref` are irrelevant by construction, `id`/`page` are not."""
    from lightcrawler_spark.operators.traps import mine_param_relevance

    i = F.col("id")
    a = F.concat(F.lit("http://a.test/doc?id="), (i % 50).cast("string"),
                 F.lit("&sess="), (i % 3).cast("string"))
    b = F.concat(F.lit("http://b.test/list?page="), (i % 4).cast("string"),
                 F.lit("&ref="), (i % 5).cast("string"))
    pages = spark.range(600).select(
        F.when(i % 2 == 0, a).otherwise(b).alias("url"),
        F.when(i % 2 == 0, F.md5(F.concat(F.lit("A"), (i % 50).cast("string"))))
        .otherwise(F.md5(F.concat(F.lit("B"), (i % 4).cast("string"))))
        .alias("content_md5"),
    )
    return mine_param_relevance(pages).select(
        "host", "param_name", "n_groups", "support", "contradictions",
        "irrelevant",
    )


def q_canonical_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical alias extraction
    (operators/extract.py:extract_canonical) — the site's own dedup
    declaration, which the reference's link finder never reads. Both
    attribute orders exercised; pages without a declaration yield null.
    Pure JVM regex (RE2-compatible), re-derived by the oracle."""
    from lightcrawler_spark.operators.extract import extract_canonical

    i = F.col("id")
    url = F.concat(F.lit("http://s.test/p/"), i.cast("string"))
    canon = F.concat(F.lit("http://s.test/p/"), (i % 40).cast("string"))
    body = (
        F.when(
            i % 3 == 0,
            F.concat(F.lit('<html><head><link rel="canonical" href="'),
                     canon, F.lit('"></head><body>x</body></html>')),
        )
        .when(
            i % 3 == 1,
            F.concat(F.lit("<html><head><LINK href='"), canon,
                     F.lit("' rel=canonical></head><body>y</body></html>")),
        )
        .otherwise(F.lit("<html><head></head><body>plain</body></html>"))
    )
    pages = spark.range(300).select(
        F.col("id").cast("long").alias("id"), url.alias("url"),
        body.alias("body"),
    )
    return extract_canonical(pages).select(
        "id", "url", "canonical_url", "is_alias"
    )


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 approximate top-k (operators/similarity.py:quantized_topk) —
    the scan a compressed 100 TB embedding store runs: exact int64
    multiply-accumulate over int8 codes, one float rescale per pair.
    Broadcast query side, per-query rank window; the oracle recomputes
    codes, integer dots, and the rescale from the same parquet floats."""
    from lightcrawler_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 150)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return quantized_topk(corpus, queries_df, k=3).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "int_dot", "sim_q", "rank",
    )


def q_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit deduplication
    (operators/warc.py:warc_revisit_records) — recrawl pages whose
    digest matches the prior capture become tiny revisit records
    (WARC-Refers-To-Digest) instead of full bodies; pages without a
    prior stay full responses. One equi-join + the same two-stage
    offset prefix sum; the oracle re-assembles both record forms and
    runs the serial running sum."""
    from lightcrawler_spark.operators.warc import warc_revisit_records

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/doc/"), F.col("doc_id").cast("string"))
    pages = docs.select("doc_id", url.alias("url"),
                        F.col("text").alias("payload"))
    prior = docs.filter(F.col("doc_id") >= 50).select(
        url.alias("url"),
        F.md5(
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.col("text"), F.lit("old")))
            .otherwise(F.col("text"))
        ).alias("prior_md5"),
    )
    return warc_revisit_records(pages, prior).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "record_type", "content_length", "record_length", "record_md5",
        "warc_offset",
    )


def _meta_scrub_fixture():
    """Fixture images with spec-correct tEXt chunks injected after IHDR
    (PNG only; fakelossy rows stay clean — the passthrough case)."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import make_png_text_chunk

    rows = []
    for j, r in enumerate(make_images(48)):
        b = r["bytes"]
        if r["fmt"] == "png" and j % 3 != 2:
            extra = make_png_text_chunk(
                b"Author", f"secret-{r['image_id']}".encode()
            )
            if j % 3 == 1:
                extra += make_png_text_chunk(b"GPS", b"52.5,13.4")
            b = b[:33] + extra + b[33:]  # after the 33-byte sig+IHDR
        rows.append((r["image_id"], r["fmt"], b))
    return rows


def _image_meta_scrub_values_sql() -> str:
    import hashlib

    from lightcrawler_spark.imagecodec import strip_png_metadata

    vals = []
    for image_id, fmt, b in _meta_scrub_fixture():
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            clean, n, nb = strip_png_metadata(b)
        else:
            clean, n, nb = b, 0, 0
        vals.append(
            f"('{image_id}', '{fmt}', {n}, {nb}, "
            f"'{hashlib.md5(clean).hexdigest()}')"
        )
    return (
        "SELECT image_id, fmt, CAST(n_removed AS INT) AS n_removed, "
        "CAST(bytes_removed AS BIGINT) AS bytes_removed, clean_md5 "
        "FROM (VALUES\n" + ",\n".join(vals) +
        "\n) AS t(image_id, fmt, n_removed, bytes_removed, clean_md5)"
    )


def q_image_meta_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-side PII scrub (operators/images.py:scrub_image_metadata) —
    drop PNG tEXt/zTXt/iTXt/eXIf/tIME chunks by walking the REAL
    container (CRC-framed chunks, no codec stub); pixels untouched,
    non-PNG passthrough. VALUES oracle pins removal counts AND the md5
    of every cleaned blob."""
    from lightcrawler_spark.operators.images import scrub_image_metadata

    df = spark.createDataFrame(
        [(i, f, bytearray(b)) for i, f, b in _meta_scrub_fixture()],
        "image_id string, fmt string, bytes binary",
    )
    return scrub_image_metadata(df).select(
        "image_id", "fmt",
        F.col("meta_chunks_removed").alias("n_removed"),
        F.col("meta_bytes_removed").alias("bytes_removed"),
        F.md5(F.col("bytes_clean")).alias("clean_md5"),
    )


def _cdc_blob_py(i: int) -> bytes:
    import hashlib as _h

    parts = [
        _h.md5(f"{i}-{j}".encode()).hexdigest()
        for j in range(4 + i % 5)
    ]
    return ("".join(parts)).encode()


def _cdc_values_sql() -> str:
    from lightcrawler_spark.operators.cdc import cdc_chunks

    vals = []
    for i in range(60):
        for j, (off, ln, dig) in enumerate(cdc_chunks(_cdc_blob_py(i))):
            vals.append(f"({i}, {j}, {off}, {ln}, '{dig}')")
    return (
        "SELECT CAST(blob_id AS BIGINT) AS blob_id, "
        "CAST(chunk_idx AS INT) AS chunk_idx, "
        "CAST(c_off AS BIGINT) AS chunk_off, "
        "CAST(length AS BIGINT) AS length, chunk_md5 FROM (VALUES\n"
        + ",\n".join(vals)
        + "\n) AS t(blob_id, chunk_idx, c_off, length, chunk_md5)"
    )


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/cdc.py) — gear-hash CDC
    boundaries for byte-stream dedup (FastCDC-style shift resistance,
    unit-tested: inserting bytes realigns downstream chunks). Blobs are
    synthesized executor-side from range params (md5-string runs); the
    VALUES oracle re-derives every (offset, length, digest) with the
    same public kernel driver-side — the hash match certifies the
    distributed Arrow path."""
    from lightcrawler_spark.operators.cdc import chunk_blobs

    parts = F.transform(
        F.sequence(F.lit(0), (F.lit(3) + F.col("id") % 5).cast("int")),
        lambda j: F.md5(F.concat(F.col("id").cast("string"), F.lit("-"),
                                 j.cast("string"))),
    )
    blobs = spark.range(60).select(
        F.col("id").alias("blob_id"),
        F.array_join(parts, "").cast("binary").alias("bytes"),
    )
    return chunk_blobs(blobs).select(
        "blob_id", "chunk_idx", F.col("offset").alias("chunk_off"),
        "length", "chunk_md5",
    )


def q_archive_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship crawl→archive composition, built purely from the
    verified operators: trap filter (drop session-id URLs before they
    pollute anything) → DUST-key first-wins alias dedup (partial-agg
    min, the line_dedup shape — no window over the key) → WARC record
    assembly with distributed offsets → CDX SURT keys. Proves the
    crawl-side operators compose without breaking each other's scale
    shapes, the way corpus_pipeline proves it for the text side. The
    oracle re-derives the whole chain as one CTE pipeline."""
    from lightcrawler_spark.operators.traps import dust_key, with_trap_signals
    from lightcrawler_spark.operators.warc import cdx_entries, warc_records

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(i % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.org/d/"),
        (i % 200).cast("string"),
        F.when(i % 2 == 0, F.lit("?utm_source=x&a=1")).otherwise(F.lit("?a=1")),
        F.when(i % 7 == 0, F.concat(F.lit("&JSESSIONID=x"), i.cast("string")))
        .otherwise(F.lit("")),
    )
    pages = docs.select("doc_id", url.alias("url"),
                        F.col("text").alias("payload"))
    ok = with_trap_signals(pages).filter(~F.col("is_trap")).select(
        "doc_id", "url", "payload",
        dust_key(F.col("url")).alias("dust_key"),
    )
    winners = ok.groupBy("dust_key").agg(F.min("doc_id").alias("doc_id"))
    survivors = ok.join(winners.select("doc_id"), "doc_id").select(
        "doc_id", "url", "payload"
    )
    recs = cdx_entries(warc_records(survivors))
    return recs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url", "surt_key", "content_length", "record_length", "warc_offset",
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment
    (operators/sampling.py:train_val_test_split) — split is a pure
    function of md5(key), so assignments survive corpus growth and
    re-partitioning, and keying by dedup-cluster ids keeps
    near-duplicates in one split. Shuffle-free; the oracle re-derives
    the hash intervals."""
    from lightcrawler_spark.operators.sampling import train_val_test_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return train_val_test_split(docs, key_col="doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang", "split", "split_u",
    )


def _consensus_fixture():
    """Images with REAL near-dup structure: every base gets a lightly
    perturbed variant (a sparse deterministic pixel bump — small Hamming
    drift in both hash families) and a brightness-shifted variant
    (phash drops the DC term and dhash is gradient-signed, so both are
    ~invariant). Unrelated bases should not pair."""
    import numpy as np

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, png_encode

    out = []
    for j, r in enumerate(make_images(12)):
        if r["fmt"] != "png":
            continue
        arr = decode_image(r["bytes"])
        out.append((f"base{j}", png_encode(arr)))
        pert = arr.copy()
        pert[::7, ::11] = np.minimum(pert[::7, ::11], 252) + 3
        out.append((f"pert{j}", png_encode(pert)))
        bright = np.minimum(arr, 247) + 8
        out.append((f"brt{j}", png_encode(bright)))
    return out


def _consensus_values_sql() -> str:
    """Expected pairs via the same candidacy rule the op uses (shared
    16-bit phash chunk) + both exact Hamming gates, enumerated
    driver-side with the shared kernels."""
    from lightcrawler_spark.imagecodec import decode_image, dhash64, phash64

    imgs = _consensus_fixture()
    h = {}
    for iid, b in imgs:
        arr = decode_image(b)
        h[iid] = (phash64(arr), dhash64(arr))

    def chunks(v):
        return {(i, (v >> (i * 16)) & 0xFFFF) for i in range(4)}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(h)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            pa, da = h[a]
            pb, db = h[b]
            if not (chunks(pa) & chunks(pb)):
                continue
            hp, hd = ham(pa, pb), ham(da, db)
            if hp <= 6 and hd <= 6:
                rows.append(f"('{a}', '{b}', {hp}, {hd})")
    return (
        "SELECT id_a, id_b, CAST(phash_hamming AS INT) AS phash_hamming, "
        "CAST(dhash_hamming AS INT) AS dhash_hamming FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(id_a, id_b, phash_hamming, dhash_hamming)"
    )


def q_image_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-family image near-dup consensus
    (operators/images.py:consensus_near_dup_pairs) — phash band-join
    candidates kept only when BOTH phash AND dhash agree (≤6 bits),
    cutting each family's false merges. Hashes are computed distributed
    from the real blobs; the VALUES oracle enumerates every pair
    driver-side under the identical candidacy + gates."""
    from lightcrawler_spark.operators.images import (
        consensus_near_dup_pairs,
        dhash_udf,
        phash_udf,
    )

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in _consensus_fixture()],
        "image_id string, bytes binary",
    )
    hashed = df.select(
        "image_id",
        phash_udf(F.col("bytes")).alias("phash"),
        dhash_udf(F.col("bytes")).alias("dhash"),
    )
    return consensus_near_dup_pairs(hashed).select(
        "id_a", "id_b",
        F.col("phash_hamming").cast("int").alias("phash_hamming"),
        F.col("dhash_hamming").cast("int").alias("dhash_hamming"),
    )


def q_phash_guaranteed_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guaranteed-recall phash near-dup pairs
    (operators/images.py:phash_near_dup_pairs with bands=7): pigeonhole
    over 10-bit chunks guarantees every pair at Hamming ≤ 6 is found,
    so the oracle is the EXACT all-pairs SQL with no candidacy clause —
    a strictly stronger contract than the banded queries (whose oracles
    must mirror the band join). The fixture is built to defeat the
    default 4×16-bit banding: 40 groups of 5 hashes whose member deltas
    spread 4–6 bits across all four 16-bit chunks (members 1–3 share NO
    16-bit chunk with their base), so 5 of the 6 true pairs per group
    exist only because of the recall guarantee."""
    from lightcrawler_spark.operators.images import phash_near_dup_pairs

    # deltas vs the group base; bit positions chosen to hit all four
    # 16-bit chunks (4-band join misses) while leaving ≥1 of the seven
    # 10-bit bands untouched (7-band join must find)
    d1 = 562958543486978       # bits {1,17,33,49}  — Hamming 4 vs base
    d2 = 1154047421693820932   # bits {2,18,34,50,60} — Hamming 5
    d3 = 2308094843387643912   # bits {3,11,19,35,51,61} — Hamming 6
    d4 = 1                     # bit {0} — control, found by any banding
    imgs = (
        spark.range(200)
        .select(
            F.col("id").alias("image_id"),
            (F.col("id") % 40).alias("_g"),
            F.floor(F.col("id") / 40).cast("long").alias("_j"),
        )
        .select(
            "image_id",
            (
                (F.col("_g") * F.lit(2654435761))
                .bitwiseXOR(F.shiftleft(F.col("_g") * F.lit(40503), 32))
            )
            .bitwiseXOR(
                F.when(F.col("_j") == 1, F.lit(d1))
                .when(F.col("_j") == 2, F.lit(d2))
                .when(F.col("_j") == 3, F.lit(d3))
                .when(F.col("_j") == 4, F.lit(d4))
                .otherwise(F.lit(0))
                .cast("long")
            )
            .alias("phash"),
        )
    )
    pairs = phash_near_dup_pairs(
        imgs, max_hamming=6, id_col="image_id", bands=7
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def q_frontier_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier starvation telemetry
    (operators/scheduler.py:frontier_age_report) — per-priority pending
    count / oldest round / max and exact-mean wait: the starvation
    signal the reference's scalar counters cannot show. One map-side-
    combining groupBy; ≤ #levels output rows."""
    from lightcrawler_spark.operators.scheduler import frontier_age_report

    ev = _t(spark, sf_dir, "events")
    frontier = ev.select(
        (F.col("user_id") % 4).cast("int").alias("priority_level"),
        ((F.col("event_id") * 7) % 50 + 1).cast("long").alias("round"),
    )
    return frontier_age_report(frontier, current_round=60).select(
        "priority_level", "n_pending", "oldest_round",
        "max_wait_rounds", "mean_wait_rounds",
    )


def q_raw_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Once-task offline replay (operators/replay.py; reference
    worker/SpiderGovCnZhengceOnceTask.class.php:52-120): stored raw-page
    snapshots (url line, one discarded metadata line, body) parsed and
    break-normalized WITHOUT refetching — the extraction-changed,
    re-run-the-corpus job. Pure JVM split/slice/regexp map, scan-local.
    Exercises both pinned quirks: the trailing bare-"0" fgets loop-stop
    drop (doc_id%5==0 rows) and the '<BR/>' spelling the reference's
    str_replace list misses."""
    from lightcrawler_spark.operators.replay import (
        raw_snapshot_expr, replay_snapshots,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1200)
    snap = d.select(
        "doc_id",
        raw_snapshot_expr(
            F.concat(F.lit("http://replay.test/doc/"),
                     F.col("doc_id").cast("string"), F.lit(".htm  ")),
            F.lit("meta fetched=2017-04-05 status=200"),
            F.concat(
                F.lit("Para1<br>Para2<BR />Para3<BR/>\r"),
                F.substring("text", 1, 100),
                F.when(F.col("doc_id") % 5 == 0, F.lit("\n0"))
                .otherwise(F.lit("")),
            ),
        ).alias("snapshot"),
    )
    return replay_snapshots(snap).select("doc_id", "url", "source")


def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best cluster representative selection
    (operators/textdedup.py:select_cluster_representatives) — the
    LAION/DataComp step after near-dup clustering: one winner per
    cluster by lexicographic quality (n_chars, then a derived score),
    ties to lowest doc_id. Scale shape under audit: winner selection is
    max(struct) + equi-join + min(id) — partial-aggregating all the way,
    NO rank window, so a 10^8-row spam mega-cluster never lands in one
    window partition. The oracle re-derives the winner with a plain
    row_number window (independent algebra, same answer)."""
    from lightcrawler_spark.operators.textdedup import (
        select_cluster_representatives,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        (F.col("doc_id") % 60).cast("long").alias("component"),
        ((F.col("doc_id") * F.lit(2654435761)) % 1000)
        .cast("long").alias("q2"),
    )
    reps = select_cluster_representatives(
        d, cluster_col="component", id_col="doc_id",
        quality_cols=("n_chars", "q2"),
    )
    return reps.select(
        F.col("component").cast("long").alias("component"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("q2").cast("long").alias("q2"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def q_hard_negative_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining
    (operators/similarity.py:hard_negatives): per anchor, the top-3
    most-similar DIFFERENT-label vectors with cosine ≥ 0.2 — candidates
    from the same SRP-LSH bucket equi-join as embedding_lsh (never
    all-pairs), rank window on the anchor id (maximal-cardinality key,
    per-partition rows ≤ bucket size). The oracle rebuilds the SRP
    buckets from the shared md5 weight formula and re-ranks with SQL
    windows."""
    from lightcrawler_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negatives(emb, k=3, min_sim=0.2, n_bits=4).select(
        F.col("anchor_id").cast("long").alias("anchor_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard integrity manifest
    (operators/chunking.py:shard_manifest over assign_shards): per
    shard — sample count, payload bytes, key range, md5 over the
    layout-ordered key:size list. Byte offsets come from the two-stage
    distributed prefix sum; the signature fold is bounded by the shard
    byte cap (one tar file), never O(corpus). Oracle = DuckDB's serial
    running sum + string_agg(... ORDER BY offset), digest for digest."""
    from lightcrawler_spark.operators.chunking import (
        assign_shards, shard_manifest,
    )

    samples = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("image_id"),
        (F.col("n_chars") * 7 + 100).cast("long").alias("n_bytes"),
    )
    sharded = assign_shards(samples, shard_bytes=500_000,
                            order_col="image_id", size_col="n_bytes")
    return shard_manifest(sharded).select(
        F.col("shard_idx").cast("long").alias("shard_idx"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        F.col("first_key").cast("long").alias("first_key"),
        F.col("last_key").cast("long").alias("last_key"),
        "content_md5",
    )


def q_pagerank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank-driven frontier prioritization
    (operators/scheduler.py:priority_from_pagerank): the Cho/
    Garcia-Molina/Page crawl ordering — P2 levels from link analysis
    instead of the reference's regex lists. Same dyadic 64-node contract
    graph as link_pagerank (doubles exact), doubling-based tiers
    compared as shifted int64s (no float hazard), nodes 64-69 absent
    from the graph prove the crawl-the-unknown-last level-0 default.
    Scale shape: max collapses to a driver scalar, tiering is one
    codegen'd CASE, the rank join is an AQE-splittable equi-join."""
    from lightcrawler_spark.operators.graph import pagerank
    from lightcrawler_spark.operators.scheduler import (
        priority_from_pagerank,
    )

    n = 64
    base = spark.range(n)
    edges = base.select(
        F.col("id").alias("src"), ((F.col("id") * 2 + 1) % n).alias("dst")
    ).unionByName(
        base.filter(F.col("id") % 2 == 0).select(
            F.col("id").alias("src"), F.floor(F.col("id") / 2).alias("dst")
        )
    )
    nodes = base.select(F.col("id").alias("node"))
    ranks = pagerank(edges, nodes=nodes, iterations=3, damping=0.5)
    frontier = spark.range(70).select(
        F.col("id").alias("node"),
        F.concat(F.lit("http://pr.test/n/"),
                 F.col("id").cast("string")).alias("url"),
    )
    return priority_from_pagerank(frontier, ranks, levels=4).select(
        F.col("node").cast("long").alias("node"),
        "url",
        F.col("priority_level").cast("int").alias("priority_level"),
    )


def _synth_phash_imgs(spark: SparkSession) -> DataFrame:
    """Shared relational synthesis for the curation/layout flagships:
    300 images in 60 phash groups of 5 (members differ in ≤ 2 low bits
    via shifted-power xors, bases spread across band chunks) plus
    w/h/cap_len/area quality columns — re-derivable in DuckDB."""
    return (
        spark.range(300)
        .select(
            F.col("id").alias("image_id"),
            (F.col("id") % 60).alias("_g"),
            F.floor(F.col("id") / 60).cast("long").alias("_j"),
            (F.lit(24) + (F.col("id") % 10) * 8).cast("int").alias("w"),
            (F.lit(24) + (F.col("id") % 7) * 4).cast("int").alias("h"),
            (F.lit(8) + (F.col("id") * 13) % 23).cast("long")
            .alias("cap_len"),
        )
        .select(
            "image_id", "_j", "w", "h", "cap_len",
            (F.col("_g") * F.lit(2654435761))
            .bitwiseXOR(F.shiftleft(F.col("_g") * F.lit(40503), 32))
            .alias("_base"),
        )
        .select(
            "image_id", "w", "h", "cap_len",
            (F.col("w").cast("long") * F.col("h")).alias("area"),
            F.when(
                F.col("_j") > 0,
                F.col("_base").bitwiseXOR(
                    F.pow(F.lit(2.0), (F.col("_j") * 2).cast("double"))
                    .cast("long")
                ),
            )
            .otherwise(F.col("_base"))
            .alias("phash"),
        )
    )


def q_layout_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth composed flagship — contrastive TRAINING-LAYOUT chain in
    one plan: phash pigeonhole near-dup pairs → min-label connected
    components → conflict-free batch layout
    (operators/chunking.py:contrastive_batches) — dedup clusters
    flowing straight into the batch construction that keeps surviving
    near-dups out of each other's in-batch negatives. One chained-CTE
    oracle re-derives band candidacy, the recursive closure, the
    (size DESC, key, id) layout rank and the modulo batches. Certifies
    that this session's layout operator composes with the dedup
    subsystem the way curation_pipeline certifies the keep-best
    chain."""
    from lightcrawler_spark.operators.chunking import contrastive_batches
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.images import phash_near_dup_pairs

    imgs = _synth_phash_imgs(spark)
    pairs = phash_near_dup_pairs(imgs, max_hamming=6, id_col="image_id")
    clusters = dedup_cluster_assignments(
        pairs, imgs, id_col="image_id"
    ).select("image_id", "cluster")
    out = contrastive_batches(
        clusters, batch_size=16, cluster_col="cluster",
        id_col="image_id", num_partitions=8,
    )
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "cluster_key",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("layout_rank").cast("long").alias("layout_rank"),
        F.col("batch_idx").cast("long").alias("batch_idx"),
    )


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third composed flagship — the image+caption CURATION chain, end
    to end in one plan: phash pigeonhole near-dup pairs
    (operators/images.py:phash_near_dup_pairs) → min-label connected
    components (operators/graph.py:dedup_cluster_assignments) →
    keep-best representative per cluster
    (operators/textdedup.py:select_cluster_representatives, quality =
    (area, caption length), ties to lowest id) → nearest-aspect bucket
    (operators/chunking.py:assign_aspect_buckets) → WebDataset shard
    binning on the distributed prefix sum
    (operators/chunking.py:assign_shards). The whole chain is
    re-derived by one chained-CTE DuckDB oracle (recursive CC, window
    re-rank, serial running sum), so a green row certifies the
    curation subsystem's composition, not just its pieces. Scale
    shapes: band equi-join candidates, shuffle-bounded CC, window-free
    argmax winner, O(P)-driver prefix sum."""
    from lightcrawler_spark.operators.chunking import (
        assign_aspect_buckets, assign_shards,
    )
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.images import phash_near_dup_pairs
    from lightcrawler_spark.operators.textdedup import (
        select_cluster_representatives,
    )

    imgs = _synth_phash_imgs(spark)
    pairs = phash_near_dup_pairs(imgs, max_hamming=6, id_col="image_id")
    clusters = dedup_cluster_assignments(
        pairs, imgs, id_col="image_id"
    ).select("image_id", "cluster")
    reps = select_cluster_representatives(
        imgs.join(clusters, "image_id"),
        cluster_col="cluster", id_col="image_id",
        quality_cols=("area", "cap_len"),
    )
    bucketed = assign_aspect_buckets(reps, batch_size=4, num_partitions=8)
    sharded = assign_shards(
        bucketed.withColumn("n_bytes", F.col("area") * 3),
        shard_bytes=100_000, order_col="image_id", size_col="n_bytes",
    )
    return sharded.select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("image_id").cast("long").alias("image_id"),
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        F.col("area").cast("long").alias("area"),
        F.col("cap_len").cast("long").alias("cap_len"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("bucket_id").cast("int").alias("bucket_id"),
        F.col("shard_idx").cast("long").alias("shard_idx"),
    )


def q_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataComp-style top-fraction curation cut
    (operators/sampling.py:quantile_gate): keep the top 30% of documents
    by exact integer quality score. The threshold is an EXACT
    distributed order statistic via radix-select (two ≤65k-row
    histogram aggregates, no global sort, no approx_percentile error —
    a sketch-error here is a curation-policy bug); the data pass is one
    codegen'd `score >= T` literal filter. Tie-inclusive at the cut, so
    fully deterministic. The oracle re-derives T with a descending
    cumulative window over the score histogram — independent algebra,
    same threshold."""
    from lightcrawler_spark.operators.sampling import quantile_gate
    from lightcrawler_spark.operators.text import with_quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = with_quality_score(docs).select(
        "doc_id",
        F.round(F.col("quality_score") * 10000).cast("long")
        .alias("score_m4"),
    )
    return quantile_gate(scored, score_col="score_m4",
                         keep_top_frac=0.3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score_m4").cast("long").alias("score_m4"),
        F.col("score_threshold").cast("long").alias("score_threshold"),
    )


def q_image_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination for an image corpus
    (operators/images.py:phash_decontaminate): drop every corpus image
    whose phash is within Hamming 6 of ANY benchmark image — the
    image-side sibling of `decontaminate` (n-gram eval-overlap ban).
    bands = max_hamming + 1 gives GUARANTEED pigeonhole recall, so the
    contract is exact and the oracle is the bare all-pairs NOT EXISTS
    with no candidacy clause. Fixture: 80 hash-mixed groups × 5
    variants (exact dup, Hamming 4, 6, 7, far); the eval set holds the
    bases of groups 0–39 — so kept = all of groups 40–79 plus the
    7-bit/far variants of the contaminated groups."""
    from lightcrawler_spark.operators.images import phash_decontaminate

    d4 = 562958543486978        # bits {1,17,33,49}      — Hamming 4
    d6 = 2308094843387643912    # bits {3,11,19,35,51,61} — Hamming 6
    d7 = 2308094843387643928    # d6 + bit {4} (bit 4 clear in d6) — 7
    far = 6148914691236517205   # alternating 01… (32 bits)
    mix = (
        (F.col("_g") * F.lit(2654435761))
        .bitwiseXOR(F.shiftleft(F.col("_g") * F.lit(40503), 32))
    )
    corpus = (
        spark.range(400)
        .select(
            F.col("id").alias("image_id"),
            (F.col("id") % 80).alias("_g"),
            F.floor(F.col("id") / 80).cast("long").alias("_j"),
        )
        .select(
            "image_id",
            mix.bitwiseXOR(
                F.when(F.col("_j") == 1, F.lit(d4))
                .when(F.col("_j") == 2, F.lit(d6))
                .when(F.col("_j") == 3, F.lit(d7))
                .when(F.col("_j") == 4, F.lit(far))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("phash"),
        )
    )
    evalset = spark.range(40).select(
        F.col("id").alias("_g")
    ).select(mix.alias("phash"))
    return phash_decontaminate(corpus, evalset, max_hamming=6).select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("phash").cast("long").alias("phash"),
    )


def q_caption_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-caption boilerplate flagging
    (operators/images.py:flag_frequent_captions): normalize (lower,
    trim, collapse whitespace) and flag captions occurring ≥ 50 times
    corpus-wide — the LAION/DataComp "stock photo" frequency cut.
    Captions derive deterministically from doc_id: three casings of
    'stock photo' and two of 'an image' that must COLLAPSE to two
    frequent groups, plus unique per-doc tails that must stay freq=0.
    The oracle re-derives the normalization and a full groupBy count
    independently (no broadcast-frequent shortcut)."""
    from lightcrawler_spark.operators.images import flag_frequent_captions

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 10
    caps = docs.withColumn(
        "caption",
        F.when(m == 0, F.lit("Stock  Photo"))
        .when(m == 1, F.lit(" stock photo "))
        .when(m == 2, F.lit("STOCK PHOTO"))
        .when(m == 3, F.lit("An Image"))
        .when(m == 4, F.lit("an  image"))
        .otherwise(F.concat(F.lit("photo of item "), F.col("doc_id"))),
    )
    return flag_frequent_captions(caps, min_freq=50).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("caption_norm").alias("caption_norm"),
        F.col("caption_freq").cast("long").alias("caption_freq"),
        F.col("caption_boilerplate").alias("caption_boilerplate"),
    )


@_functools.lru_cache(maxsize=1)
def _psnr_fixture() -> tuple[list, list]:
    """Shared fixture for the psnr_verify contract: 8 base images, each
    with an exact re-encode pair (999.0 dB), a ±1-noise copy (≥ 48 dB,
    verified), a ±80-noise copy (≈ 12 dB, the hash-collision false
    positive PSNR must reject), and a dim-mismatched image (0.0 dB by
    definition). The CONSTRUCTION is shared between the Spark query and
    the VALUES oracle; the PSNR math is implemented twice, independently
    (vectorized numpy `psnr` in the operator kernel vs a sequential
    scalar loop in _psnr_verify_values_sql), so a kernel bug cannot
    cancel out. Returns (image rows, candidate pair rows)."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    rows, pair_rows = [], []
    for g in range(8):
        base = (
            (np.arange(24 * 24 * 3, dtype=np.int64) * (7 + g) + g * 13)
            % 251
        ).astype(np.uint8).reshape(24, 24, 3)
        rng = np.random.default_rng(1000 + g)
        tiny = np.clip(
            base.astype(np.int32)
            + rng.integers(-1, 2, size=base.shape), 0, 255
        ).astype(np.uint8)
        loud = np.clip(
            base.astype(np.int32)
            + rng.integers(-80, 81, size=base.shape), 0, 255
        ).astype(np.uint8)
        small = base[:16, :16].copy()
        gid = g * 4
        rows += [
            (gid + 0, bytearray(encode_image(base, "png"))),
            (gid + 1, bytearray(encode_image(tiny, "png"))),
            (gid + 2, bytearray(encode_image(loud, "png"))),
            (gid + 3, bytearray(encode_image(small, "png"))),
        ]
        pair_rows += [(gid, gid + 1), (gid, gid + 2), (gid, gid + 3),
                      (gid, gid)]
    return rows, pair_rows


def q_psnr_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pixel verification of near-dup candidates
    (operators/images.py:psnr_verify_pairs): decode both blobs of each
    candidate pair and keep PSNR ≥ 40 dB — the input_hint's per-row
    invariant applied pairwise, the precision stage after banded
    phash/dhash candidate generation (fixture: _psnr_fixture). The
    oracle re-derives every verdict from scalar-loop PSNR over the
    shared fixture; verdicts are additionally pinned value-exact by
    tests/test_curation_images_r4b.py."""
    from lightcrawler_spark.operators.images import psnr_verify_pairs

    rows, pair_rows = _psnr_fixture()
    images = spark.createDataFrame(rows, "image_id long, bytes binary")
    pairs = spark.createDataFrame(pair_rows, "id_a long, id_b long")
    return psnr_verify_pairs(pairs, images, threshold_db=40.0).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("psnr_ok").alias("psnr_ok"),
    )


def _scalar_psnr_db(arr_a, arr_b) -> float:
    """Sequential scalar-loop PSNR shared by the psnr_verify and
    precision_curation oracles — deliberately NOT the vectorized numpy
    `psnr` of the kernel, so oracle and kernel cannot share a bug.
    Shape mismatch → 0.0 dB by definition; exact-equal → 999.0."""
    import math

    if arr_a.shape != arr_b.shape:
        return 0.0
    fa = [int(v) for v in arr_a.reshape(-1)]
    fb = [int(v) for v in arr_b.reshape(-1)]
    sse = sum((x - y) * (x - y) for x, y in zip(fa, fb))
    if sse == 0:
        return 999.0
    return round(10.0 * math.log10(255.0 ** 2 * len(fa) / sse), 2)


def _psnr_verify_values_sql() -> str:
    """Oracle for psnr_verify: re-derive every candidate pair's verdict
    from the scalar-loop PSNR (_scalar_psnr_db) over the SHARED fixture
    (_psnr_fixture) embedded as VALUES; the ≥ 40 dB decision itself is
    made in SQL."""
    from lightcrawler_spark.imagecodec import decode_image

    rows, pair_rows = _psnr_fixture()
    decoded = {i: decode_image(bytes(b)) for i, b in rows}
    p_rows = [
        f"({a}, {b}, {_scalar_psnr_db(decoded[a], decoded[b])})"
        for a, b in pair_rows
    ]
    return (
        "WITH p(id_a, id_b, psnr_db) AS (VALUES\n"
        + ",\n".join(p_rows) + ")\n"
        "SELECT CAST(id_a AS BIGINT) AS id_a,\n"
        "       CAST(id_b AS BIGINT) AS id_b,\n"
        "       (psnr_db >= 40.0) AS psnr_ok\n"
        "FROM p"
    )


def _quality_fixture_images() -> list:
    """Shared fixture for the image_quality_gate contract: 9 images
    exercising every verdict path of the low-information gate. The
    CONSTRUCTION is shared between the Spark query and the VALUES
    oracle; the statistics math is implemented twice, independently
    (vectorized numpy in the operator kernel vs scalar loops in
    _image_quality_values_sql), so a kernel bug cannot cancel out."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(encode_image(a.astype(np.uint8), "png"))

    solid_gray = np.full((24, 24, 3), 128)
    solid_color = np.zeros((24, 24, 3)); solid_color[..., 0] = 10
    solid_color[..., 1] = 200; solid_color[..., 2] = 30
    noise = np.random.default_rng(42).integers(
        0, 256, size=(24, 24, 3))
    ramp = np.repeat(
        (np.arange(24) * 3)[None, :, None], 24, axis=0
    ).repeat(3, axis=2)
    checker = np.where(
        ((np.arange(24)[:, None] + np.arange(24)[None, :]) % 2 == 0),
        255, 0
    )[..., None].repeat(3, axis=2)
    near_solid = np.full((24, 24, 3), 200); near_solid[0, 0] = (0, 0, 0)
    tiny = np.random.default_rng(7).integers(0, 256, size=(2, 2, 3))
    return [
        (0, enc(solid_gray)),
        (1, enc(solid_color)),
        (2, enc(noise)),
        (3, enc(ramp)),
        (4, enc(checker)),
        (5, enc(near_solid)),
        (6, bytearray(b"notanimage")),
        (7, None),
        (8, enc(tiny)),
    ]


def q_image_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-information image gate
    (operators/images.py:with_image_quality_stats + low_information_expr):
    histogram entropy, variance-of-Laplacian blur score, modal-pixel
    solidity and grayscale detection in ONE Arrow pass, verdict derived
    JVM-side. Fixture paths: solid (entropy 0 → low), linear ramp
    (interior Laplacian exactly 0 → low/blurred), seeded noise (keep),
    per-pixel checkerboard (entropy exactly 1.0, huge Laplacian → keep),
    near-solid placeholder (modal fraction 0.998 → low), corrupt blob /
    NULL (null stats, NULL verdict), 2×2 (no interior → lap 0 → low).
    Oracle: same fixture, independent scalar-loop statistics, verdict
    re-derived in SQL from the VALUES stats."""
    from lightcrawler_spark.operators.images import (
        low_information_expr,
        with_image_quality_stats,
    )

    df = spark.createDataFrame(
        _quality_fixture_images(), "image_id long, bytes binary"
    )
    return (
        with_image_quality_stats(df)
        .withColumn("low_information", low_information_expr())
        .select(
            F.col("image_id").cast("long").alias("image_id"),
            "qual_entropy", "qual_lap_var",
            F.col("qual_modal_count").cast("long").alias("qual_modal_count"),
            F.col("qual_n_pixels").cast("long").alias("qual_n_pixels"),
            "qual_grayscale", "low_information",
        )
    )


def _scalar_quality_stats(arr):
    """Scalar-loop reimplementation of the quality statistics
    (collections.Counter histogram + math.log2 entropy, sequential
    integer Laplacian accumulation) — deliberately NOT the vectorized
    numpy math of image_quality_stats_udf, so oracle and kernel cannot
    share a bug. Returns (entropy, lap_var, modal_count, n_pixels,
    grayscale)."""
    import math
    from collections import Counter

    h, w = arr.shape[0], arr.shape[1]
    n = h * w
    gray = [
        [int(arr[y][x][0]) + int(arr[y][x][1]) + int(arr[y][x][2])
         for x in range(w)]
        for y in range(h)
    ]
    hist = Counter(v for row in gray for v in row)
    entropy = round(
        -sum((c / n) * math.log2(c / n) for c in hist.values()), 4
    )
    if h >= 3 and w >= 3:
        s = ss = ln = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                l = (4 * gray[y][x] - gray[y][x - 1] - gray[y][x + 1]
                     - gray[y - 1][x] - gray[y + 1][x])
                s += l; ss += l * l; ln += 1
        lap = round(float(ln * ss - s * s) / float(ln * ln), 4)
    else:
        lap = 0.0
    modal = Counter(
        (int(arr[y][x][0]), int(arr[y][x][1]), int(arr[y][x][2]))
        for y in range(h) for x in range(w)
    ).most_common(1)[0][1]
    gs = all(
        int(arr[y][x][0]) == int(arr[y][x][1]) == int(arr[y][x][2])
        for y in range(h) for x in range(w)
    )
    return entropy, lap, modal, n, gs


def _image_quality_values_sql() -> str:
    """Independent reimplementation of the quality statistics with
    scalar loops (_scalar_quality_stats) over the SHARED fixture; the
    low_information verdict is re-derived in SQL from the stats."""
    from lightcrawler_spark.imagecodec import decode_image

    rows = []
    for image_id, blob in _quality_fixture_images():
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            rows.append(
                f"({image_id}, NULL, NULL, NULL, NULL, NULL)"
            )
            continue
        entropy, lap, modal, n, gs = _scalar_quality_stats(arr)
        rows.append(
            f"({image_id}, {entropy}, {lap}, {modal}, {n}, "
            f"{str(bool(gs)).lower()})"
        )
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id,\n"
        "       CAST(qual_entropy AS DOUBLE) AS qual_entropy,\n"
        "       CAST(qual_lap_var AS DOUBLE) AS qual_lap_var,\n"
        "       CAST(qual_modal_count AS BIGINT) AS qual_modal_count,\n"
        "       CAST(qual_n_pixels AS BIGINT) AS qual_n_pixels,\n"
        "       CAST(qual_grayscale AS BOOLEAN) AS qual_grayscale,\n"
        "       CASE WHEN qual_entropy IS NULL THEN NULL\n"
        "            ELSE (qual_entropy < 1.0 OR qual_lap_var < 1.0\n"
        "                  OR qual_modal_count > 0.9 * qual_n_pixels)\n"
        "       END AS low_information\n"
        "FROM (VALUES\n" + ",\n".join(rows)
        + "\n) AS t(image_id, qual_entropy, qual_lap_var,"
        " qual_modal_count, qual_n_pixels, qual_grayscale)"
    )


@_functools.lru_cache(maxsize=1)
def _precision_fixture() -> list:
    """Shared fixture for the precision_curation flagship: 10 content
    groups × (base, ±1-noise near-dup, ±80-noise lookalike) + 4
    low-information images + 1 corrupt blob, with a boilerplate caption
    ('Stock  Photo') on every id ≡ 3 (mod 7) and unique captions
    elsewhere. Returns (image_id, blob_or_corrupt, caption)."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(encode_image(a.astype(np.uint8), "png"))

    def cap(i):
        return "Stock  Photo" if i % 7 == 3 else f"photo item {i}"

    rows = []
    for g in range(10):
        base = np.random.default_rng(100 + g).integers(
            0, 256, size=(24, 24, 3))
        tiny = np.clip(
            base + np.random.default_rng(200 + g).integers(
                -1, 2, size=base.shape), 0, 255)
        loud = np.clip(
            base + np.random.default_rng(300 + g).integers(
                -80, 81, size=base.shape), 0, 255)
        for j, arr in enumerate((base, tiny, loud)):
            i = 3 * g + j
            rows.append((i, enc(arr), cap(i)))
    solid = np.full((24, 24, 3), 128)
    solid_color = np.zeros((24, 24, 3))
    solid_color[..., 0] = 10; solid_color[..., 1] = 200
    solid_color[..., 2] = 30
    ramp = np.repeat(
        (np.arange(24) * 3)[None, :, None], 24, axis=0
    ).repeat(3, axis=2)
    near_solid = np.full((24, 24, 3), 200); near_solid[0, 0] = (0, 0, 0)
    for k, arr in enumerate((solid, solid_color, ramp, near_solid)):
        i = 30 + k
        rows.append((i, enc(arr), cap(i)))
    rows.append((34, bytearray(b"notanimage"), cap(34)))
    return rows


@_functools.lru_cache(maxsize=1)
def _precision_eval_hashes() -> list:
    """Benchmark eval-set hashes for the decontamination stage: the
    phashes of groups 0 and 1's base images (fixture ids 0 and 3)."""
    from lightcrawler_spark.imagecodec import decode_image, phash64

    rows = dict((i, b) for i, b, _ in _precision_fixture())
    return [phash64(decode_image(bytes(rows[0]))),
            phash64(decode_image(bytes(rows[3])))]


def _precision_verified_stage(spark: SparkSession):
    """The pre-CC stage of precision_curation — gate → boilerplate cut
    → phash+dhash → eval decontamination → consensus candidates → PSNR
    verification. Split out so tools/explain_audit.py can assert the
    plan shape of this stage directly (the flagship's FINAL plan hides
    it behind the connected-components localCheckpoint). Returns
    (verified pair DF, decontaminated survivor DF)."""
    from lightcrawler_spark.operators.images import (
        consensus_near_dup_pairs,
        flag_frequent_captions,
        low_information_expr,
        phash_decontaminate,
        psnr_verify_pairs,
        with_dhash,
        with_image_quality_stats,
        with_phash,
    )

    df = spark.createDataFrame(
        _precision_fixture(), "image_id long, bytes binary, caption string"
    )
    q1 = (
        with_image_quality_stats(df)
        .withColumn("low_information", low_information_expr())
        .filter(F.col("low_information") == F.lit(False))
    )
    q2 = flag_frequent_captions(q1, min_freq=3).filter(
        ~F.col("caption_boilerplate")
    )
    hashed = (
        with_dhash(with_phash(q2))
        .withColumnRenamed("phash_calc", "phash")
        .withColumnRenamed("dhash_calc", "dhash")
    )
    evalset = spark.createDataFrame(
        [(h,) for h in _precision_eval_hashes()], "phash long"
    )
    q3 = phash_decontaminate(hashed, evalset, max_hamming=6)
    pairs = consensus_near_dup_pairs(
        q3.select("image_id", "phash", "dhash"), max_hamming=6, bands=7
    )
    verified = psnr_verify_pairs(
        pairs.select("id_a", "id_b"),
        q3.select("image_id", "bytes"),
        threshold_db=40.0,
    ).filter(F.col("psnr_ok"))
    return verified, q3


def q_precision_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth composed flagship — the round-4 PRECISION-curation chain
    over real decoded bytes, end to end in one plan: low-information
    gate (with_image_quality_stats + low_information_expr; drops
    solids/ramp/placeholder/corrupt) → caption boilerplate cut
    (flag_frequent_captions, min_freq=3) → phash+dhash over survivors →
    eval-set decontamination (phash_decontaminate, guaranteed-recall
    bands) → two-family near-dup candidates (consensus_near_dup_pairs,
    bands=7 so the pigeonhole guarantee makes candidacy EXACT at
    Hamming ≤ 6) → decoded-pixel PSNR verification (psnr_verify_pairs,
    ≥ 40 dB) → min-label connected components → cluster sizes +
    canonical representative. bands=7 everywhere means the DuckDB
    oracle needs NO candidacy clause: it re-derives the whole chain
    from per-image VALUES stats (independent scalar math) + all-pairs
    scalar PSNR + recursive-CTE CC. A green row certifies the round-4
    curation operators COMPOSE, not just pass alone."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments

    verified, q3 = _precision_verified_stage(spark)
    clusters = dedup_cluster_assignments(
        verified.select("id_a", "id_b"), q3, id_col="image_id"
    )
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        clusters.join(F.broadcast(sizes), "cluster")
        .select(
            F.col("image_id").cast("long").alias("image_id"),
            F.col("cluster").cast("long").alias("cluster"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("is_canonical").alias("is_canonical"),
        )
    )


def _precision_curation_values_sql() -> str:
    """Chained oracle for precision_curation: per-image VALUES stats
    from the independent scalar math (_scalar_quality_stats), hashes
    from the shared kernels (hash correctness is proven elsewhere —
    image_features/image_dhash VALUES contracts), ALL-pairs scalar-loop
    PSNR, then the entire gate → cut → decontaminate → consensus →
    verify → CC chain re-derived in pure SQL (recursive CTE for the
    components)."""
    from lightcrawler_spark.imagecodec import decode_image, dhash64, phash64

    decoded, t_rows = {}, []
    for image_id, blob, caption in _precision_fixture():
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            t_rows.append(
                f"({image_id}, '{caption}', NULL, NULL, NULL, NULL, "
                f"NULL, NULL)"
            )
            continue
        decoded[image_id] = arr
        entropy, lap, modal, n, _ = _scalar_quality_stats(arr)
        t_rows.append(
            f"({image_id}, '{caption}', {entropy}, {lap}, {modal}, {n}, "
            f"{phash64(arr)}, {dhash64(arr)})"
        )
    p_rows = []
    ids = sorted(decoded)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            db = _scalar_psnr_db(decoded[a], decoded[b])
            p_rows.append(f"({a}, {b}, {db})")
    ev_rows = ", ".join(f"({h})" for h in _precision_eval_hashes())
    return (
        "WITH RECURSIVE\n"
        "t(image_id, caption, entropy, lap, modal, npx, phash, dhash)"
        " AS (VALUES\n" + ",\n".join(t_rows) + "),\n"
        "p(id_a, id_b, psnr_db) AS (VALUES\n"
        + ",\n".join(p_rows) + "),\n"
        "ev(ephash) AS (VALUES " + ev_rows + "),\n"
        "q1 AS (\n"
        "  SELECT * FROM t\n"
        "  WHERE entropy IS NOT NULL\n"
        "    AND NOT (entropy < 1.0 OR lap < 1.0 OR modal > 0.9 * npx)\n"
        "),\n"
        "n AS (\n"
        "  SELECT image_id, phash, dhash,\n"
        "         regexp_replace(trim(lower(caption)), '\\s+', ' ', 'g')"
        " AS cn\n"
        "  FROM q1\n"
        "),\n"
        "f AS (SELECT cn, count(*) AS c FROM n GROUP BY cn),\n"
        "q2 AS (\n"
        "  SELECT n.image_id, n.phash, n.dhash FROM n\n"
        "  JOIN f USING (cn) WHERE f.c < 3\n"
        "),\n"
        "q3 AS (\n"
        "  SELECT * FROM q2\n"
        "  WHERE NOT EXISTS (SELECT 1 FROM ev\n"
        "    WHERE bit_count(xor(q2.phash, ephash)) <= 6)\n"
        "),\n"
        "cand AS (\n"
        "  SELECT a.image_id AS ia, b.image_id AS ib\n"
        "  FROM q3 a JOIN q3 b ON a.image_id < b.image_id\n"
        "  WHERE bit_count(xor(a.phash, b.phash)) <= 6\n"
        "    AND bit_count(xor(a.dhash, b.dhash)) <= 6\n"
        "),\n"
        "ver AS (\n"
        "  SELECT ia, ib FROM cand\n"
        "  JOIN p ON p.id_a = ia AND p.id_b = ib\n"
        "  WHERE p.psnr_db >= 40.0\n"
        "),\n"
        "sym AS (SELECT ia AS s, ib AS t2 FROM ver\n"
        "        UNION ALL SELECT ib, ia FROM ver),\n"
        "reach(node, comp) AS (\n"
        "  SELECT image_id, image_id FROM q3\n"
        "  UNION\n"
        "  SELECT sym.t2, reach.comp FROM reach\n"
        "  JOIN sym ON sym.s = reach.node\n"
        "),\n"
        "cc AS (SELECT node AS image_id, min(comp) AS cluster\n"
        "       FROM reach GROUP BY node),\n"
        "sz AS (SELECT cluster, count(*) AS cluster_size,\n"
        "              min(image_id) AS rep\n"
        "       FROM cc GROUP BY cluster)\n"
        "SELECT CAST(cc.image_id AS BIGINT) AS image_id,\n"
        "       CAST(cc.cluster AS BIGINT) AS cluster,\n"
        "       CAST(sz.cluster_size AS BIGINT) AS cluster_size,\n"
        "       (cc.image_id = sz.rep) AS is_canonical\n"
        "FROM cc JOIN sz USING (cluster)"
    )


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def q_contrastive_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster-aware training-batch assignment
    (operators/chunking.py:contrastive_batches): no two members of one
    near-dup cluster share a batch — the layout step that keeps
    surviving duplicates from becoming in-batch FALSE NEGATIVES in
    contrastive (CLIP-style) training. Fixture: one 40-row mega-cluster
    (forces n_batches = max_cluster_size = 40 > ceil(300/8) = 38 — the
    feasibility-growth path), 13 mid clusters, 100 NULL singletons.
    Spark runs the distributed prefix sum over the
    (size DESC, key, id) layout; the oracle re-derives rank and modulo
    batch with plain windows."""
    from lightcrawler_spark.operators.chunking import contrastive_batches

    rows = spark.range(300).select(
        F.col("id").alias("image_id"),
        F.when(F.col("id") < 40, F.lit(1000))
        .when(F.col("id") < 200, F.col("id") % 13)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("cluster_id"),
    )
    out = contrastive_batches(
        rows, batch_size=8, id_col="image_id", num_partitions=8
    )
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "cluster_key",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("layout_rank").cast("long").alias("layout_rank"),
        F.col("batch_idx").cast("long").alias("batch_idx"),
    )


def q_crossmodal_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption→image retrieval Recall@K
    (operators/clipscore.py:crossmodal_recall) — the CLIP eval protocol
    over the image+caption pair table: each caption queries ALL images,
    a hit is the caption's OWN image inside its top-K. Captions are
    uniquified with the image_id suffix (the fixture's 6 caption
    templates would otherwise tie). Encoders are the labeled stand-ins;
    the oracle pins image vectors via the shared kernel and genuinely
    re-derives text hashing, all 48×48 exact-int cosines, ranking, and
    the per-K recall. Scale note: eval-slice harness (cross join is
    |eval|²); corpus retrieval goes through the LSH/IVF paths."""
    from lightcrawler_spark.operators.clipscore import crossmodal_recall

    df = _image_df(spark, n=48).withColumn(
        "caption", F.concat_ws(" ", F.col("caption"), F.col("image_id"))
    )
    return crossmodal_recall(df, ks=(1, 3, 5, 10)).select(
        F.col("k").cast("int").alias("k"),
        F.col("n_queries").cast("long").alias("n_queries"),
        F.col("n_hits").cast("long").alias("n_hits"),
        "recall",
    )


def q_jpeg_meta_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG container PII scrub + privacy flags
    (operators/images.py:scrub_jpeg_metadata): real ITU-T T.81 marker
    walk — APP1..15/COM stripped, APP0/coding segments kept, entropy
    data untouched — with EXIF detection and a TIFF IFD0 walk for the
    GPS pointer tag (the location-leak counter). The PNG sibling is
    image_meta_scrub. Fixture covers every verdict path (clean / EXIF /
    EXIF+GPS / XMP / COM / all / corrupt / PNG passthrough / NULL);
    the oracle re-derives each verdict with an independent
    index-arithmetic parser. One Arrow pass, no shuffle."""
    from lightcrawler_spark.operators.images import scrub_jpeg_metadata

    rows = [
        (i, bytearray(b) if b is not None else None)
        for i, b in _jpeg_scrub_fixture()
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = scrub_jpeg_metadata(df)
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.md5(F.col("bytes_clean")).alias("clean_md5"),
        F.col("meta_segments_removed").cast("int").alias("n_removed"),
        F.col("meta_bytes_removed").cast("long").alias("bytes_removed"),
        "had_exif", "had_gps", "had_xmp",
    )


def q_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mix with repeats
    (operators/sampling.py:epoch_mix): per-stratum row targets met by
    whole-epoch replication plus an md5-uniform fractional epoch,
    capped at max_epochs=3 (the Muennighoff 2023 repeat ceiling) — the
    upsampling dual of lang_rebalance. One codegen'd projection with a
    row-local sequence explode; the oracle re-derives counts, caps,
    rates, the hash decision and the fan-out relationally."""
    from lightcrawler_spark.operators.sampling import epoch_mix

    docs = _t(spark, sf_dir, "documents")
    out = epoch_mix(
        docs.select("doc_id", "lang"),
        {"en": 900, "zh": 350, "es": 120},
        max_epochs=3,
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("n_repeats").cast("int").alias("n_repeats"),
        F.col("epoch").cast("int").alias("epoch"),
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive READ side (operators/warc.py:parse_warc_segment):
    assemble records (warc_records keep_record=True), concatenate them
    into 4 segments (ordered collect_list fold — segment assembly is
    writer-bounded), then parse the segment BYTES back: header fields,
    byte offsets, Content-Length byte slicing (multi-byte payloads),
    payload digests. The oracle never sees the parser — it re-derives
    every expected field relationally from the documents table (record
    text rebuild + per-segment running sum), so a hash match proves
    write→read round-trip fidelity."""
    from lightcrawler_spark.operators.warc import (
        parse_warc_segment,
        warc_records,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("text").alias("payload"),
    )
    recs = warc_records(pages, keep_record=True).withColumn(
        "seg_id", (F.col("doc_id") % 4).cast("int")
    )
    segments = recs.groupBy("seg_id").agg(
        F.encode(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "record"))
                    ),
                    lambda x: x["record"],
                ),
                "",
            ),
            "UTF-8",
        ).alias("segment")
    )
    return parse_warc_segment(segments, "segment").select(
        F.col("seg_id").cast("int").alias("seg_id"),
        F.col("rec_seq").cast("int").alias("rec_seq"),
        F.col("rec_offset").cast("long").alias("rec_offset"),
        "warc_type",
        "target_uri",
        "warc_date",
        F.col("content_length").cast("long").alias("content_length"),
        "payload_md5",
        "record_ok",
    )


def q_text_overlay_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-overlay (meme / scanned-text) screen
    (operators/images.py:with_text_overlay_stats + text_overlay_expr):
    per-row sharp-transition counts over exact 0..765 gray, rows with
    >= max(6, w//8) transitions are text-like, verdict = text-like
    fraction >= 35% by exact cross-multiplication. Heuristic stand-in
    for an OCR/text-spotter, honestly labeled; plumbing (one Arrow
    pass + JVM verdict) is the production shape. Fixture covers banded
    text, photo gradient, solid, noise (documented false positive),
    sparse band, tiny-width edge, corrupt, NULL; oracle recomputes
    every stat with scalar loops."""
    from lightcrawler_spark.operators.images import (
        text_overlay_expr,
        with_text_overlay_stats,
    )

    df = spark.createDataFrame(
        _text_overlay_fixture_images(), "image_id string, bytes binary"
    )
    out = with_text_overlay_stats(df).withColumn(
        "text_heavy", text_overlay_expr(0.35)
    )
    return out.select(
        "image_id",
        F.col("txt_n_rows").cast("long").alias("txt_n_rows"),
        F.col("txt_text_rows").cast("long").alias("txt_text_rows"),
        F.col("txt_max_row_trans").cast("long").alias("txt_max_row_trans"),
        F.col("txt_total_trans").cast("long").alias("txt_total_trans"),
        "text_heavy",
    )


def q_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc politeness compliance audit
    (operators/scheduler.py:politeness_audit): one groupBy over a
    crawl trace → per (round, host) fetch counts vs budget (default +
    broadcast per-host override dim), ``exceeded`` flags any
    violation. Synthetic 10-round trace where counts straddle the
    budget and one host carries an override; the oracle re-derives
    counts, coalesced budgets and verdicts relationally. The
    zero-violations property on REAL engine runs is pinned in
    tests/test_politeness_audit.py."""
    from lightcrawler_spark.operators.scheduler import politeness_audit

    trace = spark.range(600).select(
        F.floor(F.col("id") / 60).alias("round"),
        F.concat(
            F.lit("http://h"), ((F.col("id") * 7) % 9).cast("string"),
            F.lit(".test/p/"), F.col("id").cast("string"),
        ).alias("url"),
    )
    overrides = spark.createDataFrame(
        [("h0.test", 10)], "host string, host_budget int"
    )
    return politeness_audit(
        trace, per_host_budget=6, host_budgets=overrides
    ).select(
        F.col("round").cast("long").alias("round"),
        "host",
        F.col("n_fetches").cast("long").alias("n_fetches"),
        F.col("budget").cast("long").alias("budget"),
        "exceeded",
    )


def q_sequence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence document span map
    (operators/chunking.py:sequence_spans) — the block-diagonal
    attention-mask / provenance index over packed sequences: for every
    training sequence, which documents occupy it at which [begin, end)
    token offsets, with doc_span_idx numbering a long document's
    pieces. Distributed prefix sum + one row-local explode over covered
    sequences; the oracle re-derives the serial running sum and the
    fan-out with UNNEST(range(...))."""
    from lightcrawler_spark.operators.chunking import sequence_spans

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim("text"), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("n_tokens"),
    )
    out = sequence_spans(toks, ctx_len=32)
    return out.select(
        F.col("seq_idx").cast("long").alias("seq_idx"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("begin").cast("long").alias("span_begin"),
        F.col("end").cast("long").alias("span_end"),
        F.col("doc_span_idx").cast("long").alias("doc_span_idx"),
    )


def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup telemetry
    (operators/textdedup.py:dedup_report): cluster-size histogram +
    exact removal fractions over the SAME assignment chain as
    dedup_clusters (jaccard pairs → CC) — the summary a curation run
    publishes and the banding-tuning signal (a fat mega-cluster tail =
    under-splitting). Two map-side aggregates; the oracle extends the
    recursive-CC CTE with the histogram."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.textdedup import dedup_report

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(
        docs, k=8, threshold=0.1, block_cols=["lang"]
    )
    return dedup_report(
        dedup_cluster_assignments(pairs, docs)
    ).select(
        "cluster_size", "n_clusters", "n_rows", "removed_rows",
        "removed_frac",
    )


def q_epoch_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order
    (operators/chunking.py:epoch_shard_order) — the WebDataset
    two-level shuffle: shard visit order and within-shard sample order
    both from md5(key‖epoch‖salt) ranks, reproducible on resume with
    no RNG state. Within-shard window bounded by the shard cap; the
    shard-rank window runs over the distinct shard list only. Oracle
    re-derives both rank levels with the same md5 expressions."""
    from lightcrawler_spark.operators.chunking import epoch_shard_order

    t = spark.range(500).select(
        F.col("id").alias("image_id"),
        F.floor(F.col("id") / 50).cast("long").alias("shard_idx"),
    )
    out = epoch_shard_order(t, epoch=2)
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("shard_idx").cast("long").alias("shard_idx"),
        F.col("sample_order").cast("long").alias("sample_order"),
        F.col("shard_order").cast("long").alias("shard_order"),
        F.col("epoch").cast("int").alias("epoch"),
    )


def _bpe_fixture_texts() -> list[str]:
    """Shared corpus for the bpe_train contract: the classic Sennrich
    suffix family plus repetition skew so merge order is non-trivial
    (construction shared; the merge ALGORITHM is implemented twice —
    the Spark loop vs the scalar dict loop in _bpe_train_values_sql)."""
    base = [
        "low lower lowest", "low low lower", "new newer newest",
        "newer the widest wide", "the low news", "wide wider widest",
        "lowest newest slowest", "slow slower slowest", "the the low",
    ]
    return [base[i % len(base)] for i in range(45)]


def _bpe_train_scalar(texts: list[str], n_merges: int) -> list[tuple]:
    """Independent scalar BPE (plain dicts and index loops, no Spark,
    no shared code with the operator's fold)."""
    import re as _re

    freqs: dict[str, int] = {}
    for t in texts:
        for w in _re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab: dict[tuple, int] = {}
    for w, f in freqs.items():
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for i in range(n_merges):
        pc: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + f
        if not pc:
            break
        (a, b), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((i, a, b, cnt, a + b))
        nv: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            k = tuple(out)
            nv[k] = nv.get(k, 0) + f
        vocab = nv
    return merges


def _bpe_train_values_sql() -> str:
    rows = [
        f"({i}, '{a}', '{b}', {cnt}, '{ab}')"
        for i, a, b, cnt, ab in _bpe_train_scalar(_bpe_fixture_texts(), 8)
    ]
    return (
        "SELECT CAST(merge_idx AS INT) AS merge_idx, left_, right_, "
        "CAST(pair_count AS BIGINT) AS pair_count, new_symbol "
        "FROM (VALUES\n" + ",\n".join(rows) + "\n) AS t("
        "merge_idx, left_, right_, pair_count, new_symbol)"
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer training (operators/text.py:bpe_train) — the
    iterative merge loop run end to end: per iteration a map-side
    pair-count groupBy over the VOCABULARY (not the corpus), an O(1)
    driver argmax, and a row-local (out, carry) fold applying the
    merge left-to-right non-overlapping; localCheckpoint caps lineage
    like k-means. The oracle is an independent scalar dict-loop BPE
    over the shared fixture — 8 merge decisions (pair identity, count,
    order) must match exactly."""
    from lightcrawler_spark.operators.text import bpe_train

    df = spark.createDataFrame(
        [(t,) for t in _bpe_fixture_texts()], "text string"
    )
    out = bpe_train(df, n_merges=8)
    return out.select(
        "merge_idx",
        F.col("left").alias("left_"),
        F.col("right").alias("right_"),
        "pair_count",
        "new_symbol",
    )


def _trim_fixture_clips() -> list[tuple[int, bytes | None]]:
    """Shared fixture for the audio_trim contract: every verdict path
    of the silence trim (threshold 256). Construction shared (same
    make_wav_bytes serializer both sides); the TRIM decision is
    re-derived independently in _audio_trim_values_sql."""
    import numpy as np

    from lightcrawler_spark.operators.audio import make_wav_bytes

    def sq(n, amp, period=8):
        t = np.arange(n)
        return (amp * np.where((t // period) % 2 == 0, 1, -1)).astype(
            "<i2"
        )

    z = lambda n: np.zeros(n, dtype="<i2")  # noqa: E731
    cat = np.concatenate
    return [
        (0, make_wav_bytes(cat([z(100), sq(500, 8000), z(50)]), 8000)),
        (1, make_wav_bytes(z(200), 8000)),                  # all silent
        (2, make_wav_bytes(sq(300, 12000), 16000)),         # no padding
        (3, make_wav_bytes(sq(240, 200), 8000)),            # sub-threshold
        (4, make_wav_bytes(cat([z(10), sq(64, 257), z(5)]), 8000)),
        (5, b"RIFFnope"),                                   # corrupt
        (6, None),
    ]


def _audio_trim_values_sql() -> str:
    """Independent scalar trim over the shared clips: plain index loops
    find the first/last |s| > 256 sample, the trimmed blob is
    re-serialized and digested."""
    import hashlib

    import numpy as np

    from lightcrawler_spark.operators.audio import (
        make_wav_bytes,
        parse_wav,
    )

    vals = []
    for cid, blob in _trim_fixture_clips():
        meta = parse_wav(bytes(blob)) if blob is not None else None
        if meta is None:
            vals.append(f"({cid}, NULL, NULL, NULL, NULL)")
            continue
        off, nf = meta["data_off"], meta["n_frames"]
        samples = [
            int.from_bytes(bytes(blob)[off + 2 * i:off + 2 * i + 2],
                           "little", signed=True)
            for i in range(nf)
        ]
        lo, hi = 0, 0
        idx = [i for i, s in enumerate(samples) if abs(s) > 256]
        if idx:
            lo, hi = idx[0], idx[-1] + 1
        trimmed = make_wav_bytes(
            np.array(samples[lo:hi], dtype="<i2"), meta["sample_rate"]
        )
        md5h = hashlib.md5(trimmed).hexdigest()
        vals.append(
            f"({cid}, '{md5h}', {lo}, {len(samples) - hi}, {hi - lo})"
        )
    return (
        "SELECT CAST(clip_id AS BIGINT) AS clip_id, trimmed_md5,\n"
        "  CAST(trim_start AS BIGINT) AS trim_start,\n"
        "  CAST(trim_end_cut AS BIGINT) AS trim_end_cut,\n"
        "  CAST(n_samples_out AS BIGINT) AS n_samples_out\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "clip_id, trimmed_md5, trim_start, trim_end_cut, n_samples_out)"
    )


def q_audio_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading/trailing silence trim
    (operators/audio.py:trim_silence) — the first pass of speech/audio
    curation: cut to the [first, last] |s| > 256 span of channel 0,
    re-emit mono WAV. Fixture covers padded, all-silent, unpadded,
    sub-threshold, boundary-amplitude, corrupt and NULL clips; the
    oracle re-derives each verdict with scalar index loops. One Arrow
    pass, no shuffle."""
    from lightcrawler_spark.operators.audio import trim_silence

    rows = [
        (cid, bytearray(b) if b is not None else None)
        for cid, b in _trim_fixture_clips()
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    out = trim_silence(df, threshold=256)
    return out.select(
        F.col("clip_id").cast("long").alias("clip_id"),
        F.md5(F.col("bytes_trimmed")).alias("trimmed_md5"),
        F.col("trim_start").cast("long").alias("trim_start"),
        F.col("trim_end_cut").cast("long").alias("trim_end_cut"),
        F.col("n_samples_out").cast("long").alias("n_samples_out"),
    )


def _orientation_fixture() -> list[tuple[int, bytes | None, int | None]]:
    """Shared fixture for image_orientation: 8 distinct PNGs carrying
    orientations 1..8, plus NULL orientation (EXIF default = upright),
    invalid orientation 9, and a corrupt blob."""
    from lightcrawler_spark.fixtures import make_images

    pngs = [r["bytes"] for r in make_images(22) if r["fmt"] == "png"]
    rows = [(i, pngs[i], i + 1) for i in range(8)]
    rows.append((8, pngs[8], None))
    rows.append((9, pngs[9], 9))
    rows.append((10, b"\x89PNGnope", 3))
    return rows


def _orientation_values_sql() -> str:
    """Oracle for image_orientation: every transform re-derived with
    EXPLICIT INDEX FORMULAS in scalar loops (not numpy slicing — the
    kernel's formulation), re-encoded with the shared codec and
    digested."""
    import hashlib

    import numpy as np

    from lightcrawler_spark.imagecodec import decode_image, encode_image

    def orient(arr, o):
        h, w = arr.shape[0], arr.shape[1]
        H, W = (h, w) if o in (1, 2, 3, 4) else (w, h)
        out = np.zeros((H, W, 3), dtype=np.uint8)
        for y in range(H):
            for x in range(W):
                if o == 1:
                    s = arr[y][x]
                elif o == 2:
                    s = arr[y][w - 1 - x]
                elif o == 3:
                    s = arr[h - 1 - y][w - 1 - x]
                elif o == 4:
                    s = arr[h - 1 - y][x]
                elif o == 5:
                    s = arr[x][y]
                elif o == 6:
                    s = arr[h - 1 - x][y]
                elif o == 7:
                    s = arr[h - 1 - x][w - 1 - y]
                else:
                    s = arr[x][w - 1 - y]
                out[y][x] = s
        return out
    vals = []
    for i, blob, o in _orientation_fixture():
        eff = 1 if o is None else o
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            arr = None
        if arr is None or eff not in range(1, 9):
            vals.append(f"({i}, NULL, NULL, NULL, NULL)")
            continue
        out = orient(arr, eff)
        md5h = hashlib.md5(encode_image(out, "png")).hexdigest()
        vals.append(
            f"({i}, '{md5h}', {out.shape[1]}, {out.shape[0]}, "
            f"{'true' if eff >= 5 else 'false'})"
        )
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id, oriented_md5,\n"
        "  CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,\n"
        "  was_rotated\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "image_id, oriented_md5, out_w, out_h, was_rotated)"
    )


def q_image_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF orientation applied to pixels
    (operators/images.py:normalize_orientation) — the normalization a
    dedup/hash pass needs first (a camera-rotated duplicate phashes
    differently until upright). All 8 TIFF/EXIF transforms + NULL
    (default upright), invalid value and corrupt blob; the oracle
    re-derives every pixel with explicit index formulas (the kernel
    uses numpy slicing — two independent formulations of the same
    spec). One Arrow pass, no shuffle."""
    from lightcrawler_spark.operators.images import normalize_orientation

    rows = [
        (i, bytearray(b) if b is not None else None, o)
        for i, b, o in _orientation_fixture()
    ]
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, orientation int"
    )
    out = normalize_orientation(df)
    return out.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.md5(F.col("bytes_oriented")).alias("oriented_md5"),
        F.col("out_w").cast("int").alias("out_w"),
        F.col("out_h").cast("int").alias("out_h"),
        "was_rotated",
    )


def q_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-writer shard diff
    (operators/chunking.py:manifest_diff): two shard manifests of the
    same corpus — v1 with 5 extra tail samples, v2 with one sample's
    size changed — full-outer joined into added/removed/changed/
    unchanged statuses, the plan that lets a rebuild rewrite only
    moved shards. The oracle re-derives BOTH manifests (running sums,
    ordered-signature md5s) and the status relationally."""
    from lightcrawler_spark.operators.chunking import (
        assign_shards,
        manifest_diff,
        shard_manifest,
    )

    base = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("image_id"),
        (F.col("n_chars") * 7 + 100).cast("long").alias("n_bytes"),
    )
    extras = spark.range(5).select(
        (F.col("id") + 9_000_000).alias("image_id"),
        F.lit(200_000).cast("long").alias("n_bytes"),
    )
    v1 = base.unionByName(extras)
    v2 = base.withColumn(
        "n_bytes",
        F.col("n_bytes")
        + F.when(F.col("image_id") == 3, F.lit(50)).otherwise(F.lit(0)),
    ).unionByName(
        spark.range(4).select(
            (F.col("id") + 9_500_000).alias("image_id"),
            F.lit(400_000).cast("long").alias("n_bytes"),
        )
    )

    def man(df):
        return shard_manifest(
            assign_shards(df, shard_bytes=500_000,
                          order_col="image_id", size_col="n_bytes")
        )

    out = manifest_diff(man(v1), man(v2))
    return out.select(
        F.col("shard_idx").cast("long").alias("shard_idx"),
        "status", "old_md5", "new_md5",
        F.col("old_samples").cast("long").alias("old_samples"),
        F.col("new_samples").cast("long").alias("new_samples"),
    )


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partition
    (operators/text.py:ccnet_buckets): corpus unigram-LM scores →
    milli-nat integer score → two EXACT radix-select cut points →
    tie-inclusive tertile labels. The oracle re-derives the LM math
    (micro-nat integer sums), the score mapping, both thresholds via
    descending cumulative windows, and the labels."""
    from lightcrawler_spark.operators.text import ccnet_buckets

    docs = _t(spark, sf_dir, "documents")
    return ccnet_buckets(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_logprob",
        F.col("ppl_score").cast("long").alias("ppl_score"),
        "bucket",
    )


def _speech_chain_values_sql() -> str:
    """Oracle for speech_pipeline: the whole trim → integer-ratio
    resample → feature chain re-derived with scalar index loops over
    the shared clips (no numpy, no operator code)."""
    import hashlib

    from lightcrawler_spark.operators.audio import parse_wav

    vals = []
    for cid, blob in _trim_fixture_clips():
        meta = parse_wav(bytes(blob)) if blob is not None else None
        if meta is None:
            vals.append(
                f"({cid}, NULL, NULL, false, NULL, NULL, NULL, NULL)"
            )
            continue
        off, nf = meta["data_off"], meta["n_frames"]
        raw = bytes(blob)
        samples = [
            int.from_bytes(raw[off + 2 * i:off + 2 * i + 2],
                           "little", signed=True)
            for i in range(nf)
        ]
        idx = [i for i, s in enumerate(samples) if abs(s) > 256]
        lo, hi = (idx[0], idx[-1] + 1) if idx else (0, 0)
        trimmed = samples[lo:hi]
        ratio = meta["sample_rate"] // 4000
        if len(trimmed) == 0:
            vals.append(
                f"({cid}, {lo}, 0, false, NULL, NULL, NULL, NULL)"
            )
            continue
        n_out = max(len(trimmed) * 4000 // meta["sample_rate"], 1)
        res = [trimmed[min(k * ratio, len(trimmed) - 1)]
               for k in range(n_out)]
        peak = max(abs(s) for s in res)
        ssq = sum(s * s for s in res)
        zc = sum(
            1 for a, b in zip(res, res[1:])
            if (a > 0 > b) or (a < 0 < b)
        )
        nz = sum(1 for s in res if s == 0)
        vals.append(
            f"({cid}, {lo}, {len(trimmed)}, true, {n_out}, {peak}, "
            f"{ssq}, {zc + 0})"
        )
        _ = hashlib  # (digests covered by the audio_trim contract)
    return (
        "SELECT CAST(clip_id AS BIGINT) AS clip_id,\n"
        "  CAST(trim_start AS BIGINT) AS trim_start,\n"
        "  CAST(n_trimmed AS BIGINT) AS n_trimmed,\n"
        "  ok,\n"
        "  CAST(out_frames AS BIGINT) AS out_frames,\n"
        "  CAST(peak AS BIGINT) AS peak,\n"
        "  CAST(sum_sq AS BIGINT) AS sum_sq,\n"
        "  CAST(zero_crossings AS BIGINT) AS zero_crossings\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "clip_id, trim_start, n_trimmed, ok, out_frames, peak, sum_sq, "
        "zero_crossings)"
    )


def q_speech_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth composed flagship — the SPEECH-curation chain in one plan:
    silence trim (operators/audio.py:trim_silence) → integer-ratio
    linear resample to 4 kHz (resample_audio; 2:1 and 4:1 land exactly
    on input samples) → exact-integer features (audio_features_udf).
    Certifies the audio subsystem's composition the way
    curation_pipeline certifies the image chain; the oracle re-derives
    trim indices, the decimation and every feature with scalar loops
    over the shared clips. Three Arrow passes, zero shuffle."""
    from lightcrawler_spark.operators.audio import (
        audio_features_udf,
        resample_audio,
        trim_silence,
    )

    rows = [
        (cid, bytearray(b) if b is not None else None)
        for cid, b in _trim_fixture_clips()
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    trimmed = trim_silence(df, threshold=256)
    res = resample_audio(
        trimmed.withColumnRenamed("bytes", "bytes_orig")
        .withColumnRenamed("bytes_trimmed", "bytes"),
        out_rate=4000,
    )
    feat = res.withColumn("_f", audio_features_udf(F.col("bytes_resampled")))
    return feat.select(
        F.col("clip_id").cast("long").alias("clip_id"),
        F.col("trim_start").cast("long").alias("trim_start"),
        F.col("n_samples_out").cast("long").alias("n_trimmed"),
        F.coalesce(F.col("_f.ok"), F.lit(False)).alias("ok"),
        F.col("out_frames").cast("long").alias("out_frames"),
        F.col("_f.peak").cast("long").alias("peak"),
        F.col("_f.sum_sq").cast("long").alias("sum_sq"),
        F.col("_f.zero_crossings").cast("long").alias("zero_crossings"),
    )


def _privacy_fixture() -> list[tuple[int, bytes, int]]:
    """Shared fixture for privacy_pipeline: 8 upright PNGs with an
    injected tEXt metadata chunk (the PII the scrub must remove), plus
    a camera-rotated duplicate of each (pixels stored under the
    inverse transform, orientation tag 6) — after scrub → orient, the
    duplicate must phash IDENTICALLY to its upright sibling."""
    import numpy as np

    from lightcrawler_spark.fixtures import make_image_array
    from lightcrawler_spark.imagecodec import (
        encode_image,
        make_png_text_chunk,
    )
    from lightcrawler_spark.operators.images import _ORIENT_OPS

    def with_text(png: bytes, note: bytes) -> bytes:
        # insert the tEXt chunk right after IHDR (8-byte sig + 25-byte
        # IHDR chunk)
        cut = 8 + 25
        return png[:cut] + make_png_text_chunk(b"GPS", note) + png[cut:]

    rows = []
    for i in range(8):
        base = make_image_array(100 + i, 32, 24)
        upright = encode_image(base.astype(np.uint8), "png")
        # stored-rotated sibling: applying orientation 6 must recover
        # the upright pixels -> store the INVERSE (orientation 8) view
        stored = np.ascontiguousarray(_ORIENT_OPS[8](base)).astype(
            np.uint8
        )
        rotated = encode_image(stored, "png")
        note = f"lat=1.{i};lon=2.{i}".encode()
        rows.append((i * 2, with_text(upright, note), 1))
        rows.append((i * 2 + 1, with_text(rotated, note), 6))
    return rows


def _privacy_values_sql() -> str:
    """Oracle for privacy_pipeline: scrub chunk-walk + orientation
    re-derived with independent index arithmetic; phash via the shared
    kernel (the hash-identity check is the chain's OUTPUT, the chain
    logic is what is re-derived)."""
    from lightcrawler_spark.imagecodec import decode_image, phash64

    vals = []
    for i, blob, o in _privacy_fixture():
        # independent scrub: walk chunks by index arithmetic, drop tEXt
        pos, kept, removed = 8, [blob[:8]], 0
        while pos + 8 <= len(blob):
            ln = int.from_bytes(blob[pos:pos + 4], "big")
            tag = blob[pos + 4:pos + 8]
            end = pos + 12 + ln
            if tag in (b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"):
                removed += 1
            else:
                kept.append(blob[pos:end])
            pos = end
        clean = b"".join(kept)
        arr = decode_image(clean)
        if o == 6:  # independent index-formula rotation (90 CW)
            h, w = arr.shape[0], arr.shape[1]
            import numpy as np

            out = np.zeros((w, h, 3), dtype=arr.dtype)
            for y in range(w):
                for x in range(h):
                    out[y][x] = arr[h - 1 - x][y]
            arr = out
        vals.append(
            f"({i}, {removed}, {'true' if o >= 5 else 'false'}, "
            f"{phash64(arr)})"
        )
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id,\n"
        "  CAST(chunks_removed AS INT) AS chunks_removed,\n"
        "  was_rotated,\n"
        "  CAST(phash AS BIGINT) AS phash\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t("
        "image_id, chunks_removed, was_rotated, phash)"
    )


def q_privacy_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh composed flagship — the image PRIVACY/NORMALIZATION
    chain in one plan: PNG metadata scrub (GPS tEXt removed, pixels
    bit-identical) → EXIF orientation applied → phash. The chain's
    theorem: a camera-rotated duplicate carries different bytes,
    different metadata and different raw phash, yet after the chain
    its phash EQUALS its upright sibling's (asserted per-pair in
    tests/test_images.py; the contract pins every scrub count,
    rotation flag and final hash). Three Arrow passes, zero shuffle."""
    from lightcrawler_spark.operators.images import (
        normalize_orientation,
        scrub_image_metadata,
        with_phash,
    )

    rows = [
        (i, bytearray(b), o) for i, b, o in _privacy_fixture()
    ]
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, orientation int"
    )
    scrubbed = scrub_image_metadata(df).select(
        "image_id", "orientation",
        F.col("meta_chunks_removed").alias("chunks_removed"),
        F.col("bytes_clean").alias("bytes"),
    )
    oriented = normalize_orientation(scrubbed)
    hashed = with_phash(
        oriented.withColumnRenamed("bytes", "bytes_raw")
        .withColumnRenamed("bytes_oriented", "bytes")
    )
    return hashed.select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("chunks_removed").cast("int").alias("chunks_removed"),
        "was_rotated",
        F.col("phash_calc").cast("long").alias("phash"),
    )


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet stats (operators/text.py:corpus_datasheet) —
    the quantitative half of a release datasheet (Gebru et al. 2021):
    corpus totals + per-language + per-source document/token/char/empty
    counts from ONE grouping-sets (cube) aggregate over a single scan.
    Exact integers; the oracle re-derives the three sections as plain
    GROUP BYs unioned."""
    from lightcrawler_spark.operators.text import corpus_datasheet

    docs = _t(spark, sf_dir, "documents")
    return corpus_datasheet(docs).select(
        "metric",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_empty").cast("long").alias("n_empty"),
    )




def _watermark_fixture_images() -> list:
    """Shared fixture for the watermark_gate contract: 10 images
    exercising every verdict path of the two-arm watermark screen.
    CONSTRUCTION is shared between the Spark query and the VALUES
    oracle; the band statistics are implemented twice, independently
    (vectorized numpy in watermark_stats_udf vs scalar index loops in
    _scalar_watermark_stats), and the verdict twice (codegen'd Column
    vs SQL CASE), so a kernel bug cannot cancel out."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(encode_image(a.astype(np.uint8), "png"))

    # horizontal ramp: gray varies only with x, so the bottom band and
    # the rest have IDENTICAL per-column content -> all arms false
    ramp = np.repeat(
        (np.arange(24) * 10)[None, :, None], 24, axis=0
    ).repeat(3, axis=2)
    # text-overlay archetype: ramp + alternating stripes in the band
    text_band = ramp.copy()
    text_band[20:] = (255 * (np.arange(24) % 2))[None, :, None]
    # banner archetype: ramp + solid white strip
    banner = ramp.copy()
    banner[20:] = 255
    noise = np.random.default_rng(77).integers(0, 256, size=(24, 24, 3))
    solid = np.full((24, 24, 3), 128)
    checker = np.where(
        ((np.arange(24)[:, None] + np.arange(24)[None, :]) % 2 == 0),
        255, 0
    )[..., None].repeat(3, axis=2)
    tiny = np.random.default_rng(78).integers(0, 256, size=(4, 8, 3))
    one_row = np.repeat(
        (np.arange(8) * 30)[None, :, None], 1, axis=0
    ).repeat(3, axis=2)
    return [
        (0, enc(ramp)),
        (1, enc(text_band)),
        (2, enc(banner)),
        (3, enc(noise)),
        (4, enc(solid)),
        (5, bytearray(b"notanimage")),
        (6, None),
        (7, enc(tiny)),
        (8, enc(one_row)),
        (9, enc(checker)),
    ]


def q_watermark_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-band screen (operators/images.py:with_watermark_stats
    + watermark_expr): exact-int64 transition counts and gray sums for
    the bottom 1/5 band vs the rest, verdict JVM-side over two arms
    (busy text/logo band; smooth bright/dark banner strip). Fixture
    paths: clean horizontal ramp (False), stripe-overlay band (True,
    busy arm), solid white banner (True, banner arm), seeded noise
    (False, band no busier than rest), solid (False), corrupt/NULL
    (NULL verdict), 4-row tiny (1-row band), 1-row image (no rest ->
    False), checkerboard (False, equal busyness). Oracle: same fixture,
    independent scalar-loop statistics, verdict re-derived in SQL with
    the same cross-multiplied integer arithmetic."""
    from lightcrawler_spark.operators.images import (
        watermark_expr,
        with_watermark_stats,
    )

    df = spark.createDataFrame(
        _watermark_fixture_images(), "image_id long, bytes binary"
    )
    return (
        with_watermark_stats(df)
        .withColumn("watermark_likely", watermark_expr())
        .select(
            F.col("image_id").cast("long").alias("image_id"),
            F.col("wm_band_trans").cast("long").alias("wm_band_trans"),
            F.col("wm_band_px").cast("long").alias("wm_band_px"),
            F.col("wm_rest_trans").cast("long").alias("wm_rest_trans"),
            F.col("wm_rest_px").cast("long").alias("wm_rest_px"),
            F.col("wm_band_sum").cast("long").alias("wm_band_sum"),
            F.col("wm_rest_sum").cast("long").alias("wm_rest_sum"),
            "watermark_likely",
        )
    )


def _scalar_watermark_stats(arr):
    """Scalar-index-loop reimplementation of the watermark band
    statistics — deliberately NOT the vectorized numpy math of
    watermark_stats_udf (sequential loops, explicit band split), so
    oracle and kernel cannot share a bug. Returns the six int64
    signals (band_trans, band_px, rest_trans, rest_px, band_sum,
    rest_sum)."""
    from lightcrawler_spark.operators.images import (
        _TXT_DIFF_THRESH,
        _WM_BAND_DEN,
    )

    h, w = arr.shape[0], arr.shape[1]
    gray = [
        [int(arr[y][x][0]) + int(arr[y][x][1]) + int(arr[y][x][2])
         for x in range(w)]
        for y in range(h)
    ]
    band_h = max(1, h // _WM_BAND_DEN)
    band_rows = range(h - band_h, h)
    rest_rows = range(0, h - band_h)

    def region(rows):
        trans = px = total = 0
        for y in rows:
            for x in range(w):
                px += 1
                total += gray[y][x]
                if x + 1 < w and abs(gray[y][x + 1] - gray[y][x]) >= _TXT_DIFF_THRESH:
                    trans += 1
        return trans, px, total

    bt, bp, bs = region(band_rows)
    rt, rp, rs = region(rest_rows)
    return bt, bp, rt, rp, bs, rs


def _watermark_values_sql() -> str:
    """Independent scalar-loop statistics over the SHARED fixture; the
    two-arm verdict is re-derived in SQL with the same exact
    cross-multiplied int64 comparisons as watermark_expr's defaults."""
    from lightcrawler_spark.imagecodec import decode_image

    rows = []
    for image_id, blob in _watermark_fixture_images():
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            rows.append(f"({image_id}, NULL, NULL, NULL, NULL, NULL, NULL)")
            continue
        bt, bp, rt, rp, bs, rs = _scalar_watermark_stats(arr)
        rows.append(f"({image_id}, {bt}, {bp}, {rt}, {rp}, {bs}, {rs})")
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id,\n"
        "       CAST(bt AS BIGINT) AS wm_band_trans,\n"
        "       CAST(bp AS BIGINT) AS wm_band_px,\n"
        "       CAST(rt AS BIGINT) AS wm_rest_trans,\n"
        "       CAST(rp AS BIGINT) AS wm_rest_px,\n"
        "       CAST(bs AS BIGINT) AS wm_band_sum,\n"
        "       CAST(rs AS BIGINT) AS wm_rest_sum,\n"
        "       CASE WHEN bp IS NULL THEN NULL\n"
        "            ELSE rp > 0 AND (\n"
        "              (bt * 100 > 8 * bp AND bt * rp > 3 * rt * bp)\n"
        "              OR (bt * 100 <= 2 * bp\n"
        "                  AND abs(bs * rp - rs * bp) > 48 * bp * rp)\n"
        "            )\n"
        "       END AS watermark_likely\n"
        "FROM (VALUES\n" + ",\n".join(rows)
        + "\n) AS t(image_id, bt, bp, rt, rp, bs, rs)"
    )


def _rot_fixture_images() -> list:
    """Shared fixture for the rot_invariant_hash contract: two
    spectrum-rich seeded 24x32 'photographs', each with D4-transformed
    re-posts (rot90, mirror, rot180 — pixels transformed, re-encoded
    lossless, EXIF-free), plus corrupt and NULL blobs. The d4-min keys
    of a variant group must coincide EXACTLY: {phash(T(S(img)))} over
    T in D4 is the same SET as {phash(T(img))} by group closure, so
    min-over-group is invariant no matter how the hash itself behaves
    under rotation."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(
            encode_image(np.ascontiguousarray(a).astype(np.uint8), "png")
        )

    base0 = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    base1 = np.random.default_rng(501).integers(0, 256, size=(24, 32, 3))
    return [
        (0, enc(base0)),
        (1, enc(np.rot90(base0))),          # 90 CCW re-post
        (2, enc(base0[:, ::-1])),           # mirrored re-post
        (3, enc(base1)),
        (4, enc(base1[::-1, ::-1])),        # 180 re-post
        (5, bytearray(b"notanimage")),
        (6, None),
    ]


def q_rot_invariant_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation/flip-invariant dedup keys
    (operators/images.py:with_rot_invariant_hashes): least signed-int64
    phash64/dhash64 over the 8 dihedral transforms, making the key
    identical for EXIF-stripped rotated/mirrored re-posts (ids 0-2 and
    3-4 collapse to one key each — the invariance the plain hashes
    lack). Oracle: per-transform hashes computed driver-side with
    INDEPENDENT scalar index-formula transforms (not numpy slicing)
    feeding the shared base-hash kernels (themselves pinned by the
    image_dhash / image_dedup_clusters VALUES contracts), min re-derived
    in SQL via LEAST over the 8 per-transform columns."""
    from lightcrawler_spark.operators.images import with_rot_invariant_hashes

    df = spark.createDataFrame(
        _rot_fixture_images(), "image_id long, bytes binary"
    )
    return with_rot_invariant_hashes(df).select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("phash_d4").cast("long").alias("phash_d4"),
        F.col("dhash_d4").cast("long").alias("dhash_d4"),
    )


def _scalar_d4_transforms(arr):
    """The 8 dihedral transforms via explicit scalar index FORMULAS
    (out[i][j] = in[...]) — deliberately not _ORIENT_OPS' numpy
    slicing, so the oracle certifies the transform table independently.
    Yields numpy arrays in EXIF-orientation order 1..8."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]

    def build(oh, ow, f):
        return np.array(
            [[arr[f(i, j)] for j in range(ow)] for i in range(oh)],
            dtype=np.uint8,
        )

    yield build(h, w, lambda i, j: (i, j))                    # 1
    yield build(h, w, lambda i, j: (i, w - 1 - j))            # 2 mirror H
    yield build(h, w, lambda i, j: (h - 1 - i, w - 1 - j))    # 3 rot180
    yield build(h, w, lambda i, j: (h - 1 - i, j))            # 4 mirror V
    yield build(w, h, lambda i, j: (j, i))                    # 5 transpose
    yield build(w, h, lambda i, j: (h - 1 - j, i))            # 6 rot90 CW
    yield build(w, h, lambda i, j: (h - 1 - j, w - 1 - i))    # 7 transverse
    yield build(w, h, lambda i, j: (j, w - 1 - i))            # 8 rot270 CW


def _rot_invariant_values_sql() -> str:
    """Per-transform phash/dhash pairs over the SHARED fixture blobs
    (independent scalar transforms + the VALUES-pinned base kernels);
    the canonical d4-min is re-derived entirely in SQL."""
    from lightcrawler_spark.imagecodec import decode_image, dhash64, phash64

    rows = []
    for image_id, blob in _rot_fixture_images():
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            rows.append(f"({image_id}, " + ", ".join(["NULL"] * 16) + ")")
            continue
        vals = []
        for t in _scalar_d4_transforms(arr):
            vals.append(str(phash64(t)))
            vals.append(str(dhash64(t)))
        rows.append(f"({image_id}, " + ", ".join(vals) + ")")
    cols = ", ".join(f"p{k}, d{k}" for k in range(8))
    pl = ", ".join(f"p{k}" for k in range(8))
    dl = ", ".join(f"d{k}" for k in range(8))
    return (
        "SELECT CAST(image_id AS BIGINT) AS image_id,\n"
        f"       CAST(LEAST({pl}) AS BIGINT) AS phash_d4,\n"
        f"       CAST(LEAST({dl}) AS BIGINT) AS dhash_d4\n"
        "FROM (VALUES\n" + ",\n".join(rows)
        + f"\n) AS t(image_id, {cols})"
    )


def q_crawl_golden_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-GET revisits end-to-end (spec.conditional_get, RFC
    9110 §13 over the P7 revisit path): revisit rows carry the last
    committed page's validators (ETag → If-None-Match, Last-Modified →
    If-Modified-Since), an unchanged page answers 304 Not Modified with
    no body and no re-extraction, a validator-less page refetches in
    full. Both validator arms fire in the fixture (statuses [200, 304]
    for the ETag and Last-Modified pages, [200, 200] for the bare one).
    Engine trace vs the reference-semantics simulator (VALUES-literal
    oracle)."""
    from lightcrawler_spark.fixtures import (
        conditional_spec,
        make_conditional_webgraph,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = conditional_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_conditional_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_conditional_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        conditional_spec,
        make_conditional_webgraph,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(
        make_conditional_webgraph(), conditional_spec()
    )
    return _golden_values_sql(golden)


def q_byte_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandwidth-politeness budget dim (operators/scheduler.py:
    byte_budgets): per-host (n, sum_bytes) sufficient statistics over a
    synthetic pages projection of the documents table (one host per
    source, every 7th row a 0-byte failure), then budget =
    clamp(floor(byte_budget·n / sum_bytes), 1, max) in EXACT int64 —
    the bytes analog of latency_budgets. Oracle re-derives the
    aggregate and the integer-division clamp relationally."""
    from lightcrawler_spark.operators.scheduler import byte_budgets

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    pages = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".test")).alias("host"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(0))
        .otherwise(F.length("text")).cast("long").alias("bytes_received"),
    )
    return byte_budgets(
        pages, byte_budget=50_000, default_budget=8, max_budget=8
    ).select(
        "host",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("sum_bytes").cast("long").alias("sum_bytes"),
        F.col("host_budget").cast("long").alias("host_budget"),
    )


def q_crawl_golden_bytebudget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandwidth politeness end-to-end (spec.host_byte_budget): the
    heavy host's observed ~2 KB mean page size collapses its per-round
    budget to 1 (3000·n // sum) while the light host keeps the full
    budget — engine trace vs the reference-semantics simulator
    (VALUES-literal oracle)."""
    from lightcrawler_spark.fixtures import (
        bytebudget_spec,
        make_bytebudget_webgraph,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = bytebudget_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_bytebudget_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_bytebudget_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        bytebudget_spec,
        make_bytebudget_webgraph,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(
        make_bytebudget_webgraph(), bytebudget_spec()
    )
    return _golden_values_sql(golden)


def _rot_dedup_fixture() -> list:
    """Shared fixture for the rot_dedup_pipeline contract: group A =
    base + rot90 + mirror re-posts (longest caption on the rot90 copy),
    group B = base + rot180 with EQUAL-length captions (tie → lowest
    id), one singleton, one corrupt blob, one NULL blob. Returns
    (image_id, blob, caption)."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(
            encode_image(np.ascontiguousarray(a).astype(np.uint8), "png")
        )

    base0 = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    base1 = np.random.default_rng(501).integers(0, 256, size=(24, 32, 3))
    single = np.random.default_rng(502).integers(0, 256, size=(24, 32, 3))
    return [
        (0, enc(base0), "short"),
        (1, enc(np.rot90(base0)), "a much longer descriptive caption"),
        (2, enc(base0[:, ::-1]), "mid caption"),
        (3, enc(base1), "caption x"),
        (4, enc(base1[::-1, ::-1]), "caption y"),
        (5, enc(single), None),
        (6, bytearray(b"notanimage"), "corrupt"),
        (7, None, "null blob"),
    ]


def q_rot_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rot/mirror-invariant dedup with keep-best-caption
    canonicalization (operators/images.py:rot_invariant_dedup): d4-min
    key pair → exact groupBy → longest-caption representative (ties to
    lowest id) via one max_by partial aggregate, corrupt/NULL blobs
    routed as singletons. Fixture: ids 0-2 collapse to one group (rep =
    1, longest caption), ids 3-4 tie on length (rep = 3), 5 is a
    NULL-captioned singleton kept, 6/7 are corrupt/NULL singletons
    kept. Oracle: independent scalar transforms + VALUES per-transform
    hashes, key/group/argmax re-derived relationally."""
    from lightcrawler_spark.operators.images import rot_invariant_dedup

    df = spark.createDataFrame(
        _rot_dedup_fixture(), "image_id long, bytes binary, caption string"
    )
    return rot_invariant_dedup(df).select(
        F.col("image_id").cast("long").alias("image_id"),
        "dup_key",
        F.col("group_size").cast("long").alias("group_size"),
        F.col("rep_id").cast("long").alias("rep_id"),
        "is_kept",
        "caption",
    )


def _rot_dedup_values_sql() -> str:
    """Per-transform hashes over the SHARED fixture blobs (independent
    scalar index-formula transforms + the VALUES-pinned base kernels);
    dup_key, group size, longest-caption argmax and keep flags are all
    re-derived relationally in SQL."""
    from lightcrawler_spark.imagecodec import decode_image, dhash64, phash64

    rows = []
    for image_id, blob, caption in _rot_dedup_fixture():
        cap = "NULL" if caption is None else "'" + caption + "'"
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            rows.append(
                f"({image_id}, {cap}, " + ", ".join(["NULL"] * 16) + ")"
            )
            continue
        vals = []
        for t in _scalar_d4_transforms(arr):
            vals.append(str(phash64(t)))
            vals.append(str(dhash64(t)))
        rows.append(f"({image_id}, {cap}, " + ", ".join(vals) + ")")
    cols = ", ".join(f"p{k}, d{k}" for k in range(8))
    pl = ", ".join(f"p{k}" for k in range(8))
    dl = ", ".join(f"d{k}" for k in range(8))
    return f"""
WITH t(image_id, caption, {cols}) AS (VALUES
{",".join(rows)}
),
keyed AS (
  SELECT image_id, caption,
    CASE WHEN LEAST({pl}) IS NULL
         THEN 's:' || CAST(image_id AS VARCHAR)
         ELSE 'k:' || CAST(LEAST({pl}) AS VARCHAR)
              || ':' || CAST(LEAST({dl}) AS VARCHAR)
    END AS dup_key
  FROM t
),
groups AS (
  SELECT dup_key, COUNT(*)::BIGINT AS group_size,
    FIRST(image_id ORDER BY COALESCE(length(caption), -1) DESC,
          image_id ASC) AS rep_id
  FROM keyed GROUP BY dup_key
)
SELECT CAST(k.image_id AS BIGINT) AS image_id, k.dup_key,
       g.group_size, CAST(g.rep_id AS BIGINT) AS rep_id,
       k.image_id = g.rep_id AS is_kept, k.caption
FROM keyed k JOIN groups g USING (dup_key)
"""


def q_warc_not_modified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-recrawl WARC assembly
    (operators/warc.py:warc_not_modified_records) — 304 trace rows
    become WARC/1.1 revisit records with the server-not-modified
    profile, referencing the PRIOR capture's digest from the archive
    index (the 304 carries no payload to digest); non-304 rows stay
    full responses; a 304 whose URL has no prior digest surfaces as
    nm_orphan with an empty response record. Synthetic trace: every
    5th document answers 304; the prior index covers doc_id ≥ 50, so
    304s below 50 exercise the orphan path. Oracle re-assembles every
    record form and re-runs the serial offset sum."""
    from lightcrawler_spark.operators.warc import warc_not_modified_records

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/doc/"), F.col("doc_id").cast("string"))
    trace = docs.select(
        "doc_id", url.alias("url"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text")).alias("payload"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(304))
        .otherwise(F.lit(200)).alias("status"),
    )
    prior = docs.filter(F.col("doc_id") >= 50).select(
        url.alias("url"),
        F.md5(F.concat(F.col("text"), F.lit("prior"))).alias("prior_md5"),
    )
    return warc_not_modified_records(trace, prior).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "record_type", "nm_orphan", "content_length", "record_length",
        "record_md5", "warc_offset",
    )


def q_sitemap_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lastmod-driven recrawl selection
    (operators/sitemap.py:sitemap_refetch): sitemap entries vs stored
    fetch times, freshness decided by LEXICOGRAPHIC comparison of
    normalized W3C datetime strings (date-only padded to T00:00:00Z,
    malformed → NULL) — no timestamp parsing, so the verdict is
    bit-identical across engines. Paths: never-fetched, modified
    (lastmod > fetch), fresh (lastmod ≤ fetch), lastmod absent or
    garbage (→ wait for the age scheduler). Oracle re-derives the
    normalization and the join relationally."""
    from lightcrawler_spark.operators.sitemap import sitemap_refetch

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = F.concat(F.lit("http://s"), (F.col("doc_id") % 7).cast("string"),
                   F.lit(".test/p/"), F.col("doc_id").cast("string"))
    mm = F.concat(F.lit("2024-0"), ((F.col("doc_id") % 9) + 1).cast("string"))
    # %5==1 exercises the r5 canonicalization battery: garbage,
    # minute precision, fractional seconds, naive full precision —
    # all must normalize to the comparable 'THH:MM:SSZ' form (or NULL)
    odd = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("not-a-date"))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(mm, F.lit("-15T0"),
                       (F.col("doc_id") % 10).cast("string"), F.lit(":30Z")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(mm, F.lit("-15T0"),
                       (F.col("doc_id") % 10).cast("string"),
                       F.lit(":30:45.25Z")))
        .otherwise(
            F.concat(mm, F.lit("-15T0"),
                     (F.col("doc_id") % 10).cast("string"), F.lit(":30:00")))
    )
    entries = docs.select(
        url.alias("loc"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 5 == 1, odd)
        .when(F.col("doc_id") % 5 == 2, F.concat(mm, F.lit("-15")))
        .otherwise(
            F.concat(mm, F.lit("-15T0"), (F.col("doc_id") % 10).cast("string"),
                     F.lit(":30:00Z"))
        ).alias("lastmod"),
    )
    pages = docs.filter(F.col("doc_id") % 3 != 0).select(
        url.alias("url"),
        F.concat(F.lit("2024-0"), ((F.col("doc_id") % 4) + 3).cast("string"),
                 F.lit("-01T00:00:00Z")).alias("fetched_at"),
    )
    return sitemap_refetch(entries, pages).select(
        "loc", "lastmod_norm", "fetched_norm", "refetch_reason",
        "needs_refetch",
    )


def q_crawl_golden_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier TTL end-to-end (spec.frontier_ttl_rounds): fresh
    pending rows whose packed insertion round (insert_seq >> 40) is
    more than ttl rounds old expire before the pending anti-join —
    frontier hygiene at 10^10 scale with no new state (resume-safe by
    construction). Budget-1 fixture: d0..d3 fetch, d4/d5 age out.
    Engine trace vs the reference-semantics simulator (VALUES-literal
    oracle)."""
    from lightcrawler_spark.fixtures import (
        make_ttl_webgraph,
        ttl_spec,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = ttl_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_ttl_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_ttl_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        make_ttl_webgraph,
        simulate_reference_crawl,
        ttl_spec,
    )

    golden = simulate_reference_crawl(make_ttl_webgraph(), ttl_spec())
    return _golden_values_sql(golden)


def q_host_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl health report
    (operators/scheduler.py:host_crawl_report): status-class counts
    (2xx/304/3xx/4xx/5xx/dead/throttle), bytes, attempts, and a
    milli-precision integer-division latency mean from one map-side-
    combined groupBy(host) over a synthetic trace projection of the
    events table. Oracle re-derives every conditional sum and the DIV
    mean relationally."""
    from lightcrawler_spark.operators.scheduler import host_crawl_report

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    trace = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 6).cast("string"),
                 F.lit(".test")).alias("host"),
        F.element_at(
            F.array(
                F.lit(200), F.lit(200), F.lit(200), F.lit(304),
                F.lit(301), F.lit(404), F.lit(503), F.lit(0),
            ),
            ((F.col("event_id") % 8) + 1).cast("int"),
        ).alias("status"),
        (F.col("event_id") % 5000).cast("long").alias("bytes_received"),
        ((F.col("event_id") % 900) + 1).cast("long").alias("latency_ms"),
        ((F.col("event_id") % 3) + 1).cast("long").alias("n_attempts"),
    )
    return host_crawl_report(trace).select(
        "host", "n_fetches", "n_ok", "n_not_modified", "n_redirect",
        "n_client_err", "n_server_err", "n_dead", "n_throttled",
        "total_bytes", "total_attempts", "sum_latency_ms",
        "n_latency_obs", "mean_latency_mu",
    )


def _rot_near_fixture() -> list:
    """Shared fixture for the rot_near_dup contract: two content groups
    whose re-posts are ROTATED RE-ENCODES (±16 pixel noise on top of a
    dihedral transform — near-dups whose d4-min keys NO LONGER
    coincide, so exact-key dedup misses them and alignment search is
    required), one unrelated image, corrupt + NULL blobs."""
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def enc(a):
        return bytearray(
            encode_image(
                np.clip(np.ascontiguousarray(a), 0, 255).astype(np.uint8),
                "png",
            )
        )

    base0 = np.random.default_rng(600).integers(0, 256, size=(24, 32, 3))
    base1 = np.random.default_rng(601).integers(0, 256, size=(24, 32, 3))

    def noisy(a, seed):
        # ±16: empirically past the point where the d4-MIN keys still
        # coincide (they survive ±8 on this fixture), while the aligned
        # phash distance stays ~2 — the regime this operator exists for
        return a.astype(np.int64) + np.random.default_rng(seed).integers(
            -16, 17, size=a.shape
        )

    return [
        (0, enc(base0)),
        (1, enc(noisy(np.rot90(base0), 700))),
        (2, enc(noisy(base0[:, ::-1], 701))),
        (3, enc(base1)),
        (4, enc(noisy(base1[::-1, ::-1], 702))),
        (5, bytearray(b"notanimage")),
        (6, None),
    ]


def q_rot_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation-aware NEAR-dup pairs
    (operators/images.py:rot_near_dup_pairs): min-over-alignment phash
    distance of the lower-id side, candidates from banding all 8
    per-transform hashes against identity hashes — bands=7 makes
    candidacy pigeonhole-EXACT at max_hamming=6, so the DuckDB oracle
    is the straight all-pairs min-over-transform popcount with NO
    candidacy clause. Fixture: rotated re-ENCODES (±1 noise on top of
    the transform) that exact d4-key dedup cannot merge."""
    from lightcrawler_spark.operators.images import rot_near_dup_pairs

    df = spark.createDataFrame(
        _rot_near_fixture(), "image_id long, bytes binary"
    )
    return rot_near_dup_pairs(df).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("rot_hamming").cast("int").alias("rot_hamming"),
        F.col("best_transform").cast("int").alias("best_transform"),
    )


def _rot_near_values_sql() -> str:
    """All-pairs oracle with independent scalar transforms feeding the
    VALUES-pinned phash kernel; min-over-alignment and the 1-based
    first-occurrence argmin re-derived relationally."""
    from lightcrawler_spark.imagecodec import decode_image, phash64

    rows = []
    for image_id, blob in _rot_near_fixture():
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            continue  # null-hash rows generate no pairs
        vals = [str(phash64(t)) for t in _scalar_d4_transforms(arr)]
        rows.append(f"({image_id}, " + ", ".join(vals) + ")")
    pl = ", ".join(f"p{k}" for k in range(8))
    dcols = ", ".join(
        f"bit_count(xor(a.p{k}, b.p0)) AS d{k}" for k in range(8)
    )
    dl = ", ".join(f"d{k}" for k in range(8))
    best = " ".join(
        f"WHEN d{k} = m THEN {k + 1}" for k in range(8)
    )
    return f"""
WITH t(image_id, {pl}) AS (VALUES
{",".join(rows)}
),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b, {dcols}
  FROM t a JOIN t b ON a.image_id < b.image_id
),
m AS (
  SELECT id_a, id_b, {dl}, LEAST({dl}) AS m FROM pairs
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
  CAST(m AS INT) AS rot_hamming,
  CAST(CASE {best} END AS INT) AS best_transform
FROM m WHERE m <= 6
"""


def q_rot_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation-aware near-dup CLUSTERS: rot_near_dup_pairs (banded
    min-over-alignment candidates, exact at bands=7) → min-label
    connected components (operators/graph.py) → per-image cluster +
    canonical flag. The composition that turns aligned pair evidence
    into a dedup decision; corrupt/NULL blobs stay singleton clusters.
    Oracle: all-pairs min-over-transform popcount (no candidacy
    clause) + recursive-CTE closure."""
    from lightcrawler_spark.operators.graph import dedup_cluster_assignments
    from lightcrawler_spark.operators.images import rot_near_dup_pairs

    df = spark.createDataFrame(
        _rot_near_fixture(), "image_id long, bytes binary"
    )
    pairs = rot_near_dup_pairs(df)
    return dedup_cluster_assignments(
        pairs, df, id_col="image_id"
    ).select(
        F.col("image_id").cast("long").alias("image_id"),
        F.col("cluster").cast("long").alias("cluster"),
        "is_canonical",
    )


def _rot_clusters_values_sql() -> str:
    from lightcrawler_spark.imagecodec import decode_image, phash64

    rows = []
    all_ids = []
    for image_id, blob in _rot_near_fixture():
        all_ids.append(str(image_id))
        try:
            arr = decode_image(bytes(blob))
        except Exception:
            continue
        vals = [str(phash64(t)) for t in _scalar_d4_transforms(arr)]
        rows.append(f"({image_id}, " + ", ".join(vals) + ")")
    pl = ", ".join(f"p{k}" for k in range(8))
    dl = ", ".join(
        f"bit_count(xor(a.p{k}, b.p0))" for k in range(8)
    )
    ids = ", ".join(f"({i})" for i in all_ids)
    return f"""
WITH RECURSIVE
t(image_id, {pl}) AS (VALUES
{",".join(rows)}
),
n(image_id) AS (VALUES {ids}),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM t a JOIN t b ON a.image_id < b.image_id
  WHERE LEAST({dl}) <= 6
),
sym AS (
  SELECT id_a AS s, id_b AS t2 FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT image_id, image_id FROM n
  UNION
  SELECT sym.t2, reach.comp FROM reach JOIN sym ON sym.s = reach.node
)
SELECT CAST(node AS BIGINT) AS image_id,
       CAST(min(comp) AS BIGINT) AS cluster,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
"""


def _audio_quality_fixture() -> list:
    """Shared fixture for the audio_quality contract: every defect path
    of the clipping/dropout/DC screens. Returns (clip_id, blob)."""
    import numpy as np

    from lightcrawler_spark.operators.audio import make_wav_bytes

    def wav(samples):
        return bytearray(
            make_wav_bytes(np.asarray(samples, dtype=np.int16), 16000)
        )

    rng = np.random.default_rng(90)
    clean = rng.integers(-8000, 8001, size=2000)
    hard_clip = np.tile([32767, -32768], 1000)
    partial = clean.copy(); partial[500:650] = 32767
    dropout = clean.copy(); dropout[800:2500 - 700] = 0
    dc = np.clip(clean + 5000, -32768, 32767)
    silent = np.zeros(2000)  # > the 1600-frame dropout threshold
    return [
        (0, wav(clean)),
        (1, wav(hard_clip)),
        (2, wav(partial)),
        (3, wav(dropout)),
        (4, wav(dc)),
        (5, wav(silent)),
        (6, bytearray(b"RIFFgarbage")),
        (7, None),
    ]


def q_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio recording-defect screens
    (operators/audio.py:with_audio_quality + audio_defect_expr):
    rail-clipping count and longest rail run, longest exact-zero run
    (digital dropouts), DC-offset sum — all exact int64 over channel 0,
    verdict a codegen'd cross-multiplied expression. Fixture paths:
    clean (keep), hard-clipped everywhere, 150-frame partial clip,
    1000-frame dropout gap, +5000 DC offset, all-silent (one 2000-frame
    zero run → defective), corrupt blob and NULL (aq_ok false → NULL
    verdict).
    Oracle: independent scalar run-length loops over the SHARED sample
    arrays, verdict re-derived in SQL."""
    from lightcrawler_spark.operators.audio import (
        audio_defect_expr,
        with_audio_quality,
    )

    df = spark.createDataFrame(
        _audio_quality_fixture(), "clip_id long, bytes binary"
    )
    return (
        with_audio_quality(df)
        .withColumn("defective", audio_defect_expr())
        .select(
            F.col("clip_id").cast("long").alias("clip_id"),
            "aq_ok", "aq_n_frames", "aq_clip_count", "aq_max_clip_run",
            "aq_max_zero_run", "aq_dc_sum", "defective",
        )
    )


def _scalar_audio_quality(samples) -> tuple:
    """Sequential scalar loops (explicit run counters, no numpy) —
    deliberately NOT the vectorized mask/run-length math of
    audio_quality_udf, so oracle and kernel cannot share a bug."""
    n = len(samples)
    clip_count = 0
    max_clip = max_zero = cur_clip = cur_zero = 0
    dc = 0
    for v in samples:
        v = int(v)
        dc += v
        if abs(v) >= 32767:
            clip_count += 1
            cur_clip += 1
            max_clip = max(max_clip, cur_clip)
        else:
            cur_clip = 0
        if v == 0:
            cur_zero += 1
            max_zero = max(max_zero, cur_zero)
        else:
            cur_zero = 0
    return n, clip_count, max_clip, max_zero, dc


def _audio_quality_values_sql() -> str:
    import numpy as np

    from lightcrawler_spark.operators.audio import parse_wav

    rows = []
    for clip_id, blob in _audio_quality_fixture():
        m = parse_wav(bytes(blob) if blob is not None else None)
        if m is None or m["bits"] != 16:
            rows.append(
                f"({clip_id}, false, NULL, NULL, NULL, NULL, NULL)"
            )
            continue
        # decode independently of the kernel's numpy slicing: struct
        # iteration over the data chunk
        import struct as _struct

        raw = bytes(blob)[m["data_off"]:m["data_off"] + m["data_len"]]
        step = 2 * m["channels"]
        samples = [
            _struct.unpack_from("<h", raw, i)[0]
            for i in range(0, len(raw) - step + 1, step)
        ]
        n, cc, mc, mz, dc = _scalar_audio_quality(samples)
        rows.append(f"({clip_id}, true, {n}, {cc}, {mc}, {mz}, {dc})")
    return (
        "SELECT CAST(clip_id AS BIGINT) AS clip_id,\n"
        "       CAST(ok AS BOOLEAN) AS aq_ok,\n"
        "       CAST(n AS BIGINT) AS aq_n_frames,\n"
        "       CAST(cc AS BIGINT) AS aq_clip_count,\n"
        "       CAST(mc AS BIGINT) AS aq_max_clip_run,\n"
        "       CAST(mz AS BIGINT) AS aq_max_zero_run,\n"
        "       CAST(dc AS BIGINT) AS aq_dc_sum,\n"
        "       CASE WHEN NOT ok OR n = 0 THEN NULL\n"
        "            ELSE (cc * 100 > 1 * n)\n"
        "                 OR (mz > 1600)\n"
        "                 OR (abs(dc) * 100 > 5 * 32768 * n)\n"
        "       END AS defective\n"
        "FROM (VALUES\n" + ",\n".join(rows)
        + "\n) AS t(clip_id, ok, n, cc, mc, mz, dc)"
    )


_REFETCH_NOW_UNIX = 1707523200  # 2024-02-10T00:00:00Z, after the events span


def q_refetch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-selection flagship: BOTH freshness signals merged into
    one prioritized refetch set — change-frequency scheduling
    (scheduler.recrawl_schedule, Cho & Garcia-Molina) marks URLs whose
    next_fetch time passed ('age_due', rank 3), the sitemap lastmod
    signal (sitemap.sitemap_refetch) marks publisher-declared changes
    ('modified', rank 1) and never-fetched listings ('never_fetched',
    rank 2); per URL the HIGHEST-priority reason wins via one
    min(struct) partial aggregate (no rank window). URL spaces overlap
    by construction so the argmin does real work. Oracle re-derives
    the whole chain: lag-window change counts → intervals → due set,
    lastmod normalization → verdicts, union → per-URL argmin."""
    from lightcrawler_spark.operators.admission import host_expr
    from lightcrawler_spark.operators.scheduler import recrawl_schedule
    from lightcrawler_spark.operators.sitemap import sitemap_refetch

    ev = _t(spark, sf_dir, "events")
    hist = ev.select(
        F.concat(F.lit("http://recrawl.test/p/"),
                 (F.col("event_id") % 300).cast("string")).alias("url"),
        F.col("ts").alias("fetch_ts"),
        F.md5(F.col("event_type")).alias("content_hash"),
        F.col("event_id").alias("seq"),
    )
    due = recrawl_schedule(hist, seq_col="seq").filter(
        F.col("next_fetch_unix") <= F.lit(_REFETCH_NOW_UNIX)
    ).select("url", F.lit("age_due").alias("reason"),
             F.lit(3).alias("reason_rank"))

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = F.concat(F.lit("http://recrawl.test/p/"),
                   F.col("doc_id").cast("string"))
    entries = docs.select(
        url.alias("loc"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("2024-0"), ((F.col("doc_id") % 9) + 1).cast("string"),
                     F.lit("-15")),
        )
        .otherwise(
            F.concat(F.lit("2024-0"), ((F.col("doc_id") % 9) + 1).cast("string"),
                     F.lit("-15T0"), (F.col("doc_id") % 10).cast("string"),
                     F.lit(":30:00Z"))
        ).alias("lastmod"),
    )
    pages = docs.filter(F.col("doc_id") % 3 != 0).select(
        url.alias("url"),
        F.concat(F.lit("2024-0"), ((F.col("doc_id") % 4) + 3).cast("string"),
                 F.lit("-01T00:00:00Z")).alias("fetched_at"),
    )
    sm = sitemap_refetch(entries, pages).filter(
        F.col("needs_refetch")
    ).select(
        F.col("loc").alias("url"),
        F.col("refetch_reason").alias("reason"),
        F.when(F.col("refetch_reason") == "modified", F.lit(1))
        .otherwise(F.lit(2)).alias("reason_rank"),
    )
    merged = due.unionByName(sm).groupBy("url").agg(
        F.min(F.struct("reason_rank", "reason")).alias("_r")
    )
    return merged.select(
        "url",
        host_expr(F.col("url")).alias("host"),
        F.col("_r.reason").alias("reason"),
        F.col("_r.reason_rank").cast("int").alias("reason_rank"),
    )


def q_crawl_golden_hostcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime per-host quotas end-to-end (spec.host_page_cap /
    host_byte_cap — the Heritrix maxDocsPerHost analog): hosts whose
    committed page/byte totals reach the cap drop out of pending for
    good (partial-agg + broadcast anti-join, the cooldown shape;
    BSP overshoot of ≤ one round's budget by design). Byte-cap
    fixture: the ~2 KB-page host caps after its second content page
    while the ~40 B host fetches everything. Engine trace vs the
    reference-semantics simulator (VALUES-literal oracle)."""
    from lightcrawler_spark.fixtures import (
        bytebudget_spec,
        make_bytebudget_webgraph,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = bytebudget_spec(host_byte_budget=0, host_byte_cap=3000,
                           host_page_cap=5)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_bytebudget_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_hostcap_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        bytebudget_spec,
        make_bytebudget_webgraph,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(
        make_bytebudget_webgraph(),
        bytebudget_spec(host_byte_budget=0, host_byte_cap=3000,
                        host_page_cap=5),
    )
    return _golden_values_sql(golden)


def q_keyword_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category keyword screen (operators/text.py:keyword_screen): the
    LAION-style list cut as pure JVM regexp_count per category
    (word-boundary, case-insensitive, escaped literals — the list is
    config, the mechanism is the operator). Captions synthesized from
    documents with injected hits: every 7th gets a stock-site
    attribution (twice, mixed case), every 11th a placeholder phrase,
    every 13th 'NSFW'; word-boundary honesty pinned by a 'shutterstocky'
    non-hit suffix on every 5th. Oracle re-counts via
    len(regexp_extract_all) with an equivalently word-bounded RE2
    pattern (the operator anchors per keyword EDGE so non-word-edged
    keywords like 'c++' still match; for these all-word-edged lists
    the two forms are identical)."""
    from lightcrawler_spark.operators.text import keyword_screen

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    cap = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" shutterstocky"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" photo by ShutterStock via shutterstock"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" No Image Available"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" NSFW"))
        .otherwise(F.lit("")),
    )
    df = docs.select("doc_id", cap.alias("caption"))
    return keyword_screen(df).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "caption", "kw_nsfw", "kw_placeholder", "kw_stock_site",
        "kw_flagged",
    )


def q_crawl_golden_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-INTERACTION golden: conditional-GET revisits, byte-
    derived per-host budgets, frontier TTL and lifetime page quotas all
    ON in one crawl over the heavy/light host web (ETags on the heavy
    host's details). The dims interact — budgets shape which rounds
    revisits land in, quotas end hosts, TTL ages what the budgets
    delayed — and the trace must still match the reference-semantics
    simulator pop for pop (VALUES-literal oracle). Composition is
    where politeness bugs hide; this row certifies the four features
    compose exactly."""
    from lightcrawler_spark.fixtures import (
        combined_spec,
        make_combined_webgraph,
        webgraph_df,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = combined_spec()
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(
            webgraph_df(spark, make_combined_webgraph()), spec
        ),
    )
    return _run_engine_trace(spark, engine)


def _golden_combined_values_sql() -> str:
    from lightcrawler_spark.fixtures import (
        combined_spec,
        make_combined_webgraph,
        simulate_reference_crawl,
    )

    golden = simulate_reference_crawl(
        make_combined_webgraph(), combined_spec()
    )
    return _golden_values_sql(golden)


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full query registry in stable topical grouping order (crawl →
    content → curation → multimodal → archive). queries() reorders it for
    the driver's snapshot window — add new entries HERE."""
    return {
        "crawl_bfs": crawl_bfs,
        "canonicalize_resolve": q_canonicalize_resolve,
        "frontier_dedup_anti": q_frontier_dedup_anti,
        "priority_pop": q_priority_pop,
        "admission_filter": q_admission_filter,
        "robots_filter": q_robots_filter,
        "politeness_rounds": q_politeness_rounds,
        "per_host_rounds": q_per_host_rounds,
        "crawl_delay_budgets": q_crawl_delay_budgets,
        "backoff_blocked": q_backoff_blocked,
        "pagination": q_pagination,
        "status_report": q_status_report,
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "image_caption_filter": q_image_caption_filter,
        "image_dedup_clusters": q_image_dedup_clusters,
        "pii_scrub": q_pii_scrub,
        "repetition_stats": q_repetition_stats,
        "decontaminate": q_decontaminate,
        "training_mix_sample": q_training_mix_sample,
        "lang_rebalance": q_lang_rebalance,
        "vocab_topk": q_vocab_topk,
        "dup_span_mask": q_dup_span_mask,
        "clip_score_filter": q_clip_score_filter,
        "corpus_pipeline": q_corpus_pipeline,
        "line_dedup": q_line_dedup,
        "domain_cap": q_domain_cap,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_fingerprint,
        "embedding_topk": q_embedding_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_lsh": q_embedding_lsh,
        "embedding_ivf": q_embedding_ivf,
        "publish_time_normalize": q_publish_time,
        "doc_no_normalize": q_doc_no_normalize,
        "title_guess": q_title_guess,
        "t_valid_rule": q_t_valid_rule,
        "negs_extract": q_negs_extract,
        "attachment_harvest": q_attachment_harvest,
        "attachment_type": q_attachment_type,
        "index_block": q_index_block,
        "title_similarity": q_title_similarity,
        "product_dedup": q_product_dedup,
        "cookie_lookup": q_cookie_lookup,
        "cookie_harvest": q_cookie_harvest,
        "send_data": q_send_data,
        "requeue_list": q_requeue_list,
        "format_url": q_format_url,
        "handler_route": q_handler_route,
        "extraction_gate": q_extraction_gate,
        "index_sink": q_index_sink,
        "doc_text_extract": q_doc_text_extract,
        "crawl_golden_fixture": q_crawl_golden_fixture,
        "crawl_golden_redirects": q_crawl_golden_redirects,
        "image_caption_assembly": q_image_caption_assembly,
        "simhash_docs": q_simhash_docs,
        "image_verify": q_image_verify,
        "bloom_prefilter": q_bloom_prefilter,
        "cuckoo_prefilter": q_cuckoo_prefilter,
        "content_extract": q_content_extract,
        "summary_fields": q_summary_fields,
        "image_resize": q_image_resize,
        "image_features": q_image_features,
        "video_frame_sample": q_video_frame_sample,
        "audio_meta": q_audio_meta,
        "audio_features": q_audio_features,
        "audio_resample": q_audio_resample,
        "doc_chunk": q_doc_chunk,
        "sequence_pack": q_sequence_pack,
        "link_pagerank": q_link_pagerank,
        "minhash_dedup": q_minhash_dedup,
        "bm25_rank": q_bm25_rank,
        "ann_recall": q_ann_recall,
        "dedup_recall": q_dedup_recall,
        "shard_assign": q_shard_assign,
        "aspect_bucket_batches": q_aspect_bucket_batches,
        "image_augment": q_image_augment,
        "semantic_dedup": q_semantic_dedup,
        "anchor_text_agg": q_anchor_text_agg,
        "recrawl_schedule": q_recrawl_schedule,
        "sitemap_parse": q_sitemap_parse,
        "unigram_logprob": q_unigram_logprob,
        "robots_sitemaps": q_robots_sitemaps,
        "tfidf_keywords": q_tfidf_keywords,
        "aspect_bucket": q_aspect_bucket,
        "url_traps": q_url_traps,
        "host_shard": q_host_shard,
        "mime_sniff": q_mime_sniff,
        "warc_export": q_warc_export,
        "domain_gate": q_domain_gate,
        "image_dhash": q_image_dhash,
        "cdx_index": q_cdx_index,
        "dust_normalize": q_dust_normalize,
        "snapshot_diff": q_snapshot_diff,
        "robots_longest_match": q_robots_longest_match,
        "boilerplate_lines": q_boilerplate_lines,
        "budget_apportion": q_budget_apportion,
        "bpe_pairs": q_bpe_pairs,
        "image_letterbox": q_image_letterbox,
        "latency_budgets": q_latency_budgets,
        "embedding_quantize": q_embedding_quantize,
        "param_relevance": q_param_relevance,
        "canonical_alias": q_canonical_alias,
        "quantized_topk": q_quantized_topk,
        "warc_revisit": q_warc_revisit,
        "image_meta_scrub": q_image_meta_scrub,
        "cdc_chunks": q_cdc_chunks,
        "archive_pipeline": q_archive_pipeline,
        "dataset_split": q_dataset_split,
        "image_consensus": q_image_consensus,
        "phash_guaranteed_recall": q_phash_guaranteed_recall,
        "frontier_age": q_frontier_age,
        "raw_replay": q_raw_replay,
        "cluster_representatives": q_cluster_representatives,
        "hard_negative_mine": q_hard_negative_mine,
        "shard_manifest": q_shard_manifest,
        "pagerank_priority": q_pagerank_priority,
        "curation_pipeline": q_curation_pipeline,
        "quality_quantile_gate": q_quality_quantile_gate,
        "image_decontaminate": q_image_decontaminate,
        "caption_boilerplate": q_caption_boilerplate,
        "psnr_verify": q_psnr_verify,
        "image_quality_gate": q_image_quality_gate,
        "precision_curation": q_precision_curation,
        # NOTE: append new entries at the END — the driver-window
        # rotation in queries() treats higher registry position as
        # "newer" when prioritizing never-checked entries
        "kmeans_centroids": q_kmeans_centroids,
        "kmeans_assign": q_kmeans_assign,
        "semantic_dedup_kmeans": q_semantic_dedup_kmeans,
        "ivf_trained": q_ivf_trained,
        "semdedup_block_recall": q_semdedup_block_recall,
        "ivf_recall": q_ivf_recall,
        "kmeans_assign_bcast": q_kmeans_assign_bcast,
        "contrastive_batches": q_contrastive_batches,
        "crossmodal_recall": q_crossmodal_recall,
        "jpeg_meta_scrub": q_jpeg_meta_scrub,
        "crawl_golden_sitemap": q_crawl_golden_sitemap,
        "epoch_mix": q_epoch_mix,
        "warc_roundtrip": q_warc_roundtrip,
        "text_overlay_gate": q_text_overlay_gate,
        "politeness_audit": q_politeness_audit,
        "sequence_spans": q_sequence_spans,
        "dedup_report": q_dedup_report,
        "layout_pipeline": q_layout_pipeline,
        "epoch_shard_order": q_epoch_shard_order,
        "bpe_train": q_bpe_train,
        "audio_trim": q_audio_trim,
        "image_orientation": q_image_orientation,
        "manifest_diff": q_manifest_diff,
        "ccnet_buckets": q_ccnet_buckets,
        "speech_pipeline": q_speech_pipeline,
        "privacy_pipeline": q_privacy_pipeline,
        "corpus_datasheet": q_corpus_datasheet,
        "crawl_golden_revisit": q_crawl_golden_revisit,
        "watermark_gate": q_watermark_gate,
        "rot_invariant_hash": q_rot_invariant_hash,
        "crawl_golden_conditional": q_crawl_golden_conditional,
        "byte_budgets": q_byte_budgets,
        "crawl_golden_bytebudget": q_crawl_golden_bytebudget,
        "rot_dedup_pipeline": q_rot_dedup_pipeline,
        "warc_not_modified": q_warc_not_modified,
        "sitemap_refetch": q_sitemap_refetch,
        "crawl_golden_ttl": q_crawl_golden_ttl,
        "host_report": q_host_report,
        "rot_near_dup": q_rot_near_dup,
        "rot_dedup_clusters": q_rot_dedup_clusters,
        "audio_quality": q_audio_quality,
        "refetch_pipeline": q_refetch_pipeline,
        "crawl_golden_hostcap": q_crawl_golden_hostcap,
        "keyword_screen": q_keyword_screen,
        "crawl_golden_combined": q_crawl_golden_combined,
    }


# Always inside the driver's snapshot window: the composed flagships whose
# green row certifies whole subsystems at once.
_WINDOW_FLAGSHIPS = [
    "crawl_bfs", "corpus_pipeline", "archive_pipeline",
    "crawl_golden_fixture",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry reordered for driver-snapshot coverage (round-4 policy).

    The driver's per-round CORRECTNESS snapshot records only the FIRST
    50 entries of this dict, so dict order IS coverage. Policy: pin the
    flagship composition queries (unless the never-checked backlog
    alone saturates the window — then every slot goes to coverage),
    then pack the window with the LONGEST-UNCHECKED entries —
    never-driver-checked first, then oldest checked round — judged
    against the shipped CORRECTNESS_r*.json artifacts. Deterministic
    given the artifacts; falls back to the registry's stable grouping
    order when none are present.

    Within a tier (same last-checked round, including never-checked),
    NEWEST registry entries go first: a brand-new query has had no
    independent execution at all, while an older never-driver-checked
    one has at least survived prior judge/golden runs.

    A snapshot row whose `err` is non-null (or that red-rowed on any
    match field) does NOT count as checked for that round (r4 verdict
    item 2a): an erroring entry must tier with never-checked so it
    re-enters the window as soon as the error is fixed, instead of
    rotating out for registry_size/50 rounds.
    """
    full = _registry()
    import glob
    import json
    import os
    import re as _re

    last_checked: dict[str, int] = {}
    last_red: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = _re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as fh:
                snapshot = json.load(fh)
        except (OSError, ValueError):
            continue
        for k, row in snapshot.items():
            rnd = int(m.group(1))
            if isinstance(row, dict):
                if row.get("err") is not None or any(
                    row.get(f) is False
                    for f in ("rows_match", "schema_match", "hash_match")
                ):
                    last_red[k] = max(last_red.get(k, 0), rnd)
                    continue
            last_checked[k] = max(last_checked.get(k, 0), rnd)
    if not last_checked:
        return full

    pos = {k: i for i, k in enumerate(full)}
    # Flagship pinning yields to a saturated backlog: when the
    # never-checked tier alone fills the 50-entry window, every pinned
    # slot displaces a query that has NO independent driver execution
    # while the flagships were green in the immediately preceding round
    # (and stay covered by the committed VERIFY artifact) — so pin only
    # while there is slack.
    # a query whose LATEST driver result was red/err tiers with
    # never-checked no matter how many earlier rounds were green —
    # an older green must not keep a fresh regression out of the
    # window (r5 review finding)
    def eff_checked(k: str) -> int:
        lc = last_checked.get(k, -1)
        return -1 if last_red.get(k, -1) > lc else lc

    unchecked = [k for k in full if eff_checked(k) < 0]
    pins = _WINDOW_FLAGSHIPS if len(unchecked) < 50 else []
    rest = [k for k in full if k not in pins]
    # sort: (never-green/red-latest first; within that, red-history
    # entries lead — they have a VISIBLE err/red snapshot row to clear
    # — then newest registry entries), ties by registry position
    rest.sort(key=lambda k: (
        eff_checked(k),
        0 if (eff_checked(k) < 0 and k in last_red) else 1,
        -pos[k],
    ))
    ordered = [k for k in pins if k in full] + rest
    return {k: full[k] for k in ordered}


def _mime_sniff_oracle_sql() -> str:
    """Rebuild the hex window relationally and re-apply the rule battery
    (prefix LIKEs + RE2 regexes) — the rule CONSTANTS are shared with
    operators/mime.py (lockstep by construction), the application is
    independent (LIKE vs startswith, RE2 vs Java regex)."""
    from lightcrawler_spark.operators.mime import MAGIC_RULES

    kind_case = " ".join(
        f"WHEN {j} THEN '{name}'" for j, (name, _) in enumerate(_MIME_KINDS)
    )
    hex_case = " ".join(
        f"WHEN {j} THEN '{p}'" for j, (_, p) in enumerate(_MIME_KINDS)
    )
    magic_whens = "\n    ".join(
        f"WHEN hx LIKE '{p}%' THEN '{m}'" for p, m in MAGIC_RULES
    )
    return f"""
WITH b AS (
  SELECT id,
    CASE CAST(id % {len(_MIME_KINDS)} AS INT) {kind_case} END AS kind,
    CASE CAST(id % {len(_MIME_KINDS)} AS INT) {hex_case} END AS px
  FROM range(480) t(id)
),
h AS (
  SELECT id, kind,
    substr(upper(px || md5(CAST(id AS VARCHAR))), 1, 32) AS hx
  FROM b
)
SELECT CAST(id AS BIGINT) AS id, kind,
  CASE
    {magic_whens}
    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
      THEN 'audio/x-wav'
    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920'
      THEN 'video/x-msvideo'
    WHEN regexp_matches(hx, '^(20|09|0A|0D)*3C') THEN 'text/html'
    WHEN regexp_matches(hx, '^(0[9ACD]|[1-7][0-9A-F])+$') THEN 'text/plain'
    ELSE 'application/octet-stream'
  END AS mime
FROM h
"""


def _robots_lm_oracle_sql() -> str:
    """Rule dim produced by the engine's OWN parser+translator (shared
    constants); the oracle re-applies RFC 9309 precedence independently
    (ORDER BY pattern_len DESC, is_allow DESC LIMIT 1 per URL)."""
    from lightcrawler_spark.operators.admission import (
        parse_robots_rules_extended,
        robots_pattern_regex,
    )

    rows = []
    for host, body in _ROBOTS_LM_FIXTURE:
        for pat, allow in parse_robots_rules_extended(body, "spark-frontier"):
            rows.append(
                f"('{host}', '{robots_pattern_regex(pat)}', {len(pat)}, "
                f"{str(allow).lower()})"
            )
    paths_case = " ".join(
        f"WHEN {j} THEN '{p}'" for j, p in enumerate(_ROBOTS_LM_PATHS)
    )
    return f"""
WITH rules(host, regex, plen, is_allow) AS (VALUES
  {", ".join(rows)}
),
u AS (
  SELECT id, 'http://h' || (id % 4) || '.test'
    || CASE CAST(id % {len(_ROBOTS_LM_PATHS)} AS INT) {paths_case} END AS url
  FROM range(300) t(id)
),
p AS (
  SELECT id, url,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host,
    CASE WHEN regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) = ''
         THEN '/' ELSE regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) END AS path
  FROM u
)
SELECT CAST(p.id AS BIGINT) AS id, p.url,
  coalesce(v.is_allow, true) AS allowed,
  CAST(coalesce(v.plen, -1) AS INT) AS matched_len
FROM p LEFT JOIN LATERAL (
  SELECT r.plen, r.is_allow FROM rules r
  WHERE r.host = p.host AND regexp_matches(p.path, r.regex)
  ORDER BY r.plen DESC, r.is_allow DESC LIMIT 1
) v ON true
"""


def _boilerplate_oracle_sql() -> str:
    """Re-derive line classification + ordered reassembly relationally;
    the stopword list and chrome regex are the shared module constants,
    the application (list ops, string_agg) is independent."""
    from lightcrawler_spark.operators.text import (
        BOILER_LINE_PAT,
        BOILER_STOPWORDS,
    )

    sw = ", ".join(f"'{w}'" for w in BOILER_STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id, text || chr(10) || 'Home | About | Contact'
    || CASE WHEN doc_id % 2 = 0
            THEN chr(10) || 'Copyright 2026 Example Inc' ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN chr(10) || 'the terms of use apply to all of the pages'
            ELSE '' END AS text
  FROM documents WHERE doc_id < 300
),
l AS (
  SELECT doc_id, i - 1 AS pos, ln[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM d),
       LATERAL (SELECT unnest(generate_series(1, len(ln))) AS i) s
),
c AS (
  SELECT doc_id, pos, line,
    len(list_filter(string_split_regex(lower(line), '[^a-z0-9]+'),
        w -> w <> '')) AS nw,
    len(list_filter(string_split_regex(lower(line), '[^a-z0-9]+'),
        w -> w IN ({sw}))) AS sw
  FROM l
),
v AS (
  SELECT doc_id, pos, line,
    (nw < 4 OR sw * 100 < 10 * nw
     OR regexp_matches(line, '{BOILER_LINE_PAT}')) AS boiler
  FROM c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(count(*) AS INT) AS n_lines,
  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS INT) AS n_boiler,
  md5(coalesce(string_agg(CASE WHEN NOT boiler THEN line END,
                          chr(10) ORDER BY pos), '')) AS clean_md5
FROM v GROUP BY doc_id
"""


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
        "per_host_rounds": """
WITH frontier AS (
  SELECT 'h' || (user_id % 25) AS host,
         CAST(event_id AS BIGINT) AS insert_seq,
         CAST(user_id % 3 AS INT) AS priority_level
  FROM events
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY host
           ORDER BY priority_level DESC, insert_seq ASC
         ) AS INT) AS pop_rank
  FROM frontier
),
kept AS (SELECT * FROM ranked WHERE pop_rank <= 4)
SELECT host, insert_seq, pop_rank,
       CAST(row_number() OVER (
         ORDER BY pop_rank ASC, priority_level DESC, insert_seq ASC
       ) AS INT) AS fetch_rank
FROM kept
""",
        "crawl_delay_budgets": """
WITH frontier AS (
  SELECT 'h' || (user_id % 25) AS host,
         CAST(event_id AS BIGINT) AS insert_seq,
         CAST(user_id % 3 AS INT) AS priority_level
  FROM events
),
b(host, hb) AS (
  SELECT * FROM (VALUES ('h0', 1), ('h1', 2), ('h2', 6)) t(host, hb)
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY host
           ORDER BY priority_level DESC, insert_seq ASC
         ) AS INT) AS pop_rank
  FROM frontier
)
SELECT host, insert_seq, pop_rank
FROM ranked LEFT JOIN b USING (host)
WHERE pop_rank <= coalesce(hb, 4)
""",
        "backoff_blocked": """
WITH pages AS (
  SELECT 'h' || (user_id % 25) AS host,
         CAST((event_id % 10) + 1 AS INT) AS round,
         CAST(CASE WHEN event_id % 7 = 0 THEN 429
                   WHEN event_id % 11 = 0 THEN 503
                   ELSE 200 END AS INT) AS status,
         CASE WHEN event_id % 3 = 0
              THEN CAST((event_id % 5) * 7 AS INT) END AS retry_after
  FROM events
),
last AS (
  SELECT host, round, retry_after FROM (
    SELECT host, round, retry_after,
           row_number() OVER (
             PARTITION BY host
             ORDER BY round DESC, retry_after DESC NULLS LAST
           ) AS rn
    FROM pages WHERE status IN (429, 503)
  ) WHERE rn = 1
),
waits AS (
  SELECT host, round,
         CASE WHEN retry_after IS NOT NULL
              THEN CAST(ceil(retry_after / 5.0) AS INT)
              ELSE 2 END AS wait
  FROM last
)
SELECT CAST(probe AS INT) AS check_round, host
FROM waits, (SELECT unnest([8, 11, 14]) AS probe)
WHERE probe <= round + wait
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
        "pii_scrub": r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com via https://ex.test/p?id='
              || CAST(doc_id AS VARCHAR)
              || ' or call +1 (555) 010-'
              || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text
  FROM documents WHERE doc_id < 300
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, 'https?://[^ \t\n\r]+')) AS n_url,
         regexp_replace(text, 'https?://[^ \t\n\r]+', '<URL>', 'g') AS t1
  FROM aug
),
s2 AS (
  SELECT doc_id, n_url,
         len(regexp_extract_all(
             t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(
             t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t2
  FROM s1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_url AS BIGINT) AS n_url,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\- ]{7,}[0-9]'))
            AS BIGINT) AS n_phone,
       regexp_replace(t2, '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g')
         AS text_scrubbed
FROM s2
""",
        "repetition_stats": r"""
WITH aug AS (
  SELECT doc_id,
         text || chr(10) || 'boiler plate nav line'
              || chr(10) || 'boiler plate nav line'
              || CASE WHEN doc_id % 3 = 0
                      THEN chr(10) || 'repeat me' || chr(10) || 'repeat me'
                      ELSE '' END AS text
  FROM documents WHERE doc_id < 300
),
lines AS (
  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                                    x -> len(trim(x)) > 0)) AS line
  FROM aug
),
lgrp AS (
  SELECT doc_id, line, count(*) AS c, len(line) AS l
  FROM lines GROUP BY doc_id, line
),
lstats AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         count(*) AS n_distinct,
         sum(c * l) AS tot_chars,
         sum(CASE WHEN c > 1 THEN c * l ELSE 0 END) AS dup_chars
  FROM lgrp GROUP BY doc_id
),
words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS ws
  FROM aug
),
twc AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS twc
  FROM words
),
g2 AS (
  SELECT doc_id, g, count(*) * (len(g) - 1) AS cover
  FROM (SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                                     i -> array_to_string(ws[i:i+1], ' '))) AS g
        FROM words)
  GROUP BY doc_id, g
),
b2 AS (SELECT doc_id, max(cover) AS best FROM g2 GROUP BY doc_id),
g3 AS (
  SELECT doc_id, g, count(*) * (len(g) - 2) AS cover
  FROM (SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                                     i -> array_to_string(ws[i:i+2], ' '))) AS g
        FROM words)
  GROUP BY doc_id, g
),
b3 AS (SELECT doc_id, max(cover) AS best FROM g3 GROUP BY doc_id)
SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
       round(CASE WHEN coalesce(ls.n_lines, 0) > 0
                  THEN (ls.n_lines - ls.n_distinct) / CAST(ls.n_lines AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_line_frac,
       round(CASE WHEN coalesce(ls.tot_chars, 0) > 0
                  THEN ls.dup_chars / CAST(ls.tot_chars AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_line_char_frac,
       round(CASE WHEN t.twc > 0
                  THEN coalesce(b2.best, 0) / CAST(t.twc AS DOUBLE)
                  ELSE 0.0 END, 6) AS top2gram_char_frac,
       round(CASE WHEN t.twc > 0
                  THEN coalesce(b3.best, 0) / CAST(t.twc AS DOUBLE)
                  ELSE 0.0 END, 6) AS top3gram_char_frac
FROM aug a
LEFT JOIN lstats ls USING (doc_id)
LEFT JOIN twc t USING (doc_id)
LEFT JOIN b2 USING (doc_id)
LEFT JOIN b3 USING (doc_id)
""",
        "decontaminate": """
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
                               i -> array_to_string(ws[i:i+4], ' '))) AS g
  FROM words
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0),
hits AS (
  SELECT doc_id, count(*) AS n
  FROM (SELECT doc_id, g FROM grams WHERE doc_id % 7 <> 0) tr
  JOIN ev USING (g)
  GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_eval_ngram_hits,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 7 <> 0
""",
        "training_mix_sample": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UINT64)
        / 4294967296.0
      < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
                  WHEN 'es' THEN 0.75 ELSE 0.0 END
""",
        "lang_rebalance": """
WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY 1),
m AS (SELECT min(n) AS nmin FROM c),
u AS (
  SELECT doc_id, lang,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::UBIGINT)
      ::DOUBLE / 4294967296.0 AS uu
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, u.lang,
  ROUND(sqrt(nmin / n), 6) AS rebalance_rate,
  ROUND(uu, 9) AS sample_u
FROM u JOIN c ON u.lang = c.lang, m
WHERE uu * uu * n < nmin
""",
        "vocab_topk": """
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            w -> w <> '')) AS tok
  FROM documents
),
c AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY 1),
tot AS (SELECT sum(cnt)::DOUBLE AS n FROM c),
top AS (
  SELECT tok, cnt,
    row_number() OVER (ORDER BY cnt DESC, tok ASC)::BIGINT AS vocab_rank,
    sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ::DOUBLE AS cum
  FROM c ORDER BY cnt DESC, tok ASC LIMIT 25
)
SELECT tok, cnt, vocab_rank, ROUND(cum / n, 6) AS cum_frac FROM top, tot
""",
        "dup_span_mask": r"""
WITH docs AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                w -> w <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos, list_aggr(w[i:i+3], 'string_agg', ' ') AS gram
  FROM docs,
  LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 3, 0))) AS i) s
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, p
  FROM grams g JOIN dup USING (gram),
  LATERAL (SELECT unnest(generate_series(g.pos, g.pos + 3)) AS p) s
),
tokens AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS tok
  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) s
),
clean AS (
  SELECT t.doc_id, string_agg(tok, ' ' ORDER BY t.pos) AS txt
  FROM tokens t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
  WHERE c.p IS NULL GROUP BY 1
),
covn AS (SELECT doc_id, count(*) AS ncov FROM cov GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  len(w)::BIGINT AS n_tokens,
  COALESCE(ncov, 0)::BIGINT AS dup_positions,
  ROUND(CASE WHEN len(w) > 0 THEN COALESCE(ncov, 0) / len(w)::DOUBLE
             ELSE 0.0 END, 6) AS dup_token_fraction,
  COALESCE(txt, '') AS text_masked
FROM docs d LEFT JOIN covn USING (doc_id) LEFT JOIN clean USING (doc_id)
""",
        "corpus_pipeline": r"""
WITH train AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 7 <> 0
),
scrub AS (
  SELECT doc_id, lang, source,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, 'https?://[^ \t\n\r]+', '<URL>', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS text
  FROM train
),
slines AS (
  SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                                    x -> len(trim(x)) > 0)) AS line
  FROM scrub
),
slgrp AS (
  SELECT doc_id, line, count(*) AS c, len(line) AS l
  FROM slines GROUP BY doc_id, line
),
slstats AS (
  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
         sum(CASE WHEN c > 1 THEN c * l ELSE 0 END) AS dup_chars,
         sum(c * l) AS tot_chars
  FROM slgrp GROUP BY doc_id
),
swords AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS ws
  FROM scrub
),
stwc AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS twc
  FROM swords
),
sg2 AS (
  SELECT doc_id, g, count(*) * (len(g) - 1) AS cover
  FROM (SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                                     i -> array_to_string(ws[i:i+1], ' '))) AS g
        FROM swords)
  GROUP BY doc_id, g
),
sb2 AS (SELECT doc_id, max(cover) AS best FROM sg2 GROUP BY doc_id),
rep AS (
  SELECT s.doc_id, s.lang, s.source, s.text
  FROM scrub s
  LEFT JOIN slstats ls USING (doc_id)
  LEFT JOIN stwc t USING (doc_id)
  LEFT JOIN sb2 USING (doc_id)
  WHERE round(CASE WHEN coalesce(ls.n_lines, 0) > 0
                   THEN (ls.n_lines - ls.n_distinct) / CAST(ls.n_lines AS DOUBLE)
                   ELSE 0.0 END, 6) <= 0.3
    AND round(CASE WHEN t.twc > 0
                   THEN coalesce(sb2.best, 0) / CAST(t.twc AS DOUBLE)
                   ELSE 0.0 END, 6) <= 0.2
),
ded AS (
  SELECT doc_id, lang, source, text
  FROM (SELECT r.*, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        FROM rep r)
  WHERE rn = 1
),
evwords AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS ws
  FROM documents WHERE doc_id % 7 = 0
),
evg AS (
  SELECT DISTINCT
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
                               i -> array_to_string(ws[i:i+4], ' '))) AS g
  FROM evwords
),
dwords AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS ws
  FROM ded
),
dgrams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
                               i -> array_to_string(ws[i:i+4], ' '))) AS g
  FROM dwords
),
bad AS (SELECT DISTINCT doc_id FROM dgrams JOIN evg USING (g))
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.source
FROM ded d ANTI JOIN bad USING (doc_id)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UINT64)
        / 4294967296.0
      < CASE d.lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
                    WHEN 'es' THEN 0.75 ELSE 0.0 END
""",
        "image_dedup_clusters": """
WITH RECURSIVE
imgs AS (
  SELECT i AS image_id,
         CASE WHEN i // 60 > 0
              THEN xor(xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32),
                       CAST(power(2, (i // 60) * 2) AS BIGINT))
              ELSE xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32)
         END AS ph
  FROM generate_series(0, 299) t(i)
),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM imgs a JOIN imgs b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.ph, b.ph)) <= 6
    AND ((a.ph >> 0) & 65535 = (b.ph >> 0) & 65535
      OR (a.ph >> 16) & 65535 = (b.ph >> 16) & 65535
      OR (a.ph >> 32) & 65535 = (b.ph >> 32) & 65535
      OR (a.ph >> 48) & 65535 = (b.ph >> 48) & 65535)
),
sym AS (SELECT id_a AS s, id_b AS t FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
reach(node, comp) AS (
  SELECT image_id, image_id FROM imgs
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
)
SELECT CAST(node AS BIGINT) AS image_id,
       CAST(min(comp) AS BIGINT) AS cluster,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
""",
        "line_dedup": """
WITH aug AS (
  SELECT doc_id,
         text || chr(10) ||
         'Follow us on social media for the latest updates and news' ||
         CASE WHEN doc_id % 3 = 0
              THEN chr(10) ||
                   'Subscribe to our newsletter to never miss an update again'
              ELSE '' END AS text
  FROM documents WHERE doc_id < 300
),
lines AS (
  SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls)+1)) AS pos
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug)
),
marked AS (
  SELECT doc_id, pos, line,
         (len(line) < 30) OR
         (row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1
          AND len(line) >= 30) AS keep
  FROM lines
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_lines_removed,
       coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep),
                '') AS text_deduped
FROM marked GROUP BY doc_id
""",
        "domain_cap": """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(key_rank AS BIGINT) AS key_rank
FROM (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC)
               AS key_rank
      FROM documents)
WHERE key_rank <= 20
""",
        "image_caption_filter": """
WITH base AS (
  SELECT i AS id,
         'img_' || lpad(CAST(i AS VARCHAR), 4, '0') AS image_id,
         CAST(16 + (i*37) % 200 AS INT) AS w,
         CAST(16 + (i*53) % 200 AS INT) AS h,
         CASE WHEN i % 17 = 0 THEN '!!! ??? ###'
              WHEN i % 23 = 0 THEN rtrim(repeat('w ', 150))
              ELSE rtrim(repeat('lorem ', CAST(i % 12 AS INT))) END AS caption,
         CAST((i*97) % 64 AS BIGINT) AS phash
  FROM range(500) t(i)
),
scored AS (
  SELECT *,
    len(list_filter(str_split(caption, ' '), x -> x <> '')) AS toks,
    length(regexp_replace(caption, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
      / greatest(length(caption), 1) AS pr
  FROM base
),
reasons AS (
  SELECT image_id, phash,
    CASE WHEN w < 64 OR h < 64 THEN 'too_small'
         WHEN greatest(w, h) > least(w, h) * 3.0 THEN 'bad_aspect'
         WHEN toks < 3 THEN 'caption_short'
         WHEN toks > 128 THEN 'caption_long'
         WHEN pr > 0.5 THEN 'caption_punct' END AS scalar_reason
  FROM scored
),
ranked AS (
  SELECT image_id,
         row_number() OVER (PARTITION BY phash ORDER BY image_id) AS rnk
  FROM reasons WHERE scalar_reason IS NULL
)
SELECT r.image_id,
       (coalesce(r.scalar_reason,
                 CASE WHEN k.rnk > 1 THEN 'near_dup' END) IS NULL) AS keep,
       coalesce(r.scalar_reason,
                CASE WHEN k.rnk > 1 THEN 'near_dup' END) AS reject_reason
FROM reasons r LEFT JOIN ranked k USING (image_id)
""",
        "dedup_clusters": """
WITH RECURSIVE
d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, lang, substr(text, i, 8) AS sh
  FROM (SELECT doc_id, lang, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM d)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
                    AND a.lang = b.lang
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.1
),
sym AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(comp) AS BIGINT) AS cluster,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
""",
        # the dedup_clusters CC chain extended with the size histogram
        "dedup_report": """
WITH RECURSIVE
d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, lang, substr(text, i, 8) AS sh
  FROM (SELECT doc_id, lang, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM d)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
                    AND a.lang = b.lang
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.1
),
sym AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
),
assign AS (
  SELECT node, min(comp) AS cluster FROM reach GROUP BY node
),
csz AS (
  SELECT cluster, count(*)::BIGINT AS cluster_size
  FROM assign GROUP BY cluster
)
SELECT cluster_size,
  count(*)::BIGINT AS n_clusters,
  (cluster_size * count(*))::BIGINT AS n_rows,
  ((cluster_size - 1) * count(*))::BIGINT AS removed_rows,
  round(((cluster_size - 1) * count(*))
        / (SELECT count(*) FROM d)::DOUBLE, 6) AS removed_frac
FROM csz GROUP BY cluster_size
""",
        "ngram_jaccard": """
WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, lang, substr(text, i, 8) AS sh
  FROM (SELECT doc_id, lang, text,
               unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        FROM d)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
                    AND a.lang = b.lang
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
        "embedding_near_dup": """
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
e AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, bk.bucket
  FROM embeddings e JOIN buckets bk ON bk.vec_id = e.vec_id
)
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
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
        "embedding_ivf": """
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
),
lists AS (
  SELECT neighbor_id, c_vec, cid FROM (
    SELECT e.vec_id AS neighbor_id, e.embedding::DOUBLE[] AS c_vec, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) DESC,
                      c.cid ASC
           ) AS crank
    FROM embeddings e, cents c
  ) WHERE crank <= 1
),
probes AS (
  SELECT query_id, q_vec, cid FROM (
    SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS q_vec, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.cvec), 6) DESC,
                      c.cid ASC
           ) AS crank
    FROM embeddings q, cents c WHERE q.vec_id < 10
  ) WHERE crank <= 2
),
cand AS (
  SELECT p.query_id, l.neighbor_id,
         round(list_cosine_similarity(p.q_vec, l.c_vec), 6) AS sim
  FROM probes p JOIN lists l USING (cid)
  WHERE p.query_id <> l.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
         ) AS rank
  FROM cand
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
        "kmeans_centroids": _kmeans_centroids_oracle_sql(),
        # bounded-property oracles for the probabilistic prefilters:
        # exact counts re-derived + asserted no-false-negative zero +
        # FPR-interval TRUE (see _prefilter_property_oracle_sql)
        "bloom_prefilter": _prefilter_property_oracle_sql(),
        "cuckoo_prefilter": _prefilter_property_oracle_sql(),
        "kmeans_assign": _kmeans_assign_oracle_sql(),
        "semantic_dedup_kmeans": _semantic_dedup_kmeans_oracle_sql(),
        "ivf_trained": _ivf_trained_oracle_sql(),
        "semdedup_block_recall": _semdedup_block_recall_oracle_sql(),
        "ivf_recall": _ivf_recall_oracle_sql(),
        # same trained quantizer + output contract as kmeans_assign —
        # the shared oracle certifies both assignment paths bit-equal
        "kmeans_assign_bcast": _kmeans_assign_oracle_sql(),
        "publish_time_normalize": """
WITH s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN
                year(o_orderdate) || '年' || month(o_orderdate) || '月'
                || day(o_orderdate) || '日发布'
              WHEN o_orderkey % 3 = 1 THEN
                year(o_orderdate) || '-' || month(o_orderdate) || '-'
                || day(o_orderdate)
              ELSE '未注明日期' END AS raw
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CASE WHEN regexp_matches(raw, '([0-9]{4})[年-]([0-9]{1,2})[月-]([0-9]{1,2})日?')
            THEN make_date(
              CAST(regexp_extract(raw, '([0-9]{4})[年-]([0-9]{1,2})[月-]([0-9]{1,2})日?', 1) AS INT),
              CAST(regexp_extract(raw, '([0-9]{4})[年-]([0-9]{1,2})[月-]([0-9]{1,2})日?', 2) AS INT),
              CAST(regexp_extract(raw, '([0-9]{4})[年-]([0-9]{1,2})[月-]([0-9]{1,2})日?', 3) AS INT))
            ELSE NULL END AS pub_date
FROM s
""",
        "doc_no_normalize": """
WITH r AS (
  SELECT p_partkey,
         (['国务院','财政部','中国证监会','北京市人民政府'])[p_partkey % 4 + 1] AS org,
         CAST(1990 + p_partkey % 30 AS VARCHAR) AS yr,
         CAST(p_partkey % 500 AS VARCHAR) AS no
  FROM part
),
raws AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0 THEN org || '〔' || yr || '〕第' || no || '号'
              WHEN p_partkey % 3 = 1 THEN org || '（' || yr || '）' || no || '号'
              ELSE org || '[' || yr || ']第' || no || '号' END AS raw_no,
         org, yr, no
  FROM r
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, raw_no,
       org || '(' || yr || ')' || no || '号' AS doc_no
FROM raws
""",
        "title_guess": """
WITH t AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0 THEN p_name || '_政策文件_政府网'
              WHEN p_partkey % 3 = 1 THEN p_name || ' - Site Name'
              ELSE p_name END AS raw
  FROM part
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       trim(split_part(replace(raw, '-', '_'), '_', 1)) AS title
FROM t
""",
        "t_valid_rule": """
WITH o AS (SELECT * FROM orders WHERE o_orderkey % 5 < 2),
s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN
                '本办法自' || year(o_orderdate) || '年' || month(o_orderdate)
                || '月' || day(o_orderdate) || '日起施行。'
              ELSE '本条不含生效日期。' END AS line
  FROM o
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CASE WHEN regexp_matches(line, '自([0-9]{4})年([0-9]+)月([0-9]+)日起施行')
            THEN make_date(
              CAST(regexp_extract(line, '自([0-9]{4})年([0-9]+)月([0-9]+)日起施行', 1) AS INT),
              CAST(regexp_extract(line, '自([0-9]{4})年([0-9]+)月([0-9]+)日起施行', 2) AS INT),
              CAST(regexp_extract(line, '自([0-9]{4})年([0-9]+)月([0-9]+)日起施行', 3) AS INT))
            ELSE NULL END AS t_valid
FROM s
""",
        "negs_extract": """
WITH t AS (
  SELECT p_partkey,
         '依据《' || p_type || '》与《' || p_brand || '》以及《' || p_type || '》。' AS text
  FROM part
)
SELECT DISTINCT CAST(p_partkey AS BIGINT) AS p_partkey,
       unnest(regexp_extract_all(text, '《(.*?)》', 1)) AS neg
FROM t
""",
        "attachment_harvest": """
WITH p AS (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0),
pages AS (
  SELECT 'http://x.test/p' || p_partkey AS referer,
         '<a href="/files/f' || p_partkey
           || CASE WHEN p_partkey % 4 = 0 THEN '.pdf' ELSE '.html' END
           || '">att</a><img src="/userfiles/image/' || (p_partkey % 100)
           || CASE WHEN p_partkey % 8 = 0 THEN '.jpg' ELSE '.gif' END
           || '"/>' AS body
  FROM p
)
SELECT referer, unnest(regexp_extract_all(body,
         'href\\s*=\\s*"([^"]+\\.(?:doc|docx|pdf|txt|xls|ceb))"', 1)) AS att_url,
       'attachment' AS kind
FROM pages
UNION ALL
SELECT referer, unnest(regexp_extract_all(body,
         'src\\s*=\\s*"([^"]*/userfiles/image/[0-9]+\\.(?:png|jpg))"', 1)) AS att_url,
       'image' AS kind
FROM pages
""",
        "attachment_type": """
WITH u AS (
  SELECT p_partkey,
         'http://x.test/f' || p_partkey || '.' ||
           (['htm','pdf','doc','docx','xls','xlsx','txt','json','bin'])[p_partkey % 9 + 1]
           AS url
  FROM part
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, url,
       CAST(CASE lower(regexp_extract(url, '\\.([A-Za-z0-9]+)$', 1))
         WHEN 'html' THEN 1 WHEN 'htm' THEN 1 WHEN 'shtml' THEN 1
         WHEN 'json' THEN 2 WHEN 'txt' THEN 3 WHEN 'doc' THEN 4
         WHEN 'docx' THEN 5 WHEN 'xls' THEN 6 WHEN 'xlsx' THEN 7
         WHEN 'pdf' THEN 8 ELSE 1 END AS INT) AS type_code
FROM u
""",
        "index_block": """
WITH l AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 3 = 0 THEN '索引号：GOV-' || n_nationkey
              WHEN n_nationkey % 3 = 1 THEN '这是一行比较长的正文内容不是元数据行' || n_name
              ELSE ' 标 题：' || n_name END AS line
  FROM nation
),
cleaned AS (
  SELECT n_nationkey,
         regexp_replace(trim(line), '[\\s　【]+', '', 'g') AS line
  FROM l
)
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, line
FROM cleaned
WHERE length(line) > 0
  AND regexp_matches(line, '^([\\[一-龥 ]{2,8})[：】:|\\]].*')
""",
        "title_similarity": """
WITH p AS (SELECT * FROM part WHERE p_partkey < 500)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       round(1.0 - levenshtein(p_name, p_name || ' (2024)')
             / greatest(length(p_name), length(p_name || ' (2024)'), 1), 6) AS sim,
       round(1.0 - levenshtein(p_name, p_type)
             / greatest(length(p_name), length(p_type), 1), 6) AS sim_mfgr
FROM p
""",
        "product_dedup": """
WITH new_p AS (
  SELECT md5('u' || p_partkey) AS url_md5,
         CASE WHEN p_partkey % 7 = 0 THEN ''
              ELSE '国发(' || (p_partkey % 40 + 1980) || ')'
                   || (p_partkey % 300) || '号' END AS doc_ori_no,
         'd' || (p_partkey % 900) AS doc_id,
         CAST((p_partkey * 37 + 11) % 10000 AS BIGINT) AS simhash
  FROM part
),
existing AS (
  SELECT md5('u' || (s_suppkey * 3)) AS url_md5,
         '国发(' || (s_suppkey % 40 + 1980) || ')' || (s_suppkey % 300) || '号' AS doc_ori_no,
         'd' || (s_suppkey % 11) AS doc_id,
         CAST((s_suppkey * 41 + 11) % 10000 AS BIGINT) AS simhash
  FROM supplier
)
SELECT url_md5, doc_ori_no, doc_id, simhash
FROM new_p n
WHERE n.url_md5 NOT IN (SELECT url_md5 FROM existing)
  AND (n.doc_ori_no = '' OR n.doc_ori_no NOT IN
        (SELECT doc_ori_no FROM existing WHERE doc_ori_no <> ''))
  AND n.doc_id NOT IN (SELECT doc_id FROM existing)
  AND n.simhash NOT IN (SELECT simhash FROM existing)
""",
        "cookie_lookup": """
WITH jar0 AS (
  SELECT CAST(n_nationkey AS BIGINT) AS seq,
         'n' || (n_nationkey % 20) || '.test' AS source_domain,
         'n' || (n_nationkey % 20) || '.test' AS domain,
         '/p' || ((n_nationkey % 20) % 3) AS path,
         'c' || ((n_nationkey % 20) % 5) AS name,
         'v' || n_nationkey AS value
  FROM nation
),
jar AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY domain, path, name
                                 ORDER BY seq DESC) AS rn
    FROM jar0
  ) WHERE rn = 1
),
reqs AS (
  SELECT 'http://' || CASE WHEN c_custkey % 2 = 0 THEN '' ELSE 'sub.' END
           || 'n' || (c_custkey % 20) || '.test/p' || (c_custkey % 4)
           || '/page' AS url,
         'n' || (c_custkey % 20) || '.test' AS domain,
         CASE WHEN c_custkey % 2 = 0 THEN '' ELSE 'sub.' END
           || 'n' || (c_custkey % 20) || '.test' AS host,
         '/p' || (c_custkey % 4) || '/page' AS path
  FROM customer WHERE c_custkey < 200
),
cand AS (
  SELECT r.url, j.name, j.value, j.seq
  FROM reqs r JOIN jar j ON r.domain = j.source_domain
  WHERE (r.host = j.domain OR r.host LIKE '%' || j.domain)
    AND r.path LIKE j.path || '%'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url, name ORDER BY seq DESC) AS rn
  FROM cand
)
SELECT url, name, value FROM ranked WHERE rn = 1
""",
        "cookie_harvest": """
WITH c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
line1 AS (
  SELECT CAST((CAST(3 AS BIGINT) << 40) + (CAST(k % 50 + 1 AS BIGINT) << 20)
              + 0 AS BIGINT) AS seq,
         'h' || (k % 15) || '.test' AS source_domain,
         'www.h' || (k % 15) || '.test' AS domain,
         '/dir' || (k % 4) || '/' AS path,
         'sid' || (k % 7) AS name,
         'v' || k AS value
  FROM c
),
line2 AS (
  SELECT CAST((CAST(3 AS BIGINT) << 40) + (CAST(k % 50 + 1 AS BIGINT) << 20)
              + 1 AS BIGINT) AS seq,
         'h' || (k % 15) || '.test' AS source_domain,
         CASE WHEN k % 3 = 0 THEN '.h' || (k % 15) || '.test'
              ELSE 'www.h' || (k % 15) || '.test' END AS domain,
         CASE WHEN k % 3 = 0 THEN '/docs' ELSE '/t' || (k % 2) END AS path,
         CASE WHEN k % 3 = 0 THEN 'lang' ELSE 'theme' END AS name,
         CASE WHEN k % 3 = 0 THEN 'zh' ELSE '"dark"' END AS value
  FROM c
)
SELECT * FROM line1 UNION ALL SELECT * FROM line2
""",
        "send_data": """
WITH work AS (
  SELECT 'http://forms.test/' ||
           CASE WHEN p_partkey % 3 = 0 THEN 'search'
                WHEN p_partkey % 3 = 1 THEN 'login' ELSE 'page' END
           || '/' || p_partkey AS url
  FROM part WHERE p_partkey < 400
),
rules AS (
  SELECT * FROM (VALUES
    (1, '/search/', 'post', 'q=laws&page=1'),
    (2, '/search/', 'post', 'lang=zh&q=override'),
    (3, '/(search|login)/', 'auth', 'user:pass1'),
    (4, '/login/', 'auth', 'user:pass2')
  ) AS t(rule_order, url_regex, kind, payload)
),
m AS (
  SELECT w.url, r.rule_order, r.kind, r.payload
  FROM work w JOIN rules r ON regexp_matches(w.url, r.url_regex)
),
kv AS (
  SELECT url, rule_order * 1000 + pos AS ord,
         split_part(entry, '=', 1) AS k,
         regexp_replace(entry, '^[^=]*=', '') AS v
  FROM (SELECT url, rule_order,
               unnest(string_split(payload, '&')) AS entry,
               generate_subscripts(string_split(payload, '&'), 1) AS pos
        FROM m WHERE kind = 'post')
),
merged AS (
  SELECT url, k, min(ord) AS first_ord, arg_max(v, ord) AS v
  FROM kv GROUP BY url, k
),
post AS (
  SELECT url, string_agg(k || '=' || v, '&' ORDER BY first_ord) AS post_data
  FROM merged GROUP BY url
),
auth AS (
  SELECT url, arg_min(payload, rule_order) AS auth
  FROM m WHERE kind = 'auth' GROUP BY url
)
SELECT w.url, p.post_data, a.auth
FROM work w
LEFT JOIN post p ON p.url = w.url
LEFT JOIN auth a ON a.url = w.url
""",
        "requeue_list": """
WITH f AS (
  SELECT CAST(event_id AS BIGINT) AS insert_seq,
         CASE WHEN event_id % 4 = 0 THEN 'list' ELSE 'detail' END AS route
  FROM events
)
SELECT insert_seq, route, 'pending' AS state
FROM f
WHERE route = 'list' AND insert_seq % 3 = 0
ORDER BY insert_seq ASC
LIMIT 50
""",
        "format_url": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CASE
         WHEN c_custkey % 5 = 0 THEN
           'http://WWW.Host' || (c_custkey % 10) || '.com/dir'
             || (c_custkey % 7) || '/sub/item' || c_custkey || '.htm'
         WHEN c_custkey % 5 = 1 THEN
           'http://WWW.Host' || (c_custkey % 10) || '.com/root'
             || c_custkey || '.htm'
         WHEN c_custkey % 5 = 2 THEN
           'http://WWW.Host' || (c_custkey % 10) || '.com/dir'
             || (c_custkey % 7) || '/up' || c_custkey || '.htm'
         WHEN c_custkey % 5 = 3 THEN 'http://keep.me/x' || c_custkey
         ELSE
           'http://WWW.Host' || (c_custkey % 10) || '.com/dir'
             || (c_custkey % 7) || '/sub/https://evil.example/x' || c_custkey
       END AS url
FROM customer WHERE c_custkey < 500
""",
        "handler_route": """
WITH u AS (
  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
         'http://s.test/' ||
           CASE WHEN p_size % 3 = 0 THEN 'detail/d' || p_partkey || '.htm'
                WHEN p_size % 3 = 1 THEN 'att/f' || p_partkey || '.doc'
                ELSE 'page/p' || p_partkey || '.htm' END AS url
  FROM part
)
SELECT p_partkey, url,
       CASE WHEN regexp_matches(url, '/detail/') THEN 'detail'
            WHEN regexp_matches(url, '(?i)\\.(doc|docx)$') THEN 'attachment'
            ELSE 'list' END AS route
FROM u
""",
        "extraction_gate": """
WITH pages AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(CASE WHEN o_orderkey % 3 = 2 THEN 404 ELSE 200 END AS INT) AS status,
         CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey % 150
                   ELSE 5000 END AS BIGINT) AS bytes_received
  FROM orders WHERE o_orderkey < 3000
)
SELECT o_orderkey, status, bytes_received
FROM pages WHERE status = 200 AND bytes_received > 100
""",
        "index_sink": r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       substr('Doc ' || doc_id, 1, 512) AS title,
       substr(lang, 1, 256) AS tags,
       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
            AS BIGINT) AS n_tokens,
       list_filter(string_split_regex(text, '\s+'), x -> x <> '')[1] AS token_1
FROM documents
""",
        "doc_text_extract": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'lctx'
            WHEN doc_id % 4 = 1 THEN 'pdftotext-stub'
            WHEN doc_id % 4 = 2 THEN 'docx-stub'
            ELSE 'plain' END AS extractor,
       CASE WHEN doc_id % 4 = 0 THEN substr(text, 1, 50)
            WHEN doc_id % 4 = 3 THEN substr(text, 1, 50)
            ELSE NULL END AS text_head
FROM documents WHERE doc_id < 200
""",
        "crawl_golden_fixture": _golden_fixture_values_sql(),
        "crawl_golden_redirects": _golden_redirects_values_sql(),
        "image_caption_assembly": _image_caption_assembly_values_sql(),
        # content_extract: the body is templated, so the kernel's exact
        # output (post E9 pruning, E10 paragraph path, img marker) is
        # reconstructible in SQL
        "content_extract": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'Doc_' || doc_id AS page_title,
       substr(text, 1, 200) || chr(10) || '[tag:img:/userfiles/image/'
         || doc_id || '.jpg]' || chr(10) || chr(10) AS content,
       CAST(1 AS INT) AS n_images,
       CAST(3 AS INT) AS n_paragraphs
FROM documents WHERE doc_id < 100
""",
        # summary_fields: label table semantics over the templated text
        "summary_fields": """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       'GOV-' || n_nationkey AS index_ori_no,
       '机关' || (n_nationkey % 5) AS author,
       '20' || (n_nationkey % 10 + 10) || '年1月2日' AS publish_time
FROM nation
""",
        # simhash_docs: the full Charikar pipeline in SQL — token hash =
        # little-endian uint64 of md5('0'‖US‖tok) (hashing.stable_hash64),
        # per-bit ±1 majority vote, two's-complement to BIGINT
        "simhash_docs": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
  FROM documents
),
hx AS (
  SELECT doc_id, md5('0' || chr(31) || tok) AS h FROM toks
),
th AS (
  SELECT doc_id,
    list_sum(
      list_transform(range(0, 8), i ->
        (
          (16 * (strpos('0123456789abcdef', substr(h, (2*i+1)::INT, 1)) - 1)
             + (strpos('0123456789abcdef', substr(h, (2*i+2)::INT, 1)) - 1)
          )::UBIGINT << (8*i)::INT
        )
      )
    )::UBIGINT AS th
  FROM hx
),
bits AS (
  SELECT doc_id, b, sum(CASE WHEN (th >> b::INT) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bl
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id, sum(CASE WHEN c > 0 THEN (1::UBIGINT << b::INT)::HUGEINT ELSE 0 END) AS v
  FROM bits GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN s.v >= 9223372036854775808::HUGEINT
                 THEN s.v - 18446744073709551616::HUGEINT
                 ELSE coalesce(s.v, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh s USING (doc_id)
""",
        # deterministic-fixture VALUES oracles (goldens technique): the
        # expected rows are computed driver-side WITHOUT Spark
        "image_verify": _image_verify_values_sql(),
        "clip_score_filter": _clip_score_values_sql(),
        "image_resize": _image_resize_values_sql(),
        "image_features": _image_features_values_sql(),
        "video_frame_sample": _video_frames_values_sql(),
        "image_augment": _image_augment_values_sql(),
        # audio: blobs are synthesized from range params (square wave,
        # period 32, trailing silence), so every parsed/derived value has
        # a closed form — the oracles recompute them arithmetically and a
        # hash match certifies the real byte-level WAV parse.
        "audio_meta": """
SELECT CAST(id AS BIGINT) AS audio_id,
       CAST(1 + id % 2 AS INT) AS channels,
       CAST(8000 * (1 + id % 3) AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits,
       CAST(1024 + (id % 7) * 512 AS BIGINT) AS n_frames,
       CAST((1024 + (id % 7) * 512) * 1000000
            // (8000 * (1 + id % 3)) AS BIGINT) AS duration_us
FROM generate_series(0, 119) t(id)
""",
        # peak = amp; sum_sq = amp^2 * active samples; sign flips every
        # half-period (16) strictly inside the active span -> (na-1)//16;
        # zeros = silence tail.
        "audio_features": """
SELECT CAST(id AS BIGINT) AS audio_id,
       CAST(1024 AS BIGINT) AS n_frames,
       CAST(200 + id AS BIGINT) AS peak,
       CAST((200 + id) * (200 + id) AS BIGINT)
         * CAST(1024 - (id % 4) * 128 AS BIGINT) AS sum_sq,
       CAST((1024 - (id % 4) * 128 - 1) // 16 AS BIGINT) AS zero_crossings,
       CAST((id % 4) * 128 AS BIGINT) AS n_zero
FROM generate_series(0, 99) t(id)
""",
        # decimate-by-2: out sample j = in sample 2j, so the output is a
        # square wave of half the period with half the active samples.
        "audio_resample": """
SELECT CAST(id AS BIGINT) AS audio_id,
       CAST(512 AS BIGINT) AS out_frames,
       CAST(8000 AS INT) AS out_rate,
       CAST(300 + id AS BIGINT) AS out_peak,
       CAST((300 + id) * (300 + id) AS BIGINT)
         * CAST((1024 - (id % 3) * 128) // 2 AS BIGINT) AS out_sum_sq,
       CAST(((1024 - (id % 3) * 128) // 2 - 1) // 8 AS BIGINT)
         AS out_zero_crossings
FROM generate_series(0, 79) t(id)
""",
        "doc_chunk": r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
n AS (SELECT doc_id, toks, len(toks) AS n FROM d),
c AS (SELECT doc_id, toks, n,
             unnest(generate_series(0, greatest((n - 8 + 39) // 40, 1) - 1))
               AS i
      FROM n)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, i * 40 + 1, i * 40 + 48)) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, i * 40 + 1, i * 40 + 48), ' ')
         AS chunk_text
FROM c
""",
        "shard_assign": """
WITH d AS (
  SELECT id AS image_id, 5000 + (id % 37) * 301 AS n_bytes
  FROM generate_series(0, 1999) t(id)
),
c AS (
  SELECT image_id, n_bytes,
         SUM(n_bytes) OVER (ORDER BY image_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
  FROM d
)
SELECT CAST(image_id AS BIGINT) AS image_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(cum - n_bytes AS BIGINT) AS byte_offset,
       CAST((cum - n_bytes) // 1048576 AS BIGINT) AS shard_idx,
       CAST((cum - n_bytes) % 1048576 AS BIGINT) AS offset_in_shard,
       (n_bytes > 0 AND (cum - 1) // 1048576 > (cum - n_bytes) // 1048576)
         AS overflows_shard
FROM c
""",
        # independent re-derivation with plain windows: argmin bucket by
        # the same integer cross-multiplied distance, ROW_NUMBER within
        # bucket, ceil-div batch bases stacked in bucket_id order. The
        # bucket VALUES are generate_aspect_buckets()'s defaults.
        "aspect_bucket_batches": """
WITH imgs AS (
  SELECT printf('img_%012d', i) AS image_id,
         CAST(24 + (i % 5) * 8 AS INTEGER) AS w,
         CAST(24 + (i % 7) * 4 AS INTEGER) AS h
  FROM generate_series(0, 255) t(i)
),
buckets(bucket_id, bucket_w, bucket_h) AS (VALUES
  (0,16,64),(1,16,56),(2,24,48),(3,24,40),(4,32,32),
  (5,40,24),(6,48,24),(7,56,16),(8,64,16)
),
assigned AS (
  SELECT image_id, w, h, bucket_id, bucket_w, bucket_h,
         ROW_NUMBER() OVER (
           PARTITION BY image_id
           ORDER BY abs(CAST(w AS BIGINT) * bucket_h
                        - CAST(h AS BIGINT) * bucket_w), bucket_id
         ) AS pick
  FROM imgs CROSS JOIN buckets
),
tagged AS (
  SELECT image_id, w, h, bucket_id, bucket_w, bucket_h
  FROM assigned WHERE pick = 1
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY bucket_id ORDER BY image_id) - 1
           AS rank_in_bucket,
         COUNT(*) OVER (PARTITION BY bucket_id) AS btotal
  FROM tagged
),
bases AS (
  SELECT bucket_id,
         COALESCE(SUM((n + 3) // 4) OVER (
           ORDER BY bucket_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bbase
  FROM (SELECT bucket_id, COUNT(*) AS n FROM tagged GROUP BY bucket_id)
)
SELECT r.image_id, r.w, r.h,
       CAST(r.bucket_id AS INTEGER) AS bucket_id,
       CAST(r.bucket_w AS INTEGER) AS bucket_w,
       CAST(r.bucket_h AS INTEGER) AS bucket_h,
       CAST(r.rank_in_bucket AS BIGINT) AS rank_in_bucket,
       CAST(b.bbase + r.rank_in_bucket // 4 AS BIGINT) AS batch_idx,
       (r.btotal - (r.rank_in_bucket // 4) * 4) < 4 AS batch_is_ragged
FROM ranked r JOIN bases b USING (bucket_id)
""",
        # serial running sum — the Spark side must reproduce it with the
        # two-stage distributed prefix sum
        "sequence_pack": r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM documents
),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(cum - n AS BIGINT) AS start_offset,
       CAST((cum - n) // 256 AS BIGINT) AS seq_idx,
       CAST((cum - n) % 256 AS BIGINT) AS offset_in_seq,
       (n > 0 AND (cum - 1) // 256 > (cum - n) // 256) AS spans_boundary
FROM c
""",
        # MinHash-LSH candidates scored against exact Jaccard >= 0.5
        # ground truth (same 5-char shingle family on both sides)
        "dedup_recall": """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
        FROM d)
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.5
),
sig AS (
  SELECT doc_id,
         min(md5('0' || chr(31) || sh)) AS s0,
         min(md5('1' || chr(31) || sh)) AS s1,
         min(md5('2' || chr(31) || sh)) AS s2,
         min(md5('3' || chr(31) || sh)) AS s3,
         min(md5('4' || chr(31) || sh)) AS s4,
         min(md5('5' || chr(31) || sh)) AS s5,
         min(md5('6' || chr(31) || sh)) AS s6,
         min(md5('7' || chr(31) || sh)) AS s7
  FROM g GROUP BY doc_id
),
bands AS (
  SELECT doc_id, '0:' || s0 || ',' || s1 AS bk FROM sig
  UNION ALL SELECT doc_id, '1:' || s2 || ',' || s3 FROM sig
  UNION ALL SELECT doc_id, '2:' || s4 || ',' || s5 FROM sig
  UNION ALL SELECT doc_id, '3:' || s6 || ',' || s7 FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
),
hits AS (
  SELECT t.id_a, t.id_b FROM truth t
  JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
       round((SELECT count(*) FROM hits) * 1.0
             / (SELECT count(*) FROM truth), 6) AS recall,
       round((SELECT count(*) FROM hits) * 1.0
             / (SELECT count(*) FROM cand), 6) AS precision
""",
        # recall@3 of SRP-LSH vs exact cosine: both rankings re-derived
        # with the deterministic tie-break, then set-intersected
        "ann_recall": """
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
expairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
           ) AS rank
    FROM expairs) WHERE rank <= 3
),
appairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim
  FROM q
  JOIN buckets bk ON bk.bucket = q.bucket
  JOIN embeddings e ON e.vec_id = bk.vec_id
  WHERE e.vec_id <> q.query_id
),
ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
           ) AS rank
    FROM appairs) WHERE rank <= 3
)
SELECT CAST(ex.query_id AS BIGINT) AS query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
       round(count(ap.neighbor_id) * 1.0 / count(*), 6) AS recall
FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id
                    AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id
""",
        # mirrors the Spark expression tree literal-for-literal: (1.2+1.0)
        # not 2.2, (1.0-0.75) not 0.25, same associativity — so the only
        # cross-engine wiggle is ln()'s last ulp, absorbed by round(,6)
        "bm25_rank": """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
base AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
st AS (
  SELECT count(*) AS n, avg(dl) AS avgdl,
         sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN list_contains(toks, 'query') THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END) AS df2
  FROM base
),
tf AS (
  SELECT doc_id, dl,
         len(list_filter(toks, x -> x = 'spark')) AS tf0,
         len(list_filter(toks, x -> x = 'query')) AS tf1,
         len(list_filter(toks, x -> x = 'join')) AS tf2
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(dl AS BIGINT) AS dl,
       CAST(tf0 AS BIGINT) AS tf_spark,
       CAST(tf1 AS BIGINT) AS tf_query,
       CAST(tf2 AS BIGINT) AS tf_join,
       round(
           0.0
         + ln(1.0 + ((n - df0) + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0))
             / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln(1.0 + ((n - df1) + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0))
             / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln(1.0 + ((n - df2) + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0))
             / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)),
       6) AS score
FROM tf, st
""",
        "minhash_dedup": """
WITH RECURSIVE
d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
g AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
        FROM d)
),
sig AS (
  SELECT doc_id,
         min(md5('0' || chr(31) || sh)) AS s0,
         min(md5('1' || chr(31) || sh)) AS s1,
         min(md5('2' || chr(31) || sh)) AS s2,
         min(md5('3' || chr(31) || sh)) AS s3,
         min(md5('4' || chr(31) || sh)) AS s4,
         min(md5('5' || chr(31) || sh)) AS s5,
         min(md5('6' || chr(31) || sh)) AS s6,
         min(md5('7' || chr(31) || sh)) AS s7
  FROM g GROUP BY doc_id
),
bands AS (
  SELECT doc_id, '0:' || s0 || ',' || s1 AS bk FROM sig
  UNION ALL SELECT doc_id, '1:' || s2 || ',' || s3 FROM sig
  UNION ALL SELECT doc_id, '2:' || s4 || ',' || s5 FROM sig
  UNION ALL SELECT doc_id, '3:' || s6 || ',' || s7 FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
),
sym AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(comp) AS BIGINT) AS cluster,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
""",
        # dyadic-exact PageRank: out-degrees are powers of two and d=0.5,
        # so double arithmetic is exact and order-independent on both
        # engines (see q_link_pagerank / tests/test_graph.py)
        "link_pagerank": """
WITH nodes AS (SELECT i AS node FROM generate_series(0, 63) t(i)),
edges AS (
  SELECT i AS src, (2 * i + 1) % 64 AS dst FROM generate_series(0, 63) t(i)
  UNION ALL
  SELECT i, i // 2 FROM generate_series(0, 63) t(i) WHERE i % 2 = 0
),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / 64 AS rank FROM nodes),
r1 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r0.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r0 ON r0.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
),
r2 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r1.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r1 ON r1.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
),
r3 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r2.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r2 ON r2.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
)
SELECT CAST(node AS BIGINT) AS node, rank FROM r3
""",
        "semantic_dedup": """
WITH RECURSIVE
w AS (
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
e AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, bk.bucket
  FROM embeddings e JOIN buckets bk ON bk.vec_id = e.vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
),
sym AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
)
SELECT CAST(node AS BIGINT) AS vec_id,
       CAST(min(comp) AS BIGINT) AS cluster,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
""",
        "anchor_text_agg": """
WITH links AS (
  SELECT 'http://t' || (l_partkey % 40) || '.test/p/' || (l_partkey % 120)
           AS target_url,
         'anchor ' || (l_suppkey % 5) AS anchor
  FROM lineitem
),
counts AS (
  SELECT target_url, anchor, count(*) AS cnt
  FROM links GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY target_url ORDER BY cnt DESC, anchor ASC
  ) AS r FROM counts
)
SELECT target_url,
       CAST(sum(cnt) AS BIGINT) AS n_inlinks,
       CAST(count(*) AS BIGINT) AS n_variants,
       coalesce(
         string_agg(CASE WHEN r <= 3 THEN anchor END, '|'
                    ORDER BY cnt DESC, anchor ASC),
         '') AS top_anchors
FROM ranked GROUP BY target_url
""",
        "recrawl_schedule": """
WITH hist AS (
  SELECT 'http://recrawl.test/p/' || (event_id % 300) AS url,
         ts AS fetch_ts,
         md5(event_type) AS content_hash,
         event_id AS seq
  FROM events
),
flagged AS (
  SELECT url,
         CAST(floor(epoch(fetch_ts)) AS BIGINT) AS unix_s,
         CASE WHEN lag(content_hash) OVER (
                  PARTITION BY url ORDER BY fetch_ts, seq
              ) IS NOT NULL
              AND lag(content_hash) OVER (
                  PARTITION BY url ORDER BY fetch_ts, seq
              ) <> content_hash
              THEN 1 ELSE 0 END AS chg
  FROM hist
),
agg AS (
  SELECT url, count(*) AS n_fetches, sum(chg) AS n_changes,
         min(unix_s) AS first_unix, max(unix_s) AS last_unix
  FROM flagged GROUP BY url
),
iv AS (
  SELECT *,
         CASE WHEN n_fetches <= 1 THEN 2592000
              ELSE least(greatest(
                     CAST(floor((last_unix - first_unix)::DOUBLE
                                / (n_changes + 1)) AS BIGINT),
                     3600), 2592000)
         END AS next_interval_sec
  FROM agg
)
SELECT url,
       CAST(n_fetches AS BIGINT) AS n_fetches,
       CAST(n_changes AS BIGINT) AS n_changes,
       round(n_changes::DOUBLE / greatest(n_fetches - 1, 1), 6)
         AS change_rate,
       CAST(next_interval_sec AS BIGINT) AS next_interval_sec,
       CAST(last_unix + next_interval_sec AS BIGINT) AS next_fetch_unix
FROM iv
""",
        "sitemap_parse": """
WITH base AS (SELECT unnest(generate_series(0, 11)) AS id),
pages AS (
  SELECT 'http://s' || id || '.test/sitemap.xml' AS sitemap_url,
         CASE WHEN id % 4 = 3 THEN
           '<sitemapindex>' || chr(10) || ' <sitemap>' || chr(10)
           || '  <loc>http://s' || id || '.test/sitemap1.xml</loc>'
           || chr(10) || '  <lastmod>2024-02-0' || ((id % 9) + 1)
           || '</lastmod>' || chr(10) || ' </sitemap>' || chr(10)
           || ' <sitemap><loc> http://s' || id
           || '.test/sitemap2.xml </loc></sitemap>' || chr(10)
           || '</sitemapindex>'
         ELSE
           '<?xml version="1.0"?>' || chr(10) || '<urlset>' || chr(10)
           || ' <url>' || chr(10) || '  <loc>' || chr(10)
           || '   http://s' || id || '.test/p/' || (id * 10) || chr(10)
           || '  </loc>' || chr(10) || '  <lastmod>2024-0' || ((id % 9) + 1)
           || '-15</lastmod>' || chr(10)
           || '  <changefreq>daily</changefreq>' || chr(10)
           || '  <priority>0.' || (id % 10) || '</priority>' || chr(10)
           || ' </url>' || chr(10)
           || ' <url><loc>http://s' || id || '.test/p/' || (id * 10 + 1)
           || '</loc></url>' || chr(10)
           || ' <url><loc>http://s' || id || '.test/p/' || (id * 10 + 2)
           || '</loc><priority>1.0</priority></url>' || chr(10)
           || '</urlset>'
         END AS body
  FROM base
),
kinds AS (
  SELECT sitemap_url, body,
         CASE WHEN regexp_matches(body, '<sitemapindex') THEN 'index'
              ELSE 'urlset' END AS kind,
         CASE WHEN regexp_matches(body, '<sitemapindex')
              THEN regexp_extract_all(body, '(?s)<sitemap>(.*?)</sitemap>', 1)
              ELSE regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1)
         END AS blocks
  FROM pages
),
exploded AS (
  SELECT sitemap_url, kind, i - 1 AS seq, blocks[i] AS block
  FROM kinds, (SELECT unnest(generate_series(1, 3)) AS i)
  WHERE i <= len(blocks)
)
SELECT sitemap_url, kind, CAST(seq AS INT) AS seq,
       nullif(regexp_extract(block, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1), '')
         AS loc,
       nullif(regexp_extract(block, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '')
         AS lastmod,
       nullif(regexp_extract(block, '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1), '')
         AS changefreq,
       CAST(nullif(regexp_extract(block, '(?s)<priority>\\s*(.*?)\\s*</priority>', 1), '')
            AS DOUBLE) AS priority
FROM exploded
WHERE nullif(regexp_extract(block, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1), '')
      IS NOT NULL
""",
        "unigram_logprob": """
WITH toks AS (
  SELECT doc_id, w AS tok
  FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> len(x) > 0)) AS w
    FROM documents
  )
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM counts)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(
         (CAST(sum(CAST(round(ln(c) * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
          / count(*)) / 1000000.0
         - ln(CAST((SELECT n FROM tot) AS DOUBLE)),
       6) AS mean_logprob
FROM toks JOIN counts USING (tok)
GROUP BY doc_id
""",
        # LM scores -> milli-nat ints -> two tie-inclusive order
        # statistics via descending cumulative windows -> labels
        "ccnet_buckets": """
WITH toks AS (
  SELECT doc_id, w AS tok
  FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> len(x) > 0)) AS w
    FROM documents
  )
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM counts),
lp AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(
           (CAST(sum(CAST(round(ln(c) * 1000000.0, 0) AS BIGINT))
                 AS DOUBLE) / count(*)) / 1000000.0
           - ln(CAST((SELECT n FROM tot) AS DOUBLE)),
         6) AS mean_logprob
  FROM toks JOIN counts USING (tok)
  GROUP BY doc_id
),
s AS (
  SELECT *, CAST(round((mean_logprob + 30.0) * 1000.0, 0) AS BIGINT)
              AS ppl_score
  FROM lp
),
c AS (SELECT ppl_score AS v, count(*) AS cnt FROM s GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM s),
cum AS (
  SELECT v, sum(cnt) OVER (
    ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cge
  FROM c
),
th AS (SELECT max(v) AS t FROM cum
       WHERE cge >= (SELECT greatest(ceil(n / 3.0), 1) FROM nn)),
tm AS (SELECT max(v) AS t FROM cum
       WHERE cge >= (SELECT greatest(ceil(n * 2.0 / 3.0), 1) FROM nn))
SELECT doc_id, n_tokens, mean_logprob, ppl_score,
  CASE WHEN ppl_score >= (SELECT t FROM th) THEN 'head'
       WHEN ppl_score >= (SELECT t FROM tm) THEN 'middle'
       ELSE 'tail' END AS bucket
FROM s
""",
        "robots_sitemaps": """
WITH base AS (SELECT unnest(generate_series(0, 9)) AS id),
robots AS (
  SELECT 'h' || id || '.test' AS host,
         CASE WHEN id % 3 = 2 THEN
           'User-agent: *' || e'\\r\\n' || 'Disallow: /' || id
         ELSE
           '# robots for h' || id || e'.test\\r\\n'
           || e'User-agent: *\\r\\nDisallow: /private\\r\\n'
           || e'NotSitemap: http://no.test/x\\r\\n'
           || 'Sitemap: http://h' || id || e'.test/sitemap.xml\\r\\n'
           || e'\\tsitemap: http://h' || id || '.test/sm' || (id % 3)
           || e'.xml\\r\\n'
           || 'SITEMAP:http://cdn.test/global' || id || e'.xml\\r\\n'
           || 'Disallow: /tmp'
         END AS body
  FROM base
),
l AS (
  SELECT host,
         regexp_extract_all(body, '(?im)^[ \\t]*sitemap:[ \\t]*(\\S+)', 1)
           AS sm
  FROM robots
)
SELECT host, CAST(i - 1 AS INT) AS seq, sm[i] AS sitemap_url
FROM l, (SELECT unnest(generate_series(1, 3)) AS i)
WHERE i <= len(sm)
""",
        "tfidf_keywords": """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(lower(text), '[^0-9a-z]+'),
           x -> len(x) > 0)) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         tf.tf * (CAST(round(
             ln(CAST(1 + (SELECT n FROM nd) AS DOUBLE) / (1 + dft.df))
             * 1000000.0, 0) AS BIGINT) + 1000000) AS score_micro
  FROM tf JOIN dft USING (term)
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score_micro DESC, term ASC
  ) AS rank FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_micro AS BIGINT) AS score_micro,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= 5
""",
        "aspect_bucket": """
WITH imgs AS (
  SELECT id AS image_id,
         256 + (id * 37) % 1280 AS w,
         256 + (id * 53) % 1280 AS h
  FROM (SELECT unnest(generate_series(0, 399)) AS id)
),
b(idx, bw, bh) AS (VALUES
  (0, 1024, 1024), (1, 1152, 896), (2, 896, 1152), (3, 1216, 832),
  (4, 832, 1216), (5, 1344, 768), (6, 768, 1344), (7, 1536, 640),
  (8, 640, 1536)
),
scored AS (
  SELECT image_id, w, h, idx, bw, bh,
         abs(CAST(w AS DOUBLE) / h - CAST(bw AS DOUBLE) / bh) AS dist
  FROM imgs, b
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY image_id ORDER BY dist ASC, idx ASC
  ) AS rn FROM scored
)
SELECT CAST(image_id AS BIGINT) AS image_id,
       CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       round(CAST(w AS DOUBLE) / h, 6) AS aspect,
       CAST(idx AS INT) AS bucket_idx,
       CAST(bw AS INT) AS bucket_w, CAST(bh AS INT) AS bucket_h
FROM r WHERE rn = 1
""",
        "url_traps": r"""
WITH u AS (
  SELECT id,
    CASE CAST(id % 8 AS INT)
      WHEN 0 THEN 'https://h' || (id % 7) || '.example.com/docs/page'
                  || id || '.html'
      WHEN 1 THEN 'https://h' || (id % 7) || '.example.com'
                  || repeat('/item', CAST(1 + id % 5 AS INT)) || '/p.html'
      WHEN 2 THEN 'https://h' || (id % 7) || '.example.com'
                  || repeat('/d', CAST(5 + id % 12 AS INT))
      WHEN 3 THEN 'https://h' || (id % 7) || '.example.com'
                  || '/page.jsp?a=1&JSESSIONID=x' || id
      WHEN 4 THEN 'https://h' || (id % 7) || '.example.com/s?a=1'
                  || repeat('&p=1', CAST(3 + id % 9 AS INT))
      WHEN 5 THEN 'https://h' || (id % 7) || '.example.com'
                  || repeat('/2024', CAST(1 + id % 4 AS INT)) || '/post'
      WHEN 6 THEN 'https://h' || (id % 7) || '.example.com/p?q='
                  || repeat('x', CAST(480 + (id % 10) * 8 AS INT))
      ELSE 'https://h' || (id % 7) || '.example.com/a/b/a?x=1'
    END AS url
  FROM range(400) t(id)
),
p AS (
  SELECT id, url,
    list_filter(string_split(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/'), s -> s <> '') AS segs,
    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
  FROM u
),
m AS (
  SELECT p.id, coalesce(x.mx, 0) AS mrep
  FROM p LEFT JOIN LATERAL (
    SELECT max(c) AS mx FROM (
      SELECT count(*) AS c FROM unnest(p.segs) AS t(s) GROUP BY s
    )
  ) x ON true
)
SELECT CAST(p.id AS BIGINT) AS id, p.url,
  CAST(len(p.segs) AS INT) AS path_depth,
  CAST(m.mrep AS INT) AS max_seg_repeat,
  CAST(CASE WHEN q = '' THEN 0
       ELSE len(list_filter(string_split(q, '&'), x -> x <> '')) END AS INT)
    AS n_query_params,
  regexp_matches(q,
    '(?i)(^|&)(phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)=')
    AS has_session_id,
  CAST(len(list_filter(p.segs,
    s -> regexp_matches(s, '^(19|20)[0-9]{2}$'))) AS INT) AS n_calendar_segs,
  CAST(length(p.url) AS INT) AS url_len,
  (max_seg_repeat >= 3 OR path_depth > 12 OR n_query_params > 8
   OR has_session_id OR url_len > 512 OR n_calendar_segs >= 3) AS is_trap
FROM p JOIN m ON p.id = m.id
""",
        "host_shard": """
SELECT CAST(id AS BIGINT) AS id,
  'host' || id || '.example.com' AS host,
  CAST((SELECT s FROM range(8) t(s)
        ORDER BY md5('host' || id || '.example.com:' || s) DESC
        LIMIT 1) AS INT) AS shard
FROM range(300) r(id)
""",
        "mime_sniff": _mime_sniff_oracle_sql(),
        "robots_longest_match": _robots_lm_oracle_sql(),
        "boilerplate_lines": _boilerplate_oracle_sql(),
        "budget_apportion": """
WITH h AS (
  SELECT 'h' || id || '.test' AS host,
    CAST((id * 37) % 500 + 1 AS BIGINT) AS pending
  FROM range(800) t(id)
),
tot AS (SELECT CAST(sum(pending) AS BIGINT) AS n FROM h),
b AS (
  SELECT host, pending,
    (10000 * pending) // n AS base,
    (10000 * pending) % n AS rem
  FROM h, tot
),
lo AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS r FROM b),
rk AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rn FROM b
)
SELECT host, pending,
  CAST(base + CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) AS budget
FROM rk, lo
""",
        "bpe_pairs": """
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            w -> w <> '')) AS w
  FROM documents
),
pairs AS (
  SELECT w[i] || w[i+1] AS pair
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 1)) AS i
  ) s
  WHERE len(w) >= 2
),
c AS (SELECT pair, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1)
SELECT pair, cnt,
  row_number() OVER (ORDER BY cnt DESC, pair ASC)::INT AS pair_rank
FROM c ORDER BY cnt DESC, pair ASC LIMIT 25
""",
        "warc_export": """
WITH d AS (
  SELECT doc_id,
    'https://' || source || '.example.org/doc/' || doc_id AS url,
    text AS payload
  FROM documents WHERE doc_id < 400
),
r AS (
  SELECT doc_id, url,
    CAST(strlen(payload) AS BIGINT) AS content_length,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || 'WARC-Payload-Digest: md5:' || md5(payload) || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(payload)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || payload || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM d
),
s AS (
  SELECT doc_id, url, content_length,
    CAST(strlen(record) AS BIGINT) AS record_length,
    md5(record) AS record_md5
  FROM r
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, url, content_length,
  record_length, record_md5,
  coalesce(sum(record_length) OVER (
    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS warc_offset
FROM s
""",
        # expected read-side fields re-derived relationally (record
        # rebuild + per-segment running sum) — the parser is never
        # consulted
        "warc_roundtrip": """
WITH d AS (
  SELECT doc_id,
    'https://' || source || '.example.org/doc/' || doc_id AS url,
    text AS payload,
    CAST(doc_id % 4 AS INT) AS seg_id
  FROM documents WHERE doc_id < 240
),
r AS (
  SELECT doc_id, seg_id, url,
    CAST(strlen(payload) AS BIGINT) AS content_length,
    md5(payload) AS payload_md5,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || 'WARC-Payload-Digest: md5:' || md5(payload) || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(payload)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || payload || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM d
)
SELECT seg_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY seg_id ORDER BY doc_id) - 1
       AS INT) AS rec_seq,
  coalesce(sum(CAST(strlen(record) AS BIGINT)) OVER (
    PARTITION BY seg_id ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS rec_offset,
  'response' AS warc_type,
  url AS target_uri,
  '2026-01-01T00:00:00Z' AS warc_date,
  content_length,
  payload_md5,
  true AS record_ok
FROM r
""",
        "image_dhash": _image_dhash_values_sql(),
        "image_letterbox": _image_letterbox_values_sql(),
        "image_meta_scrub": _image_meta_scrub_values_sql(),
        "cdc_chunks": _cdc_values_sql(),
        "embedding_quantize": """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
),
s AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
  FROM e
),
q AS (
  SELECT vec_id,
    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale,
    embedding
  FROM s
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
  ROUND(scale, 6) AS q_scale_r,
  CAST(p.pos AS BIGINT) AS dim,
  CAST(round(embedding[p.pos + 1]::DOUBLE * scale) AS INT) AS code
FROM q, (SELECT unnest(range(64)) AS pos) p
""",
        "archive_pipeline": r"""
WITH d AS (
  SELECT doc_id,
    'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
      || source || '.example.org/d/' || (doc_id % 200)
      || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&a=1' ELSE '?a=1' END
      || CASE WHEN doc_id % 7 = 0 THEN '&JSESSIONID=x' || doc_id
         ELSE '' END AS url,
    text AS payload
  FROM documents WHERE doc_id < 400
),
-- trap filter: by construction only the session-id signal can fire
-- (depth 2, <=3 params, short URLs, no repeats/years)
ok AS (
  SELECT * FROM d WHERE NOT regexp_matches(
    coalesce(regexp_extract(url, '\?([^#]*)', 1), ''),
    '(?i)(^|&)(phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)=')
),
p AS (
  SELECT doc_id, url, payload,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
    regexp_replace(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/{2,}', '/', 'g') AS pth,
    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
  FROM ok
),
k AS (
  SELECT doc_id, url, payload,
    scheme || '://' || host
    || CASE WHEN pth = '' THEN '/' ELSE pth END
    || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS dust_key
  FROM (
    SELECT *, coalesce(array_to_string(list_sort(list_filter(
      string_split(q, '&'),
      x -> x <> '' AND NOT regexp_matches(x,
        '(?i)^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)='
      ))), '&'), '') AS q2
    FROM p
  )
),
win AS (SELECT dust_key, min(doc_id) AS doc_id FROM k GROUP BY 1),
surv AS (
  SELECT k.doc_id, k.url, k.payload
  FROM k JOIN win ON k.doc_id = win.doc_id
),
r AS (
  SELECT doc_id, url,
    CAST(strlen(payload) AS BIGINT) AS content_length,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || 'WARC-Payload-Digest: md5:' || md5(payload) || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(payload)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || payload || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM surv
),
s AS (
  SELECT doc_id, url, content_length,
    CAST(strlen(record) AS BIGINT) AS record_length,
    coalesce(sum(strlen(record)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0)::BIGINT AS warc_offset
  FROM r
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
  array_to_string(list_reverse(string_split(
    regexp_replace(lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^www\.', ''),
    '.')), ',') || ')'
  || CASE WHEN regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) = ''
     THEN '/' ELSE regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) END AS surt_key,
  content_length, record_length, warc_offset
FROM s
""",
        "quantized_topk": """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150),
z AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m,
    embedding
  FROM e
),
q AS (
  SELECT vec_id,
    CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS s,
    list_transform(embedding, x -> CAST(round(
      x::DOUBLE * (CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END))
      AS BIGINT)) AS codes
  FROM z
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(generate_series(1, len(a.codes)),
      i -> a.codes[i] * b.codes[i])) AS int_dot,
    a.s AS qs, b.s AS cs
  FROM q a, q b
  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
),
r AS (
  SELECT query_id, neighbor_id, int_dot,
    ROUND(int_dot::DOUBLE / (qs * cs), 6) AS sim_q,
    row_number() OVER (
      PARTITION BY query_id
      ORDER BY ROUND(int_dot::DOUBLE / (qs * cs), 6) DESC, neighbor_id ASC
    )::INT AS rank
  FROM pairs
)
SELECT CAST(query_id AS BIGINT) AS query_id,
  CAST(neighbor_id AS BIGINT) AS neighbor_id,
  CAST(int_dot AS BIGINT) AS int_dot, sim_q, rank
FROM r WHERE rank <= 3
""",
        "warc_revisit": """
WITH d AS (
  SELECT doc_id,
    'https://' || source || '.example.org/doc/' || doc_id AS url,
    text AS payload
  FROM documents WHERE doc_id < 300
),
pr AS (
  SELECT doc_id,
    md5(CASE WHEN doc_id % 5 = 0 THEN text || 'old' ELSE text END)
      AS prior_md5
  FROM documents WHERE doc_id >= 50 AND doc_id < 300
),
j AS (
  SELECT d.doc_id, d.url, d.payload,
    CASE WHEN md5(d.payload) = pr.prior_md5
         THEN 'revisit' ELSE 'response' END AS record_type
  FROM d LEFT JOIN pr ON d.doc_id = pr.doc_id
),
r AS (
  SELECT doc_id, url, record_type,
    CASE WHEN record_type = 'revisit' THEN '' ELSE payload END AS body,
    md5(payload) AS digest
  FROM j
),
a AS (
  SELECT doc_id, record_type,
    CAST(strlen(body) AS BIGINT) AS content_length,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: ' || record_type || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || CASE WHEN record_type = 'revisit'
              THEN 'WARC-Refers-To-Digest: md5:' || digest
              ELSE 'WARC-Payload-Digest: md5:' || digest END
      || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(body)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || body || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM r
),
s AS (
  SELECT doc_id, record_type, content_length,
    CAST(strlen(record) AS BIGINT) AS record_length,
    md5(record) AS record_md5
  FROM a
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, record_type, content_length,
  record_length, record_md5,
  coalesce(sum(record_length) OVER (
    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS warc_offset
FROM s
""",
        "image_consensus": _consensus_values_sql(),
        # EXACT all-pairs oracle — deliberately no banding/candidacy
        # clause: the Spark side's 7-band pigeonhole must find every
        # pair at Hamming <= 6 or the hashes mismatch.
        "phash_guaranteed_recall": """
WITH imgs AS (
  SELECT i AS image_id,
         xor(xor((i % 40) * 2654435761, ((i % 40) * 40503) << 32),
             CASE i // 40
               WHEN 1 THEN 562958543486978
               WHEN 2 THEN 1154047421693820932
               WHEN 3 THEN 2308094843387643912
               WHEN 4 THEN 1
               ELSE 0 END) AS ph
  FROM generate_series(0, 199) t(i)
)
SELECT CAST(a.image_id AS BIGINT) AS id_a,
       CAST(b.image_id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
FROM imgs a JOIN imgs b ON a.image_id < b.image_id
WHERE bit_count(xor(a.ph, b.ph)) <= 6
""",
        "frontier_age": """
WITH f AS (
  SELECT CAST(user_id % 4 AS INT) AS priority_level,
    CAST((event_id * 7) % 50 + 1 AS BIGINT) AS round
  FROM events
)
SELECT priority_level,
  CAST(count(*) AS BIGINT) AS n_pending,
  CAST(min(round) AS BIGINT) AS oldest_round,
  CAST(max(60 - round) AS BIGINT) AS max_wait_rounds,
  ROUND(CAST(sum(60 - round) AS DOUBLE) / count(*), 6) AS mean_wait_rounds
FROM f GROUP BY 1
""",
        "raw_replay": r"""
WITH snap AS (
  SELECT doc_id,
    'http://replay.test/doc/' || doc_id || '.htm  ' || chr(10)
      || 'meta fetched=2017-04-05 status=200' || chr(10)
      || 'Para1<br>Para2<BR />Para3<BR/>' || chr(13)
      || substr(text, 1, 100)
      || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '0' ELSE '' END
      AS snapshot
  FROM documents WHERE doc_id < 1200
),
parsed AS (
  SELECT doc_id, string_split(snapshot, chr(10)) AS ls FROM snap
),
cut AS (
  SELECT doc_id, trim(ls[1]) AS url, ls[3:] AS body_ls FROM parsed
),
dropped AS (
  SELECT doc_id, url,
    CASE WHEN len(body_ls) > 0 AND body_ls[-1] = '0'
         THEN body_ls[1:len(body_ls) - 1] ELSE body_ls END AS body_ls
  FROM cut
)
SELECT doc_id, url,
  regexp_replace(array_to_string(body_ls, chr(10)),
                 '\r|<BR />|<BR>|<br />|<br/>|<br>', chr(10), 'g') AS source
FROM dropped
""",
        "dataset_split": """
WITH u AS (
  SELECT doc_id, lang,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8))
      ::UBIGINT)::DOUBLE / 4294967296.0 AS uu
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
  CASE WHEN uu < 0.1 THEN 'test'
       WHEN uu < 0.2 THEN 'val' ELSE 'train' END AS split,
  ROUND(uu, 9) AS split_u
FROM u
""",
        "param_relevance": """
WITH p AS (
  SELECT
    CASE WHEN id % 2 = 0
      THEN 'http://a.test/doc?id=' || (id % 50) || '&sess=' || (id % 3)
      ELSE 'http://b.test/list?page=' || (id % 4) || '&ref=' || (id % 5)
    END AS url,
    CASE WHEN id % 2 = 0
      THEN md5('A' || (id % 50)) ELSE md5('B' || (id % 4)) END AS h
  FROM range(600) t(id)
),
x AS (
  SELECT url, h,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
    regexp_extract(url,
      '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+[^?#]*)', 1) AS shp,
    list_filter(string_split(
      coalesce(regexp_extract(url, '\\?([^#]*)', 1), ''), '&'),
      q -> q <> '') AS params
  FROM p
),
ex AS (
  SELECT host, url, h, shp, params, unnest(params) AS param FROM x
),
k AS (
  SELECT host,
    regexp_extract(param, '^([^=]*)', 1) AS param_name,
    shp || '?' || coalesce(array_to_string(list_sort(
      list_filter(params, o -> o <> param)), '&'), '') AS base_key,
    url, h
  FROM ex
),
g AS (
  SELECT host, param_name, base_key,
    count(DISTINCT url) AS n_urls, count(DISTINCT h) AS n_hashes
  FROM k GROUP BY 1, 2, 3
)
SELECT host, param_name,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN n_urls >= 2 AND n_hashes = 1 THEN 1 ELSE 0 END)
    AS BIGINT) AS support,
  CAST(sum(CASE WHEN n_hashes > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS contradictions,
  (sum(CASE WHEN n_urls >= 2 AND n_hashes = 1 THEN 1 ELSE 0 END) >= 2
   AND sum(CASE WHEN n_hashes > 1 THEN 1 ELSE 0 END) = 0) AS irrelevant
FROM g GROUP BY 1, 2
""",
        "canonical_alias": r"""
WITH p AS (
  SELECT id,
    'http://s.test/p/' || id AS url,
    CASE CAST(id % 3 AS INT)
      WHEN 0 THEN '<html><head><link rel="canonical" href="http://s.test/p/'
                  || (id % 40) || '"></head><body>x</body></html>'
      WHEN 1 THEN '<html><head><LINK href=''http://s.test/p/' || (id % 40)
                  || ''' rel=canonical></head><body>y</body></html>'
      ELSE '<html><head></head><body>plain</body></html>'
    END AS body
  FROM range(300) t(id)
),
c AS (
  SELECT id, url,
    regexp_extract(body,
      '(?is)<link[^>]*rel\s*=\s*["'']?canonical["'']?[^>]*href\s*=\s*["'']([^"'']+)["'']',
      1) AS c1,
    regexp_extract(body,
      '(?is)<link[^>]*href\s*=\s*["'']([^"'']+)["''][^>]*rel\s*=\s*["'']?canonical["'']?',
      1) AS c2
  FROM p
)
SELECT CAST(id AS BIGINT) AS id, url,
  CASE WHEN c1 <> '' THEN c1 WHEN c2 <> '' THEN c2 END AS canonical_url,
  (CASE WHEN c1 <> '' THEN c1 WHEN c2 <> '' THEN c2 END IS NOT NULL
   AND CASE WHEN c1 <> '' THEN c1 WHEN c2 <> '' THEN c2 END <> url)
    AS is_alias
FROM c
""",
        "latency_budgets": """
WITH p AS (
  SELECT 'h' || (id % 40) || '.test' AS host,
    CAST(50 + (id * 13) % 400 AS BIGINT) AS fetch_ms
  FROM range(4000) t(id)
),
s AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_obs,
    CAST(sum(fetch_ms) AS BIGINT) AS sum_ms
  FROM p GROUP BY 1
)
SELECT host, n_obs, sum_ms,
  CAST(least(64, greatest(1, (10000 * n_obs) // sum_ms)) AS BIGINT)
    AS host_budget
FROM s
""",
        "cdx_index": """
WITH d AS (
  SELECT doc_id,
    'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
      || source || '.example.org/doc/' || doc_id
      || CASE WHEN doc_id % 4 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
    text AS payload
  FROM documents WHERE doc_id < 300
),
r AS (
  SELECT doc_id, url,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || 'WARC-Payload-Digest: md5:' || md5(payload) || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(payload)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || payload || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM d
),
s AS (
  SELECT doc_id, url,
    CAST(strlen(record) AS BIGINT) AS record_length,
    coalesce(sum(strlen(record)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0)::BIGINT AS warc_offset
  FROM r
),
k AS (
  SELECT doc_id, url, record_length, warc_offset,
    regexp_replace(lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^www\\.', '') AS host,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS path_q
  FROM s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  array_to_string(list_reverse(string_split(host, '.')), ',') || ')'
    || CASE WHEN path_q = '' THEN '/' ELSE path_q END AS surt_key,
  warc_offset, record_length
FROM k
""",
        "dust_normalize": r"""
WITH u AS (
  SELECT id,
    CASE CAST(id % 6 AS INT)
      WHEN 0 THEN 'HTTPS://WWW.Example.COM/a/p' || (id % 50)
                  || '?utm_source=x&b=2&a=1'
      WHEN 1 THEN 'http://h.test//a//p' || (id % 50) || '/#frag'
      WHEN 2 THEN 'http://h.test/p' || (id % 50) || '?PHPSESSID=zz&z=9&m=5'
      WHEN 3 THEN 'http://h.test/p' || (id % 50) || '?'
      WHEN 4 THEN 'https://h.test'
      ELSE 'http://h.test/p' || (id % 50) || '?b=2&a=1&b=1'
    END AS url
  FROM range(300) t(id)
),
p AS (
  SELECT id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
    regexp_replace(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/{2,}', '/', 'g') AS pth,
    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
  FROM u
),
n AS (
  SELECT id, url, scheme, host,
    CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
      x -> x <> '' AND NOT regexp_matches(x,
        '(?i)^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|phpsessid|jsessionid|sessionid|session_id|sid|aspsessionid[a-z]*)='
      ))), '&'), '') AS q2
  FROM p
)
SELECT CAST(id AS BIGINT) AS id, url,
  scheme || '://' || host || pth
    || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS dust_key
FROM n
""",
        "snapshot_diff": """
WITH old AS (
  SELECT 'http://h' || (doc_id % 37) || '.test/d/' || doc_id AS url,
    md5(text) AS content_md5
  FROM documents WHERE doc_id < 400
),
new AS (
  SELECT 'http://h' || (doc_id % 37) || '.test/d/' || doc_id AS url,
    md5(CASE WHEN doc_id % 7 = 0 THEN text || 'v2' ELSE text END)
      AS content_md5
  FROM documents WHERE doc_id >= 100 AND doc_id < 500
)
SELECT coalesce(o.url, n.url) AS url,
  o.content_md5 AS old_hash, n.content_md5 AS new_hash,
  CASE WHEN o.content_md5 IS NULL THEN 'added'
       WHEN n.content_md5 IS NULL THEN 'removed'
       WHEN o.content_md5 <> n.content_md5 THEN 'changed'
       ELSE 'unchanged' END AS change
FROM old o FULL OUTER JOIN new n ON o.url = n.url
""",
        "domain_gate": """
WITH s AS (
  SELECT doc_id, source,
    CAST(length(text) % 997 AS BIGINT) AS score_milli
  FROM documents
),
d AS (
  SELECT source, CAST(count(*) AS BIGINT) AS domain_docs,
    CAST(sum(score_milli) AS BIGINT) AS sum_milli
  FROM s GROUP BY 1
)
SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.source, s.score_milli,
  d.domain_docs,
  ROUND(CAST(d.sum_milli AS DOUBLE) / d.domain_docs, 6)
    AS domain_mean_milli,
  (d.domain_docs >= 50 AND d.sum_milli < 450 * d.domain_docs)
    AS domain_blocked
FROM s JOIN d USING (source)
""",
        "quality_quantile_gate": """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) + 1.0 AS words
  FROM documents
),
r AS (
  SELECT doc_id,
         round(punct / greatest(n, 1.0), 6) AS punct_ratio,
         round(n / words, 4) AS mean_word_len, n
  FROM q
),
s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(round(round(
           least(n / 10.0, 50.0)
           + CASE WHEN punct_ratio > 0.001 AND punct_ratio < 0.2 THEN 25.0 ELSE 0.0 END
           + CASE WHEN mean_word_len > 3.0 AND mean_word_len < 12.0 THEN 25.0 ELSE 0.0 END,
         4) * 10000) AS BIGINT) AS score_m4
  FROM r
),
c AS (SELECT score_m4 AS v, count(*) AS cnt FROM s GROUP BY 1),
k AS (SELECT CAST(greatest(ceil(0.3 * count(*)), 1) AS BIGINT) AS kk FROM s),
cum AS (
  SELECT v, sum(cnt) OVER (
    ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cge
  FROM c
),
t AS (SELECT max(v) AS thr FROM cum, k WHERE cge >= kk)
SELECT s.doc_id, s.score_m4, CAST(t.thr AS BIGINT) AS score_threshold
FROM s, t WHERE s.score_m4 >= t.thr
""",
        "bpe_train": _bpe_train_values_sql(),
        "audio_trim": _audio_trim_values_sql(),
        "image_orientation": _orientation_values_sql(),
        "speech_pipeline": _speech_chain_values_sql(),
        "privacy_pipeline": _privacy_values_sql(),
        # three plain GROUP BYs unioned — the cube must agree with them
        "corpus_datasheet": r"""
WITH b AS (
  SELECT lang, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS t,
    length(text) AS c,
    CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS e
  FROM documents
)
SELECT 'total:corpus' AS metric, count(*)::BIGINT AS n_docs,
       sum(t)::BIGINT AS n_tokens, sum(c)::BIGINT AS n_chars,
       sum(e)::BIGINT AS n_empty
FROM b
UNION ALL
SELECT 'lang:' || COALESCE(lang, 'null'), count(*)::BIGINT,
       sum(t)::BIGINT, sum(c)::BIGINT, sum(e)::BIGINT
FROM b GROUP BY lang
UNION ALL
SELECT 'source:' || COALESCE(source, 'null'), count(*)::BIGINT,
       sum(t)::BIGINT, sum(c)::BIGINT, sum(e)::BIGINT
FROM b GROUP BY source
""",
        # both md5 rank levels re-derived relationally
        "epoch_shard_order": """
WITH t AS (
  SELECT i AS image_id, i // 50 AS shard_idx FROM range(500) r(i)
),
sh AS (
  SELECT shard_idx,
    ROW_NUMBER() OVER (
      ORDER BY md5(CAST(shard_idx AS VARCHAR) || ':2:order'),
               shard_idx) - 1 AS shard_order
  FROM (SELECT DISTINCT shard_idx FROM t)
),
s AS (
  SELECT image_id, shard_idx,
    ROW_NUMBER() OVER (
      PARTITION BY shard_idx
      ORDER BY md5(CAST(image_id AS VARCHAR) || ':2:order'),
               image_id) - 1 AS sample_order
  FROM t
)
SELECT CAST(s.image_id AS BIGINT) AS image_id,
       CAST(s.shard_idx AS BIGINT) AS shard_idx,
       CAST(s.sample_order AS BIGINT) AS sample_order,
       CAST(sh.shard_order AS BIGINT) AS shard_order,
       CAST(2 AS INT) AS epoch
FROM s JOIN sh USING (shard_idx)
""",
        # band candidacy + recursive CC + the contrastive layout
        # windows, chained — the layout flagship's full re-derivation
        "layout_pipeline": """
WITH RECURSIVE
imgs AS (
  SELECT i AS image_id,
         CASE WHEN i // 60 > 0
              THEN xor(xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32),
                       CAST(power(2, (i // 60) * 2) AS BIGINT))
              ELSE xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32)
         END AS ph
  FROM generate_series(0, 299) t(i)
),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM imgs a JOIN imgs b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.ph, b.ph)) <= 6
    AND ((a.ph >> 0) & 65535 = (b.ph >> 0) & 65535
      OR (a.ph >> 16) & 65535 = (b.ph >> 16) & 65535
      OR (a.ph >> 32) & 65535 = (b.ph >> 32) & 65535
      OR (a.ph >> 48) & 65535 = (b.ph >> 48) & 65535)
),
sym AS (SELECT id_a AS s, id_b AS t FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
reach(node, comp) AS (
  SELECT image_id, image_id FROM imgs
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
),
clus AS (SELECT node AS image_id, min(comp) AS cluster
         FROM reach GROUP BY node),
keyed AS (
  SELECT image_id, cluster,
         'c:' || CAST(cluster AS VARCHAR) AS cluster_key
  FROM clus
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY cluster_key) AS cluster_size
  FROM keyed
),
g AS (
  SELECT *,
         ROW_NUMBER() OVER (
           ORDER BY cluster_size DESC, cluster_key, image_id) - 1
           AS layout_rank
  FROM sized
),
params AS (
  SELECT GREATEST((COUNT(*) + 15) // 16, MAX(cluster_size), 1) AS nb
  FROM sized
)
SELECT CAST(image_id AS BIGINT) AS image_id,
       CAST(cluster AS BIGINT) AS cluster,
       cluster_key,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(layout_rank AS BIGINT) AS layout_rank,
       CAST(layout_rank % nb AS BIGINT) AS batch_idx
FROM g, params
""",
        "curation_pipeline": """
WITH RECURSIVE
imgs AS (
  SELECT i AS image_id,
         CAST(24 + (i % 10) * 8 AS INTEGER) AS w,
         CAST(24 + (i % 7) * 4 AS INTEGER) AS h,
         CAST(8 + (i * 13) % 23 AS BIGINT) AS cap_len,
         CAST((24 + (i % 10) * 8) AS BIGINT) * (24 + (i % 7) * 4) AS area,
         CASE WHEN i // 60 > 0
              THEN xor(xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32),
                       CAST(power(2, (i // 60) * 2) AS BIGINT))
              ELSE xor((i % 60) * 2654435761, ((i % 60) * 40503) << 32)
         END AS ph
  FROM generate_series(0, 299) t(i)
),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM imgs a JOIN imgs b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.ph, b.ph)) <= 6
    AND ((a.ph >> 0) & 65535 = (b.ph >> 0) & 65535
      OR (a.ph >> 16) & 65535 = (b.ph >> 16) & 65535
      OR (a.ph >> 32) & 65535 = (b.ph >> 32) & 65535
      OR (a.ph >> 48) & 65535 = (b.ph >> 48) & 65535)
),
sym AS (SELECT id_a AS s, id_b AS t FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
reach(node, comp) AS (
  SELECT image_id, image_id FROM imgs
  UNION
  SELECT sym.t, reach.comp FROM reach JOIN sym ON sym.s = reach.node
),
clus AS (SELECT node AS image_id, min(comp) AS cluster
         FROM reach GROUP BY node),
j AS (SELECT i.*, c.cluster FROM imgs i JOIN clus c USING (image_id)),
szs AS (SELECT cluster, count(*) AS cluster_size FROM j GROUP BY cluster),
reps AS (
  SELECT * FROM (
    SELECT j.*, s.cluster_size,
           row_number() OVER (
             PARTITION BY j.cluster
             ORDER BY j.area DESC, j.cap_len DESC, j.image_id ASC
           ) AS rn
    FROM j JOIN szs s USING (cluster)
  ) WHERE rn = 1
),
buckets(bucket_id, bucket_w, bucket_h) AS (VALUES
  (0,16,64),(1,16,56),(2,24,48),(3,24,40),(4,32,32),
  (5,40,24),(6,48,24),(7,56,16),(8,64,16)
),
bucked AS (
  SELECT * FROM (
    SELECT r.*, b.bucket_id,
           ROW_NUMBER() OVER (
             PARTITION BY r.image_id
             ORDER BY abs(CAST(r.w AS BIGINT) * b.bucket_h
                          - CAST(r.h AS BIGINT) * b.bucket_w), b.bucket_id
           ) AS pick
    FROM reps r CROSS JOIN buckets b
  ) WHERE pick = 1
),
offs AS (
  SELECT *, COALESCE(sum(area * 3) OVER (
    ORDER BY image_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_byte
  FROM bucked
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(image_id AS BIGINT) AS image_id,
       CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
       CAST(area AS BIGINT) AS area,
       CAST(cap_len AS BIGINT) AS cap_len,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(bucket_id AS INTEGER) AS bucket_id,
       CAST(floor(start_byte / 100000.0) AS BIGINT) AS shard_idx
FROM offs
""",
        "pagerank_priority": """
WITH nodes AS (SELECT i AS node FROM generate_series(0, 63) t(i)),
edges AS (
  SELECT i AS src, (2 * i + 1) % 64 AS dst FROM generate_series(0, 63) t(i)
  UNION ALL
  SELECT i, i // 2 FROM generate_series(0, 63) t(i) WHERE i % 2 = 0
),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / 64 AS rank FROM nodes),
r1 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r0.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r0 ON r0.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
),
r2 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r1.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r1 ON r1.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
),
r3 AS (
  SELECT n.node,
         0.5 / 64 + 0.5 * coalesce(sum(r2.rank / deg.outd), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r2 ON r2.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
),
s AS (
  SELECT node, CAST(floor(rank * 1048576) AS BIGINT) AS scaled FROM r3
),
mx AS (SELECT max(scaled) AS m FROM s),
f AS (SELECT i AS node FROM generate_series(0, 69) t(i))
SELECT CAST(f.node AS BIGINT) AS node,
       'http://pr.test/n/' || f.node AS url,
       CAST(CASE WHEN s.scaled IS NULL THEN 0
                 WHEN s.scaled >= mx.m THEN 3
                 WHEN s.scaled * 2 >= mx.m THEN 2
                 WHEN s.scaled * 4 >= mx.m THEN 1
                 ELSE 0 END AS INT) AS priority_level
FROM f LEFT JOIN s ON s.node = f.node, mx
""",
        "cluster_representatives": """
WITH d AS (
  SELECT doc_id, n_chars,
         doc_id % 60 AS component,
         (doc_id * 2654435761) % 1000 AS q2
  FROM documents
),
r AS (
  SELECT *,
         count(*) OVER (PARTITION BY component) AS cluster_size,
         row_number() OVER (
           PARTITION BY component
           ORDER BY n_chars DESC, q2 DESC, doc_id ASC
         ) AS rn
  FROM d
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(q2 AS BIGINT) AS q2,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM r WHERE rn = 1
""",
        "hard_negative_mine": """
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
e AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, e.label, bk.bucket
  FROM embeddings e JOIN buckets bk ON bk.vec_id = e.vec_id
),
pairs AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.v, c.v), 6) AS sim
  FROM e a JOIN e c ON a.bucket = c.bucket AND a.label <> c.label
),
r AS (
  SELECT anchor_id, neighbor_id, sim,
         row_number() OVER (
           PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC
         ) AS rank
  FROM pairs WHERE sim >= 0.2
)
SELECT CAST(anchor_id AS BIGINT) AS anchor_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
        "shard_manifest": """
WITH s AS (
  SELECT doc_id AS image_id,
         CAST(n_chars * 7 + 100 AS BIGINT) AS n_bytes
  FROM documents
),
o AS (
  SELECT image_id, n_bytes,
         COALESCE(sum(n_bytes) OVER (
           ORDER BY image_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_byte
  FROM s
),
a AS (
  SELECT image_id, n_bytes,
         CAST(floor(start_byte / 500000.0) AS BIGINT) AS shard_idx,
         start_byte - CAST(floor(start_byte / 500000.0) AS BIGINT) * 500000
           AS off
  FROM o
)
SELECT CAST(shard_idx AS BIGINT) AS shard_idx,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(min(image_id) AS BIGINT) AS first_key,
       CAST(max(image_id) AS BIGINT) AS last_key,
       md5(string_agg(image_id || ':' || n_bytes, ',' ORDER BY off))
         AS content_md5
FROM a GROUP BY shard_idx
""",
        # both manifests re-derived relationally, then the status CASE
        "manifest_diff": """
WITH s1 AS (
  SELECT doc_id AS image_id,
         CAST(n_chars * 7 + 100 AS BIGINT) AS n_bytes
  FROM documents
  UNION ALL
  SELECT 9000000 + i, 200000 FROM range(5) t(i)
),
s2 AS (
  SELECT doc_id AS image_id,
         CAST(n_chars * 7 + 100
              + CASE WHEN doc_id = 3 THEN 50 ELSE 0 END AS BIGINT)
           AS n_bytes
  FROM documents
  UNION ALL
  SELECT 9500000 + i, 400000 FROM range(4) t2(i)
),
o1 AS (
  SELECT image_id, n_bytes,
         COALESCE(sum(n_bytes) OVER (
           ORDER BY image_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_byte
  FROM s1
),
o2 AS (
  SELECT image_id, n_bytes,
         COALESCE(sum(n_bytes) OVER (
           ORDER BY image_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_byte
  FROM s2
),
a1 AS (
  SELECT image_id, n_bytes,
         CAST(floor(start_byte / 500000.0) AS BIGINT) AS shard_idx,
         start_byte
           - CAST(floor(start_byte / 500000.0) AS BIGINT) * 500000 AS off
  FROM o1
),
a2 AS (
  SELECT image_id, n_bytes,
         CAST(floor(start_byte / 500000.0) AS BIGINT) AS shard_idx,
         start_byte
           - CAST(floor(start_byte / 500000.0) AS BIGINT) * 500000 AS off
  FROM o2
),
m1 AS (
  SELECT shard_idx, count(*)::BIGINT AS old_samples,
         md5(string_agg(image_id || ':' || n_bytes, ',' ORDER BY off))
           AS old_md5
  FROM a1 GROUP BY shard_idx
),
m2 AS (
  SELECT shard_idx, count(*)::BIGINT AS new_samples,
         md5(string_agg(image_id || ':' || n_bytes, ',' ORDER BY off))
           AS new_md5
  FROM a2 GROUP BY shard_idx
)
SELECT COALESCE(m1.shard_idx, m2.shard_idx) AS shard_idx,
  CASE WHEN m1.shard_idx IS NULL THEN 'added'
       WHEN m2.shard_idx IS NULL THEN 'removed'
       WHEN old_md5 <> new_md5 THEN 'changed'
       ELSE 'unchanged' END AS status,
  old_md5, new_md5, old_samples, new_samples
FROM m1 FULL OUTER JOIN m2 USING (shard_idx)
""",
        "image_decontaminate": """
WITH corpus AS (
  SELECT i AS image_id, i % 80 AS g, i // 80 AS j
  FROM generate_series(0, 399) t(i)
),
hashed AS (
  SELECT CAST(image_id AS BIGINT) AS image_id,
    xor(xor(g * 2654435761, (g * 40503) << 32),
        CASE j WHEN 1 THEN 562958543486978
               WHEN 2 THEN 2308094843387643912
               WHEN 3 THEN 2308094843387643928
               WHEN 4 THEN 6148914691236517205
               ELSE 0 END) AS phash
  FROM corpus
),
evalset AS (
  SELECT xor(g * 2654435761, (g * 40503) << 32) AS phash
  FROM generate_series(0, 39) t(g)
)
SELECT c.image_id, c.phash
FROM hashed c
WHERE NOT EXISTS (
  SELECT 1 FROM evalset e WHERE bit_count(xor(c.phash, e.phash)) <= 6
)
""",
        "caption_boilerplate": """
WITH caps AS (
  SELECT doc_id,
    CASE doc_id % 10
      WHEN 0 THEN 'Stock  Photo'
      WHEN 1 THEN ' stock photo '
      WHEN 2 THEN 'STOCK PHOTO'
      WHEN 3 THEN 'An Image'
      WHEN 4 THEN 'an  image'
      ELSE 'photo of item ' || doc_id
    END AS caption
  FROM documents
),
norm AS (
  SELECT doc_id,
         regexp_replace(trim(lower(caption)), '\\s+', ' ', 'g')
           AS caption_norm
  FROM caps
),
freq AS (
  SELECT caption_norm, count(*) AS n FROM norm GROUP BY caption_norm
)
SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
       n.caption_norm,
       CAST(CASE WHEN f.n >= 50 THEN f.n ELSE 0 END AS BIGINT)
         AS caption_freq,
       f.n >= 50 AS caption_boilerplate
FROM norm n JOIN freq f USING (caption_norm)
""",
        "image_quality_gate": _image_quality_values_sql(),
        "text_overlay_gate": _text_overlay_values_sql(),
        # serial running sum + UNNEST(range) fan-out over the sequences
        # each document covers
        "sequence_spans": r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM documents
),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM d
),
s AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n,
         CAST(cum - n AS BIGINT) AS strt
  FROM c WHERE n > 0
),
f AS (
  SELECT doc_id, n, strt,
         UNNEST(range(strt // 32, (strt + n - 1) // 32 + 1)) AS seq
  FROM s
)
SELECT CAST(seq AS BIGINT) AS seq_idx,
       CAST(doc_id AS BIGINT) AS doc_id,
       GREATEST(0, strt - seq * 32)::BIGINT AS span_begin,
       LEAST(32, strt + n - seq * 32)::BIGINT AS span_end,
       (seq - strt // 32)::BIGINT AS doc_span_idx
FROM f
""",
        "politeness_audit": """
WITH t AS (
  SELECT i // 60 AS round, (i * 7) % 9 AS hid FROM range(600) r(i)
),
g AS (
  SELECT round, 'h' || hid || '.test' AS host,
         COUNT(*)::BIGINT AS n_fetches
  FROM t GROUP BY 1, 2
),
b(host, hb) AS (VALUES ('h0.test', 10))
SELECT CAST(round AS BIGINT) AS round, host, n_fetches,
  COALESCE(hb, 6)::BIGINT AS budget,
  n_fetches > COALESCE(hb, 6) AS exceeded
FROM g LEFT JOIN b USING (host)
""",
        "precision_curation": _precision_curation_values_sql(),
        "psnr_verify": _psnr_verify_values_sql(),
        # full re-derivation with plain windows: the Spark side must
        # reproduce the (size DESC, key, id) layout rank with the
        # two-stage distributed prefix sum and the driver-scalar
        # n_batches = GREATEST(ceil(N/B), max cluster size)
        "contrastive_batches": """
WITH rows_ AS (
  SELECT i AS image_id,
         CASE WHEN i < 40 THEN 1000
              WHEN i < 200 THEN i % 13
              ELSE NULL END AS cluster_id
  FROM generate_series(0, 299) t(i)
),
keyed AS (
  SELECT image_id, cluster_id,
         CASE WHEN cluster_id IS NOT NULL
              THEN 'c:' || CAST(cluster_id AS VARCHAR)
              ELSE 's:' || CAST(image_id AS VARCHAR) END AS cluster_key
  FROM rows_
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY cluster_key) AS cluster_size
  FROM keyed
),
g AS (
  SELECT *,
         ROW_NUMBER() OVER (
           ORDER BY cluster_size DESC, cluster_key, image_id) - 1
           AS layout_rank
  FROM sized
),
params AS (
  SELECT GREATEST((COUNT(*) + 7) // 8, MAX(cluster_size), 1) AS nb
  FROM sized
)
SELECT CAST(image_id AS BIGINT) AS image_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       cluster_key,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(layout_rank AS BIGINT) AS layout_rank,
       CAST(layout_rank % nb AS BIGINT) AS batch_idx
FROM g, params
""",
        "crossmodal_recall": _crossmodal_recall_values_sql(),
        "jpeg_meta_scrub": _jpeg_scrub_values_sql(),
        "crawl_golden_sitemap": _golden_sitemap_values_sql(),
        "crawl_golden_revisit": _golden_revisit_values_sql(),
        # counts → epoch caps → whole-epoch replication + md5-uniform
        # fractional epoch, re-derived relationally end to end
        "epoch_mix": """
WITH c AS (
  SELECT lang, COUNT(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
t(lang, target) AS (VALUES ('en', 900), ('zh', 350), ('es', 120)),
p AS (
  SELECT c.lang, n, LEAST(CAST(target AS BIGINT), 3 * n) AS eff
  FROM c JOIN t USING (lang)
),
p2 AS (
  SELECT lang, CAST(eff // n AS INT) AS fulle,
         (eff % n) / CAST(n AS DOUBLE) AS rate
  FROM p
),
r AS (
  SELECT d.doc_id, d.lang,
    p2.fulle + CASE WHEN
      (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'epoch'), 1, 8)
       )::UBIGINT)::DOUBLE / 4294967296.0 < p2.rate
      THEN 1 ELSE 0 END AS n_repeats
  FROM documents d JOIN p2 USING (lang)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_repeats AS INT) AS n_repeats,
       CAST(UNNEST(range(0, CAST(n_repeats AS BIGINT))) AS INT) AS epoch
FROM r
WHERE n_repeats > 0
""",
        # bloom_prefilter / cuckoo_prefilter: probabilistic survivor sets
        # (bit-array membership) — no ANSI-SQL equivalent → rows-only
        # checks (intentional); their FPR and exactness guarantees are
        # unit-tested instead (tests/test_operators.py).
        "watermark_gate": _watermark_values_sql(),
        "rot_invariant_hash": _rot_invariant_values_sql(),
        "crawl_golden_conditional": _golden_conditional_values_sql(),
        "crawl_golden_bytebudget": _golden_bytebudget_values_sql(),
        "crawl_golden_ttl": _golden_ttl_values_sql(),
        "crawl_golden_hostcap": _golden_hostcap_values_sql(),
        "crawl_golden_combined": _golden_combined_values_sql(),
        "host_report": """
WITH t AS (
  SELECT 'h' || CAST(user_id % 6 AS VARCHAR) || '.test' AS host,
    CASE event_id % 8
      WHEN 0 THEN 200 WHEN 1 THEN 200 WHEN 2 THEN 200 WHEN 3 THEN 304
      WHEN 4 THEN 301 WHEN 5 THEN 404 WHEN 6 THEN 503 ELSE 0
    END AS status,
    event_id % 5000 AS bytes_received,
    (event_id % 900) + 1 AS latency_ms,
    (event_id % 3) + 1 AS n_attempts
  FROM events WHERE event_id < 2000
)
SELECT host,
  COUNT(*)::BIGINT AS n_fetches,
  SUM(CASE WHEN status BETWEEN 200 AND 299 THEN 1 ELSE 0 END)::BIGINT
    AS n_ok,
  SUM(CASE WHEN status = 304 THEN 1 ELSE 0 END)::BIGINT
    AS n_not_modified,
  SUM(CASE WHEN status BETWEEN 300 AND 399 AND status <> 304
           THEN 1 ELSE 0 END)::BIGINT AS n_redirect,
  SUM(CASE WHEN status BETWEEN 400 AND 499 THEN 1 ELSE 0 END)::BIGINT
    AS n_client_err,
  SUM(CASE WHEN status BETWEEN 500 AND 599 THEN 1 ELSE 0 END)::BIGINT
    AS n_server_err,
  SUM(CASE WHEN status = 0 THEN 1 ELSE 0 END)::BIGINT AS n_dead,
  SUM(CASE WHEN status IN (429, 503) THEN 1 ELSE 0 END)::BIGINT
    AS n_throttled,
  SUM(bytes_received)::BIGINT AS total_bytes,
  SUM(n_attempts)::BIGINT AS total_attempts,
  SUM(latency_ms)::BIGINT AS sum_latency_ms,
  COUNT(latency_ms)::BIGINT AS n_latency_obs,
  ((SUM(latency_ms) * 1000) // COUNT(latency_ms))::BIGINT
    AS mean_latency_mu
FROM t GROUP BY host
""",
        "rot_dedup_pipeline": _rot_dedup_values_sql(),
        "rot_near_dup": _rot_near_values_sql(),
        "rot_dedup_clusters": _rot_clusters_values_sql(),
        "audio_quality": _audio_quality_values_sql(),
        "keyword_screen": r"""
WITH caps AS (
  SELECT doc_id,
    substr(text, 1, 40)
    || CASE WHEN doc_id % 5 = 0 THEN ' shutterstocky' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' photo by ShutterStock via shutterstock' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' No Image Available' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' NSFW' ELSE '' END AS caption
  FROM documents WHERE doc_id < 500
),
counted AS (
  SELECT doc_id, caption,
    len(regexp_extract_all(caption,
      '(?i)\b(?:explicit\ content|nsfw)\b'))::BIGINT AS kw_nsfw,
    len(regexp_extract_all(caption,
      '(?i)\b(?:coming\ soon|image\ not\ found|lorem\ ipsum|no\ image\ available)\b'))::BIGINT
      AS kw_placeholder,
    len(regexp_extract_all(caption,
      '(?i)\b(?:alamy|dreamstime|getty\ images|istockphoto|shutterstock)\b'))::BIGINT
      AS kw_stock_site
  FROM caps
)
SELECT doc_id, caption, kw_nsfw, kw_placeholder, kw_stock_site,
  (kw_nsfw > 0 OR kw_placeholder > 0 OR kw_stock_site > 0) AS kw_flagged
FROM counted
""",
        "refetch_pipeline": r"""
WITH hist AS (
  SELECT 'http://recrawl.test/p/' || (event_id % 300) AS url,
         ts AS fetch_ts, md5(event_type) AS content_hash,
         event_id AS seq
  FROM events
),
flagged AS (
  SELECT url, CAST(floor(epoch(fetch_ts)) AS BIGINT) AS unix_s,
    CASE WHEN lag(content_hash) OVER (
             PARTITION BY url ORDER BY fetch_ts, seq) IS NOT NULL
         AND lag(content_hash) OVER (
             PARTITION BY url ORDER BY fetch_ts, seq) <> content_hash
         THEN 1 ELSE 0 END AS chg
  FROM hist
),
agg AS (
  SELECT url, count(*) AS n_fetches, sum(chg) AS n_changes,
         min(unix_s) AS first_unix, max(unix_s) AS last_unix
  FROM flagged GROUP BY url
),
due AS (
  SELECT url, 'age_due' AS reason, 3 AS reason_rank
  FROM (
    SELECT url, last_unix,
      CASE WHEN n_fetches <= 1 THEN 2592000
           ELSE least(greatest(
                  CAST(floor((last_unix - first_unix)::DOUBLE
                             / (n_changes + 1)) AS BIGINT),
                  3600), 2592000) END AS iv
    FROM agg
  ) WHERE last_unix + iv <= 1707523200
),
docs AS (
  SELECT doc_id, 'http://recrawl.test/p/' || doc_id AS loc
  FROM documents WHERE doc_id < 400
),
e AS (
  SELECT loc,
    CASE WHEN doc_id % 5 = 0 THEN NULL
         WHEN doc_id % 5 = 1 THEN
           '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15'
         ELSE '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15T0'
              || CAST(doc_id % 10 AS VARCHAR) || ':30:00Z'
    END AS lastmod
  FROM docs
),
p AS (
  SELECT loc,
    '2024-0' || CAST((doc_id % 4) + 3 AS VARCHAR) || '-01T00:00:00Z'
      AS fetched_at
  FROM docs WHERE doc_id % 3 <> 0
),
en AS (
  SELECT loc,
    CASE WHEN regexp_matches(lm2,
      '^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|\+00:00)?)?$')
      THEN CASE WHEN strlen(lm2) = 10
                THEN lm2 || 'T00:00:00Z' ELSE lm2 END
    END AS lastmod_norm
  FROM (SELECT loc, regexp_replace(lastmod, '\+00:00$', 'Z') AS lm2 FROM e) s
),
sm AS (
  SELECT en.loc AS url,
    CASE WHEN p.fetched_at IS NULL THEN 'never_fetched'
         WHEN en.lastmod_norm IS NOT NULL AND en.lastmod_norm > p.fetched_at
         THEN 'modified' END AS reason
  FROM en LEFT JOIN p ON en.loc = p.loc
),
sm2 AS (
  SELECT url, reason,
    CASE WHEN reason = 'modified' THEN 1 ELSE 2 END AS reason_rank
  FROM sm WHERE reason IS NOT NULL
),
u AS (
  SELECT * FROM due UNION ALL SELECT * FROM sm2
),
best AS (
  SELECT url, min(reason_rank) AS reason_rank FROM u GROUP BY url
)
SELECT b.url, 'recrawl.test' AS host,
  CASE b.reason_rank WHEN 1 THEN 'modified'
       WHEN 2 THEN 'never_fetched' ELSE 'age_due' END AS reason,
  CAST(b.reason_rank AS INT) AS reason_rank
FROM best b
""",
        "sitemap_refetch": """
WITH docs AS (
  SELECT doc_id,
    'http://s' || CAST(doc_id % 7 AS VARCHAR) || '.test/p/'
      || CAST(doc_id AS VARCHAR) AS loc
  FROM documents WHERE doc_id < 400
),
e AS (
  SELECT loc,
    CASE WHEN doc_id % 5 = 0 THEN NULL
         WHEN doc_id % 5 = 1 THEN
           CASE WHEN doc_id % 4 = 0 THEN 'not-a-date'
                WHEN doc_id % 4 = 1 THEN
                  '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15T0'
                  || CAST(doc_id % 10 AS VARCHAR) || ':30Z'
                WHEN doc_id % 4 = 2 THEN
                  '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15T0'
                  || CAST(doc_id % 10 AS VARCHAR) || ':30:45.25Z'
                ELSE
                  '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15T0'
                  || CAST(doc_id % 10 AS VARCHAR) || ':30:00'
           END
         WHEN doc_id % 5 = 2 THEN
           '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15'
         ELSE '2024-0' || CAST((doc_id % 9) + 1 AS VARCHAR) || '-15T0'
              || CAST(doc_id % 10 AS VARCHAR) || ':30:00Z'
    END AS lastmod
  FROM docs
),
p AS (
  SELECT loc,
    '2024-0' || CAST((doc_id % 4) + 3 AS VARCHAR) || '-01T00:00:00Z'
      AS fetched_at
  FROM docs WHERE doc_id % 3 <> 0
),
en AS (
  -- canonical-precision re-derivation (r5 rule): strip Z, truncate
  -- fractional seconds, pad date-only to midnight and minute forms
  -- with :00, re-stamp Z — independent string surgery, same contract
  SELECT loc,
    CASE WHEN valid IS NOT NULL THEN
      CASE WHEN regexp_matches(t, '^\\d{4}-\\d{2}-\\d{2}$')
             THEN t || 'T00:00:00Z'
           WHEN regexp_matches(t, '^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}$')
             THEN t || ':00Z'
           ELSE t || 'Z' END
    END AS lastmod_norm
  FROM (
    SELECT loc, valid,
      regexp_replace(regexp_replace(valid, 'Z$', ''), '\\.\\d+$', '') AS t
    FROM (
      SELECT loc,
        CASE WHEN regexp_matches(lm2,
          '^\\d{4}-\\d{2}-\\d{2}(T\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?(Z|\\+00:00)?)?$')
        THEN lm2 END AS valid
      FROM (SELECT loc, regexp_replace(lastmod, '\\+00:00$', 'Z') AS lm2
            FROM e) s0
    ) s1
  ) s2
),
j AS (
  SELECT en.loc, en.lastmod_norm, p.fetched_at AS fetched_norm
  FROM en LEFT JOIN p USING (loc)
)
SELECT loc, lastmod_norm, fetched_norm,
  CASE WHEN fetched_norm IS NULL THEN 'never_fetched'
       WHEN lastmod_norm IS NOT NULL AND lastmod_norm > fetched_norm
       THEN 'modified' END AS refetch_reason,
  CASE WHEN fetched_norm IS NULL THEN true
       WHEN lastmod_norm IS NOT NULL AND lastmod_norm > fetched_norm
       THEN true ELSE false END AS needs_refetch
FROM j
""",
        "warc_not_modified": """
WITH d AS (
  SELECT doc_id,
    'https://' || source || '.example.org/doc/' || doc_id AS url,
    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE text END AS payload,
    CASE WHEN doc_id % 5 = 0 THEN 304 ELSE 200 END AS status
  FROM documents WHERE doc_id < 300
),
pr AS (
  SELECT doc_id, md5(text || 'prior') AS prior_md5
  FROM documents WHERE doc_id >= 50 AND doc_id < 300
),
j AS (
  SELECT d.doc_id, d.url, d.payload, d.status, pr.prior_md5,
    CASE WHEN d.status = 304 AND pr.prior_md5 IS NOT NULL
         THEN 'revisit' ELSE 'response' END AS record_type,
    d.status = 304 AND pr.prior_md5 IS NULL AS nm_orphan
  FROM d LEFT JOIN pr ON d.doc_id = pr.doc_id
),
r AS (
  SELECT doc_id, url, record_type, nm_orphan, prior_md5,
    CASE WHEN status = 304 THEN '' ELSE coalesce(payload, '') END AS body
  FROM j
),
a AS (
  SELECT doc_id, record_type, nm_orphan,
    CAST(strlen(body) AS BIGINT) AS content_length,
    'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: ' || record_type || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
      || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
      || CASE WHEN record_type = 'revisit'
              THEN 'WARC-Profile: '
                   || 'http://netpreserve.org/warc/1.0/revisit/'
                   || 'server-not-modified' || chr(13) || chr(10)
                   || 'WARC-Refers-To-Digest: md5:' || prior_md5
              ELSE 'WARC-Payload-Digest: md5:' || md5(body) END
      || chr(13) || chr(10)
      || 'Content-Length: ' || strlen(body)
      || chr(13) || chr(10) || chr(13) || chr(10)
      || body || chr(13) || chr(10) || chr(13) || chr(10) AS record
  FROM r
),
s AS (
  SELECT doc_id, record_type, nm_orphan, content_length,
    CAST(strlen(record) AS BIGINT) AS record_length,
    md5(record) AS record_md5
  FROM a
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, record_type, nm_orphan,
  content_length, record_length, record_md5,
  coalesce(sum(record_length) OVER (
    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS warc_offset
FROM s
""",
        "byte_budgets": """
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS host,
         CASE WHEN doc_id % 7 = 0 THEN 0
              ELSE length(text) END AS bytes_received
  FROM documents WHERE doc_id < 400
),
stats AS (
  SELECT host, COUNT(*)::BIGINT AS n_obs,
         SUM(bytes_received)::BIGINT AS sum_bytes
  FROM pages GROUP BY host
)
SELECT host, n_obs, sum_bytes,
  CASE WHEN sum_bytes > 0
       THEN LEAST(8, GREATEST(1, (50000 * n_obs) // sum_bytes))
       ELSE 8 END::BIGINT AS host_budget
FROM stats
""",
        # psnr_verify: decoded-pixel PSNR over the Python image codec —
        # not SQL-expressible → rows-only; verdicts pinned value-exact
        # by tests/test_curation_images_r4b.py.
    }
