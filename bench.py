"""Headline benchmark harness (driver contract).

Runs the engine's headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line:  {"metric": ..., "value": total_sec, "unit": "sec",
        "queries": {name: sec}, "sf": ...}

The metric tracks BASELINE.md's target: pages fetched/sec through the
full fetch→extract→admit→dedup pipeline, plus frontier-dedup ops/sec on
a synthetic frontier (generated with spark.range — never materialized
driver-side, the same construction that scales to the 10^10-URL target).
Extra keys report those throughputs; tools/scaling_bench.py reruns the
same jobs at two parallelism levels for the scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# sizes scale with sf so local iteration at sf0.01 stays fast
try:
    _SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
except ValueError:
    _SF = 0.1
SCALE = max(_SF / 0.1, 0.01)
def _env_n(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


N_SEEN = _env_n("SPARK_GRAFT_DEDUP_N", int(2_000_000 * SCALE))
N_NEW = N_SEEN
N_PAGES = _env_n("SPARK_GRAFT_PAGES_N", int(60_000 * SCALE))
N_IMAGES = _env_n("SPARK_GRAFT_IMAGES_N", int(20_000 * SCALE))
N_AUDIO = _env_n("SPARK_GRAFT_AUDIO_N", int(20_000 * SCALE))
N_VECTORS = _env_n("SPARK_GRAFT_VECTORS_N", int(400_000 * SCALE))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _url(col):
    return F.concat(
        F.lit("http://h"), F.pmod(F.xxhash64(col), F.lit(997)).cast("string"),
        F.lit(".bench.test/p/"), col.cast("string"),
    )


def bench_frontier_dedup(spark: SparkSession) -> dict:
    """North-rule metric 2: frontier-dedup ops/sec.

    seen = N_SEEN URLs; new = N_NEW URLs with ~50% overlap. Pipeline is
    the production one (operators/dedup.py): distributed sharded-Bloom
    build → Arrow-batch probable-seen prune → exact left_anti on md5."""
    from lightcrawler_spark.operators.dedup import (
        anti_join_seen, bloom_prefilter, build_bloom_shards,
    )

    num_shards = 64
    seen = spark.range(0, N_SEEN, 1, CPUS * 4).select(_url(F.col("id")).alias("url"))
    new = (
        spark.range(N_SEEN // 2, N_SEEN // 2 + N_NEW, 1, CPUS * 4)
        .select(_url(F.col("id")).alias("url"))
    )
    t0 = time.time()
    shards = build_bloom_shards(seen, num_shards=num_shards, fpp=0.01)
    survivors = bloom_prefilter(new, shards, num_shards=num_shards)
    # binary(16) md5 keys: same identity as the reference's char(32) hex
    # but half the shuffle bytes — the form a 10^10-row seen table stores
    survivors = survivors.withColumn("url_md5", F.unhex(F.md5("url")))
    seen_keys = seen.select(F.unhex(F.md5("url")).alias("url_md5"))
    out = anti_join_seen(survivors, seen_keys).count()
    dt = time.time() - t0
    log(f"frontier_dedup: {N_NEW} new vs {N_SEEN} seen -> {out} unique "
        f"in {dt:.1f}s = {N_NEW / dt:,.0f} ops/s")
    return {"sec": dt, "ops_per_sec": N_NEW / dt, "unique": out}


def bench_page_pipeline(spark: SparkSession) -> dict:
    """North-rule metric 1: pages/sec through the per-round inner loop —
    body decode → link extraction (Arrow UDF, 3 regex passes) → explode →
    admission battery (F1–F9, JVM predicates) → first-wins dedup.
    Synthetic HTML built JVM-side from spark.range (driver never sees it)."""
    from lightcrawler_spark.config import CrawlSpec
    from lightcrawler_spark.operators.admission import admission_predicate
    from lightcrawler_spark.operators.dedup import first_wins_within_batch
    from lightcrawler_spark.operators.extract import extract_links_udf

    pages = spark.range(0, N_PAGES, 1, CPUS * 4).select(
        _url(F.col("id")).alias("url"),
        F.col("id").cast("long").alias("src_rank"),
        F.lit(2).alias("depth"),
        F.concat(
            F.lit('<html><head><base href=""></head><body>'),
            F.lit('<a href="/list/'), (F.col("id") % 5000).cast("string"),
            F.lit('.htm">Next list</a>'),
            F.lit('<a href="detail_'), F.col("id").cast("string"),
            F.lit('.htm">Detail &amp; more</a>'),
            F.lit('<img src="/userfiles/image/'), (F.col("id") % 1000).cast("string"),
            F.lit('.jpg"/>'),
            F.lit('<a href="http://www.other-b.test/x.htm">offsite</a>'),
            F.lit('<a href="javascript:void(0)">js</a>'),
            F.lit('<script>var countPage = 3</script></body></html>'),
        ).alias("body_text"),
    )
    spec = CrawlSpec(
        seeds=["http://h1.bench.test/"],
        follow_mode=0,  # any
        max_depth=8,
        url_filter_rules=[r"#\.(jpg|gif|png|pdf|jpeg|css|js|mp3|mp4|flv|swf|svg|bmp)# i"],
    )
    t0 = time.time()
    links = (
        pages.withColumn(
            "links",
            extract_links_udf(F.col("body_text"), F.col("url"), F.lit(None).cast("string")),
        )
        .select(
            F.col("url").alias("referer"), "src_rank",
            (F.col("depth") + 1).alias("depth"),
            F.posexplode_outer("links").alias("link_pos", "l"),
        )
        .filter(F.col("l").isNotNull())
        .select(
            "referer", "src_rank", "link_pos", "depth",
            F.col("l.link_raw").alias("link_raw"),
            F.col("l.linkcode").alias("linkcode"),
            F.col("l.linktext").alias("linktext"),
            F.col("l.url").alias("url"),
            F.col("l.is_redirect").alias("is_redirect"),
        )
    )
    admitted = links.filter(admission_predicate(spec, spec.seeds[0]))
    admitted = admitted.withColumn("url_md5", F.md5("url")).withColumn(
        "insert_seq",
        F.col("src_rank") * F.lit(1 << 20) + F.col("link_pos"),
    )
    n_links = first_wins_within_batch(admitted, "url_md5", "insert_seq").count()
    dt = time.time() - t0
    log(f"page_pipeline: {N_PAGES} pages -> {n_links} unique admitted links "
        f"in {dt:.1f}s = {N_PAGES / dt:,.0f} pages/s")
    return {"sec": dt, "pages_per_sec": N_PAGES / dt, "links": n_links}


def bench_image_decode(spark: SparkSession) -> dict:
    """input_hint invariant pipeline at volume: decode + dims + PSNR +
    phash over the image+caption schema via mapInPandas."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.operators.images import verify_images

    base = make_images(256)
    reps = max(1, N_IMAGES // 256)
    df = spark.createDataFrame(
        [
            (r["image_id"], bytearray(r["bytes"]), r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"])
            for r in base
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    big = df.crossJoin(
        spark.range(reps).select(F.col("id").alias("rep"))
    ).repartition(CPUS * 2)
    t0 = time.time()
    ok = verify_images(big).filter(
        F.col("dims_ok") & F.col("psnr_ok") & F.col("exact_ok") & F.col("phash_ok")
    ).count()
    dt = time.time() - t0
    n = 256 * reps
    log(f"image_decode: {n} images verified ({ok} ok) in {dt:.1f}s = "
        f"{n / dt:,.0f} imgs/s")
    return {"sec": dt, "images_per_sec": n / dt, "ok": ok}


def bench_image_curation(spark: SparkSession) -> dict:
    """The round-4 curation screens at volume: low-information signals
    (entropy / Laplacian blur / modal solidity, one Arrow pass) +
    codegen'd verdict + normalized-caption frequency cut over the same
    image+caption schema. Measures the quality-gate kernels a 100 TB
    curation pass spends most of its non-decode time in."""
    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.operators.images import (
        flag_frequent_captions,
        low_information_expr,
        with_image_quality_stats,
    )

    base = make_images(256)
    reps = max(1, N_IMAGES // 256)
    df = spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]), r["caption"]) for r in base],
        "image_id string, bytes binary, caption string",
    )
    big = (
        df.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        # half the corpus keeps the 6 shared stock captions (frequent →
        # boilerplate-cut), half gets a unique tail (survives the cut) —
        # so the frequency gate does real work instead of flagging all
        .withColumn(
            "caption",
            F.when(
                F.xxhash64("image_id") % 2 == 0, F.col("caption")
            ).otherwise(F.concat_ws(" ", "caption", "image_id")),
        )
        .repartition(CPUS * 2)
    )
    t0 = time.time()
    gated = (
        with_image_quality_stats(big)
        .withColumn("low_information", low_information_expr())
    )
    kept = (
        flag_frequent_captions(gated, min_freq=reps * 4)
        .filter(
            (~F.col("low_information")) & (~F.col("caption_boilerplate"))
        )
        .count()
    )
    dt = time.time() - t0
    n = 256 * reps
    log(f"image_curation: {n} images gated ({kept} kept) in {dt:.1f}s = "
        f"{n / dt:,.0f} imgs/s")
    return {"sec": dt, "curation_imgs_per_sec": n / dt, "kept": kept}


def bench_rot_dedup(spark: SparkSession) -> dict:
    """Rot/mirror-invariant dedup at volume: decode + 8 dihedral
    phash/dhash pairs per image (with_rot_invariant_hashes) + exact
    group dedup with keep-best-caption argmax. Each base image ships
    with a rot90 re-post under a different id; replication makes every
    key a 2×reps mega-group, exercising the no-window max_by path."""
    import numpy as np

    from lightcrawler_spark.fixtures import make_images
    from lightcrawler_spark.imagecodec import decode_image, encode_image
    from lightcrawler_spark.operators.images import rot_invariant_dedup

    base = make_images(128)
    rows = []
    for rec in base:
        arr = decode_image(bytes(rec["bytes"]))
        rot = encode_image(
            np.ascontiguousarray(np.rot90(arr)).astype(np.uint8), "png"
        )
        rows.append(
            (rec["image_id"] + ":o", bytearray(rec["bytes"]),
             "caption " + rec["image_id"])
        )
        rows.append(
            (rec["image_id"] + ":r", bytearray(rot),
             "rotated longer caption " + rec["image_id"])
        )
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string"
    )
    reps = max(1, N_IMAGES // 512)
    big = df.crossJoin(
        spark.range(reps).select(F.col("id").alias("rep"))
    ).repartition(CPUS * 2)
    t0 = time.time()
    kept = rot_invariant_dedup(big).filter(F.col("is_kept")).count()
    dt = time.time() - t0
    n = 256 * reps
    log(f"rot_dedup: {n} images keyed+deduped ({kept} kept) in {dt:.1f}s = "
        f"{n / dt:,.0f} imgs/s")
    return {"sec": dt, "rot_imgs_per_sec": n / dt, "kept": kept}


def bench_audio_pipeline(spark: SparkSession) -> dict:
    """Audio leg of the multimodal pipeline at volume: WAV encode →
    container parse → exact-integer PCM features, all executor-side
    (synthesis via pandas UDF from range params — no driver funnel)."""
    from lightcrawler_spark.operators.audio import (
        audio_features_udf,
        synth_square_wav_udf,
    )

    n = N_AUDIO
    df = spark.range(n).repartition(CPUS * 2).select(
        F.col("id"),
        synth_square_wav_udf(
            F.lit(16000), (F.lit(4096) + (F.col("id") % 4) * 1024).cast("int"),
            F.lit(1), (F.lit(300) + F.col("id") % 100).cast("int"),
            F.lit(32), ((F.col("id") % 8) * 128).cast("int"),
        ).alias("bytes"),
    )
    t0 = time.time()
    ok = (
        df.select(audio_features_udf("bytes").alias("f"))
        .filter(F.col("f.ok") & (F.col("f.sum_sq") > 0))
        .count()
    )
    dt = time.time() - t0
    log(f"audio_pipeline: {n} clips ({ok} ok) in {dt:.1f}s = "
        f"{n / dt:,.0f} clips/s")
    return {"sec": dt, "clips_per_sec": n / dt, "ok": ok}


def synthetic_vectors(spark: SparkSession, n: int, dim: int,
                      partitions: int):
    """Deterministic JVM-side embedding corpus (LCG components in
    [-1, 1]) shared by the kmeans assign/train benches and
    tools/explain_audit.py's blocking-join plan — one generator, so
    tuning the distribution can never desynchronize the workloads."""
    return spark.range(0, n, 1, partitions).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                ((F.col("id") + 1) * 48271 + i * 16807) % 2001 - 1000
            ).cast("double") / F.lit(1000.0),
        ).alias("embedding"),
    )


def bench_kmeans_assign(spark: SparkSession) -> dict:
    """Embedding-clustering leg of the training-data pipeline at volume:
    nearest-centroid assignment (operators/clustering.py:
    kmeans_assignments) over synthetic 64-dim vectors built JVM-side
    from spark.range — the IVF/SemDeDup scale path, a zero-shuffle
    codegen'd projection doing k×dim exact int64 MACs per row."""
    from lightcrawler_spark.operators.clustering import kmeans_assignments

    dim, k = 64, 16
    cents = spark.createDataFrame(
        [
            (
                c,
                [
                    int(((c * 2654435761 + i * 40503) % 2_000_001)
                        - 1_000_000)
                    for i in range(dim)
                ],
            )
            for c in range(k)
        ],
        "cid int, centroid array<bigint>",
    )
    n = N_VECTORS
    vecs = synthetic_vectors(spark, n, dim, CPUS * 4)
    t0 = time.time()
    row = (
        kmeans_assignments(vecs, cents)
        .agg(F.count("*").alias("n"), F.sum("cid").alias("s"),
             F.min("dist").alias("d"))
        .collect()[0]
    )
    dt = time.time() - t0
    log(f"kmeans_assign: {n} vectors x {k} cents x {dim}d in {dt:.1f}s "
        f"= {n / dt:,.0f} vec/s (checksum {row['s']})")
    return {"sec": dt, "vectors_per_sec": n / dt, "checksum": int(row["s"])}


def bench_kmeans_train(spark: SparkSession) -> dict:
    """Full Lloyd-iteration training throughput (kmeans_centroids over
    the same synthetic vectors as bench_kmeans_assign): each iteration
    is the assignment projection PLUS the (dim+1)-column map-side-
    combined groupBy shuffle — the leg that witnesses the UPDATE
    stage's partial aggregation at volume. Metric: vector-iterations/s.
    Not in the per-round bench run (assignment covers the hot path);
    reachable via SCALING_WORKLOADS=kmeans_train."""
    from lightcrawler_spark.operators.clustering import kmeans_centroids

    dim, k, iters = 64, 16, 2
    n = N_VECTORS
    vecs = synthetic_vectors(spark, n, dim, CPUS * 4)
    t0 = time.time()
    cents = kmeans_centroids(vecs, k=k, iters=iters)
    chk = cents.agg(F.sum(F.element_at("centroid", 1)).alias("s")).collect()
    dt = time.time() - t0
    rate = n * iters / dt
    log(f"kmeans_train: {n} vectors x {iters} iters (k={k}, {dim}d) in "
        f"{dt:.1f}s = {rate:,.0f} vec-iters/s (checksum {chk[0]['s']})")
    return {"sec": dt, "vec_iters_per_sec": rate,
            "checksum": int(chk[0]["s"])}


def bench_batch_layout(spark: SparkSession) -> dict:
    """Conflict-free batch layout at volume (operators/chunking.py:
    contrastive_batches): a synthetic corpus where every 5th row
    belongs to one of 997 dup clusters (~N/5000 rows each) and the rest
    are singletons — the post-dedup shape a CLIP-style training mix
    actually has. Exercises the size groupBy, the join-back, and the
    distributed prefix sum over the (size DESC, key, id) layout."""
    from lightcrawler_spark.operators.chunking import contrastive_batches

    n = _env_n("SPARK_GRAFT_BATCHROWS_N", int(3_000_000 * SCALE))
    rows = spark.range(n, numPartitions=CPUS * 4).select(
        F.col("id").alias("image_id"),
        F.when(F.col("id") % 5 == 0, F.col("id") % 997)
        .cast("long").alias("cluster_id"),
    )
    t0 = time.time()
    out = contrastive_batches(
        rows, batch_size=1024, id_col="image_id",
        num_partitions=CPUS * 4,
    )
    # count/sum/max only: a countDistinct here would add a harness-side
    # two-stage exchange that dwarfs the operator at bench scale
    row = out.agg(
        F.count("*").alias("n"),
        (F.max("batch_idx") + 1).alias("nb"),
        F.sum("batch_idx").alias("s"),
    ).collect()[0]
    dt = time.time() - t0
    log(f"batch_layout: {row['n']} rows -> {row['nb']} batches in "
        f"{dt:.1f}s = {row['n'] / dt:,.0f} rows/s (checksum {row['s']})")
    return {"sec": dt, "rows_per_sec": row["n"] / dt,
            "checksum": int(row["s"])}


def bench_per_host_schedule(spark: SparkSession) -> dict:
    """P8 scale mode (fixed in r3): per-host politeness pop + the
    deterministic host interleave over a synthetic frontier — the round
    serialization a million-host crawl runs. Plan shape under test:
    host-partitioned rank → tier-partitioned rank + broadcast offsets
    (NO unpartitioned window, no global sort)."""
    from lightcrawler_spark.operators.scheduler import (
        interleave_rank, pop_per_host,
    )

    n = N_SEEN
    n_hosts = max(1000, n // 40)
    frontier = spark.range(0, n, 1, CPUS * 4).select(
        _url(F.col("id")).alias("url"),
        F.concat(
            F.lit("h"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_hosts)).cast("string"),
            F.lit(".bench.test"),
        ).alias("host"),
        (F.col("id") % 5).cast("int").alias("priority_level"),
        F.col("id").alias("insert_seq"),
    )
    t0 = time.time()
    work = interleave_rank(pop_per_host(frontier, 4))
    claimed = work.count()
    dt = time.time() - t0
    log(f"per_host_schedule: {n} pending over {n_hosts} hosts -> "
        f"{claimed} claimed in {dt:.1f}s = {n / dt:,.0f} pending-rows/s")
    return {"sec": dt, "pending_rows_per_sec": n / dt, "claimed": claimed}


def bench_crawl_engine(spark: SparkSession) -> dict:
    """End-to-end BSP rounds on the fixture web (engine overhead incl.
    scheduling, politeness, robots, round commits)."""
    from lightcrawler_spark.fixtures import (
        ROBOTS_FIXTURE, default_spec, make_images, make_webgraph,
    )
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    from lightcrawler_spark.fixtures import webgraph_df

    web = make_webgraph(n_lists=6, details_per_list=8, images=make_images(16))
    web_df = webgraph_df(spark, web)
    spec = default_spec(budget=64)
    # micro-rounds: AQE's per-stage replanning dominates at fixture scale
    # (same setting as the golden-fixture contract query)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    best = None
    warm: list[float] = []
    try:
        # first run warms engine-specific plans/codegen (cold first runs
        # are 2-4x slower on this VM and measure JIT, not the engine).
        # Steal bursts last minutes, so a fixed rep count can land every
        # rep in one burst (a clean r3 run measured 21s where the quiet
        # machine does 10-12s): sample until the two best warm reps
        # agree within 20% (min 3 warm reps, cap 8) — quiet machines
        # stop early, noisy ones buy more draws.
        for rep in range(9):
            engine = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                                 robots_fixture=ROBOTS_FIXTURE)
            t0 = time.time()
            result = engine.run(max_rounds=12)
            dt = time.time() - t0
            log(f"crawl_engine rep {rep}{' (warmup)' if rep == 0 else ''}: "
                f"{result.pages_fetched} pages / {result.rounds_run} rounds "
                f"in {dt:.1f}s = {result.pages_fetched / dt:,.1f} pages/s")
            if rep == 0:
                continue
            warm.append(dt)
            if best is None or dt < best[0]:
                best = (dt, result.pages_fetched, result.rounds_run)
            if len(warm) >= 3:
                lo, lo2 = sorted(warm)[:2]
                if lo2 <= 1.2 * lo:
                    break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    dt, pages, rounds = best
    return {"sec": dt, "pages_per_sec": pages / dt,
            "pages": pages, "rounds": rounds}


def bench_engine_soak(spark: SparkSession) -> dict:
    """The engine at a production-like budget (~12k URLs/round over 512
    hosts) on the generative synthetic web — the scale regime where the
    per-round driver overhead that dominates the fixture bench amortizes
    away. Web pages are computed from the URL executor-side
    (sources/synthetic_web.py), so frontier growth, seen-set anti-join,
    per-host politeness windows and round commits are the only costs.
    Steady-state pages/s = rounds after the frontier saturates the
    budget (skip the ramp-up half); tools/engine_soak.py runs the same
    loop 10x longer with compaction + resume proofs for BENCH.md."""
    import shutil
    import tempfile

    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.plans.storage import RoundStore
    from lightcrawler_spark.sources.synthetic_web import (
        GenerativeFetcher, SynthWebSpec, soak_crawl_spec,
    )

    n_rounds = 10
    # sized for sf0.1 (~12k URLs/round); scales down for sf0.01 iteration
    budget = max(4, int(24 * SCALE))
    web = SynthWebSpec(n_nodes=max(200_000, int(2_000_000 * SCALE)),
                       n_hosts=512, out_degree=8, img_every=8)
    store_dir = tempfile.mkdtemp(prefix="bench_engine_soak_")
    t0 = time.time()
    try:
        spec = soak_crawl_spec(web, spark, per_host_budget=budget,
                               n_seeds=512, max_rounds=n_rounds)
        store = RoundStore(spark, store_dir)

        commit_walls: list[float] = []
        orig_commit = store.commit_round

        def commit_round(round_no):
            orig_commit(round_no)
            commit_walls.append(time.time())

        store.commit_round = commit_round
        engine = CrawlEngine(spark, spec, GenerativeFetcher(web, spec),
                             store=store)
        result = engine.run(max_rounds=n_rounds)
        dt = time.time() - t0
        half = len(commit_walls) // 2
        per_round = {
            int(r["round"]): int(r["n"])
            for r in result.pages.groupBy("round")
            .agg(F.count("*").alias("n")).collect()
        }
        steady_pages = sum(n for rnd, n in per_round.items() if rnd > half)
        steady_secs = commit_walls[-1] - commit_walls[half - 1]
        steady = steady_pages / steady_secs if steady_secs > 0 else 0.0
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
    log(f"engine_soak: {result.pages_fetched} pages / {result.rounds_run} "
        f"rounds in {dt:.1f}s = {result.pages_fetched / dt:,.0f} pages/s "
        f"(steady {steady:,.0f})")
    return {"sec": dt, "pages_per_sec": result.pages_fetched / dt,
            "steady_pages_per_sec": steady,
            "pages": result.pages_fetched, "rounds": result.rounds_run}


def bench_sf_queries(spark: SparkSession) -> dict:
    """Representative driver-contract queries at the bench sf.

    Best-of-2 per query: this VM's CPU-steal bursts swing identical jobs
    4-6×, so single-shot per-query timings made round-over-round deltas
    pure noise (r2 VERDICT §What's wrong #2). The two draws are separated
    by a full pass over all queries (A/B interleave) so one steal window
    can't poison both draws of the same query."""
    import __spark_entry__ as entrymod

    names = [
        "crawl_bfs", "frontier_dedup_anti", "priority_pop",
        "per_host_rounds", "admission_filter", "sessionize",
        "events_hourly", "dedup_exact", "token_counts", "quality_score",
        "lang_id", "doc_fingerprint", "embedding_topk", "embedding_lsh",
        "minhash_signatures", "repetition_stats", "decontaminate",
        "training_mix_sample", "corpus_pipeline", "line_dedup",
        "domain_cap", "doc_chunk", "sequence_pack",
        "lang_rebalance", "dup_span_mask", "clip_score_filter",
        "warc_export", "domain_gate", "cdx_index", "snapshot_diff",
        "boilerplate_lines", "bpe_pairs", "budget_apportion",
        "embedding_quantize", "canonical_alias", "quantized_topk",
        "warc_revisit", "cdc_chunks", "archive_pipeline",
        "dataset_split", "precision_curation", "kmeans_centroids",
        "layout_pipeline", "ccnet_buckets", "sequence_spans",
        "warc_roundtrip", "epoch_mix",
    ]
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for rep in range(2):
        for name in names:
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            dt = time.time() - t0
            prev = out.get(name)
            out[name] = dt if prev is None else min(prev, dt)
            log(f"q:{name} rep {rep}: {n} rows in {dt:.2f}s")
    return out


def run(spark: SparkSession) -> dict:
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    def best_of(fn, n=2):
        """This VM has multi-minute CPU-steal bursts and slow first-touch
        page faults (BENCH.md) — a single draw of a heavyweight workload
        measures the window, not the engine. Keep the best of n."""
        results = [fn(spark) for _ in range(n)]
        return min(results, key=lambda r: r["sec"])

    r = best_of(bench_frontier_dedup)
    queries["frontier_dedup_synthetic"] = round(r["sec"], 3)
    extra["frontier_dedup_ops_per_sec"] = round(r["ops_per_sec"])

    r = best_of(bench_page_pipeline)
    queries["page_pipeline_synthetic"] = round(r["sec"], 3)
    extra["pages_per_sec"] = round(r["pages_per_sec"])

    r = best_of(bench_image_decode)
    queries["image_decode_verify"] = round(r["sec"], 3)
    extra["images_per_sec"] = round(r["images_per_sec"])

    r = best_of(bench_image_curation)
    queries["image_curation_gate"] = round(r["sec"], 3)
    extra["curation_imgs_per_sec"] = round(r["curation_imgs_per_sec"])

    r = best_of(bench_rot_dedup)
    queries["rot_dedup_synthetic"] = round(r["sec"], 3)
    extra["rot_imgs_per_sec"] = round(r["rot_imgs_per_sec"])

    r = best_of(bench_audio_pipeline)
    queries["audio_pipeline"] = round(r["sec"], 3)
    extra["audio_clips_per_sec"] = round(r["clips_per_sec"])

    r = best_of(bench_kmeans_assign)
    queries["kmeans_assign_synthetic"] = round(r["sec"], 3)
    extra["kmeans_vectors_per_sec"] = round(r["vectors_per_sec"])

    r = best_of(bench_per_host_schedule)
    queries["per_host_schedule_synthetic"] = round(r["sec"], 3)
    extra["per_host_pending_rows_per_sec"] = round(r["pending_rows_per_sec"])

    r = best_of(bench_batch_layout)
    queries["batch_layout_synthetic"] = round(r["sec"], 3)
    extra["batch_layout_rows_per_sec"] = round(r["rows_per_sec"])

    r = bench_crawl_engine(spark)
    queries["crawl_engine_rounds"] = round(r["sec"], 3)
    extra["engine_pages_per_sec"] = round(r["pages_per_sec"], 1)

    r = bench_engine_soak(spark)
    queries["crawl_engine_soak"] = round(r["sec"], 3)
    extra["engine_soak_pages_per_sec"] = round(r["pages_per_sec"], 1)
    extra["engine_soak_steady_pages_per_sec"] = round(
        r["steady_pages_per_sec"], 1)

    for name, sec in bench_sf_queries(spark).items():
        queries[name] = round(sec, 3)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline crawl+training-data suite wall time "
                  "(pages/s + dedup ops/s in extra keys)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _SF,
        **extra,
    }


def main():
    from lightcrawler_spark.session import get_spark

    spark = get_spark(
        "lightcrawler-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    try:
        result = run(spark)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
