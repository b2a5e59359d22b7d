"""Dedup soak (VERDICT r3 "Next round" #6): push the sharded-Bloom →
cogroup-probe → binary-md5 anti-join composite 1–2 orders past the 20M
BENCH spot check, and measure what the 10^10 sizing math predicts:

  * ops/s at N_SEEN = N_NEW = 10^8 (vs 2M / 20M in BENCH.md),
  * per-shard bitmap bytes (reported from the shard table itself),
  * MEASURED Bloom FPR against the fpp budget — probed with a key range
    disjoint from the seen set, so every prefilter drop is a false
    positive by construction.

One JSON line on stdout. Usage:
  python tools/dedup_soak.py --seen 100000000 --new 100000000 \
      --shards 256 --fpp 0.01 --cpus 32

Disk-backed wave mode (VERDICT r4 "Next round" #3 — the 10^10 design
point BASELINE.json names, measured rather than extrapolated):
  python tools/dedup_soak.py --seen 10000000000 --new 100000000 \
      --shards 1024 --waves 16 --disk-dir /tmp/dedup_soak_1e10 --cpus 32

With --waves W the seen set is built in W passes of seen/W keys each;
every wave shuffles only its own keys (bounding shuffle disk to
seen/W × 16 B instead of an impossible 160 GB one-shot) and spills its
per-shard DELTA bitmaps to parquet. Probe ORs all W deltas of a bucket
— the engine's LSM seen-set semantics (bloom_prefilter already
accepts multiple bitmap rows per shard). Each delta is sized at
fpp/W so the union bound keeps the OR'd structure inside the overall
budget: P(any of W deltas fires) <= W * (fpp/W) = fpp. Exact
accounting needs no 10^10-row join: keys are id-derived, so survivors
split into false-negative checks (id < seen -> must be 0) and true
uniques (id >= seen) by a filter.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _url(id_col):
    return F.concat(
        F.lit("http://h"), (id_col % 4096).cast("string"),
        F.lit(".soak.test/p/"), id_col.cast("string"), F.lit(".htm"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seen", type=int, default=100_000_000)
    ap.add_argument("--new", type=int, default=100_000_000)
    ap.add_argument("--overlap", type=float, default=0.5,
                    help="fraction of new keys already in seen")
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--fpp", type=float, default=0.01)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--fpr-probe", type=int, default=10_000_000,
                    help="disjoint probe keys for the measured-FPR leg")
    ap.add_argument("--waves", type=int, default=0,
                    help=">0: disk-backed wave build (see module doc)")
    ap.add_argument("--disk-dir", default="/tmp/dedup_soak_waves",
                    help="parquet spill dir for --waves mode")
    ap.add_argument("--resume", action="store_true",
                    help="waves mode: keep completed wave dirs and "
                    "rebuild only missing/partial ones (crash-safe "
                    "restart of a multi-hour 10^10 build)")
    a = ap.parse_args()

    if a.waves > 0:
        return main_waves(a)

    from lightcrawler_spark.operators.dedup import (
        anti_join_seen, bloom_prefilter, build_bloom_shards,
    )
    from lightcrawler_spark.session import get_spark

    spark = get_spark(
        f"dedup-soak-{a.cpus}", master=f"local[{a.cpus}]",
        shuffle_partitions=4 * a.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    par = a.cpus * 4
    seen = spark.range(0, a.seen, 1, par).select(_url(F.col("id")).alias("url"))
    start = int(a.seen - a.overlap * a.new)
    new = spark.range(start, start + a.new, 1, par).select(
        _url(F.col("id")).alias("url")
    )

    t0 = time.perf_counter()
    shards = build_bloom_shards(seen, num_shards=a.shards, fpp=a.fpp)
    shards = shards.localCheckpoint(eager=True)  # time build separately
    t_build = time.perf_counter() - t0

    shard_stats = shards.agg(
        F.count("*").alias("n"),
        F.sum(F.length("bitmap")).alias("bytes"),
        F.max(F.length("bitmap")).alias("max_bytes"),
        F.min("num_hashes").alias("k_min"),
        F.max("num_hashes").alias("k_max"),
    ).first()

    t1 = time.perf_counter()
    survivors = bloom_prefilter(new, shards, num_shards=a.shards)
    survivors = survivors.withColumn("url_md5", F.unhex(F.md5("url")))
    seen_keys = seen.select(F.unhex(F.md5("url")).alias("url_md5"))
    unique = anti_join_seen(survivors, seen_keys).count()
    t_probe = time.perf_counter() - t1
    total = time.perf_counter() - t0

    # measured FPR: a DISJOINT probe range (ids >= seen+new) contains no
    # seen key, so every prefilter drop is a Bloom false positive
    probe = spark.range(
        a.seen + a.new, a.seen + a.new + a.fpr_probe, 1, par
    ).select(_url(F.col("id")).alias("url"))
    kept = bloom_prefilter(probe, shards, num_shards=a.shards).count()
    fpr = (a.fpr_probe - kept) / a.fpr_probe

    expected_unique = a.new - int(a.overlap * a.new)
    print(json.dumps({
        "mode": "dedup-soak",
        "n_seen": a.seen, "n_new": a.new, "overlap": a.overlap,
        "num_shards": a.shards, "fpp_budget": a.fpp, "cpus": a.cpus,
        "build_s": round(t_build, 1),
        "probe_anti_s": round(t_probe, 1),
        "total_s": round(total, 1),
        "ops_per_sec": round(a.new / total),
        "unique_out": unique,
        "expected_unique_max": expected_unique,
        "unique_shortfall_bloom_fp": expected_unique - unique,
        "shards_built": int(shard_stats["n"]),
        "bitmap_bytes_total": int(shard_stats["bytes"]),
        "bitmap_bytes_max_shard": int(shard_stats["max_bytes"]),
        "num_hashes": [int(shard_stats["k_min"]), int(shard_stats["k_max"])],
        "fpr_probe_keys": a.fpr_probe,
        "fpr_measured": round(fpr, 7),
    }))
    spark.stop()


def main_waves(a) -> None:
    """Disk-backed LSM build at the 10^10 design point: W waves of
    seen/W keys -> per-shard delta bitmaps sized at fpp/W -> parquet;
    probe ORs all deltas per bucket (the engine's seen_filter="bloom"
    round-delta path, exercised here at two orders above the r4 soak).
    """
    import os
    import shutil

    from lightcrawler_spark.operators.dedup import (
        bloom_prefilter, build_bloom_shards,
    )
    from lightcrawler_spark.session import get_spark

    spark = get_spark(
        f"dedup-soak-waves-{a.cpus}", master=f"local[{a.cpus}]",
        shuffle_partitions=2 * a.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    par = a.cpus * 4
    per_wave = a.seen // a.waves
    fpp_wave = a.fpp / a.waves  # union bound over the OR'd deltas
    if os.path.isdir(a.disk_dir) and not a.resume:
        shutil.rmtree(a.disk_dir)
    os.makedirs(a.disk_dir, exist_ok=True)

    def _wave_done(w: int) -> bool:
        # parquet commit protocol: _SUCCESS marks a completed write;
        # a dir without it is a crash leftover and must be rebuilt
        return os.path.exists(
            os.path.join(a.disk_dir, f"wave={w}", "_SUCCESS")
        )

    wave_walls = []
    t0 = time.perf_counter()
    for w in range(a.waves):
        tw = time.perf_counter()
        if a.resume and _wave_done(w):
            wave_walls.append(0.0)
            print(f"wave {w}: resumed (already committed)", file=sys.stderr)
            continue
        lo, hi = w * per_wave, (w + 1) * per_wave if w < a.waves - 1 else a.seen
        keys = spark.range(lo, hi, 1, par).select(
            _url(F.col("id")).alias("url")
        )
        delta = build_bloom_shards(keys, num_shards=a.shards, fpp=fpp_wave)
        delta.write.mode("overwrite").parquet(
            os.path.join(a.disk_dir, f"wave={w}")
        )
        wall = time.perf_counter() - tw
        wave_walls.append(round(wall, 1))
        print(f"wave {w}: [{lo}, {hi}) built+spilled in {wall:.1f}s",
              file=sys.stderr)
        # the wave's shuffle (seen/W keys x 16 B) is dead once its
        # deltas are on parquet; nudge JVM GC so ContextCleaner frees
        # the files — otherwise W waves accumulate W x shuffle bytes
        # of disk (~160 GB at the 10^10 point, over this box's budget)
        spark.sparkContext._jvm.System.gc()
    t_build = time.perf_counter() - t0

    shards = spark.read.parquet(
        *[os.path.join(a.disk_dir, f"wave={w}") for w in range(a.waves)]
    )
    shard_stats = shards.groupBy("shard").agg(
        F.sum(F.length("bitmap")).alias("b"), F.count("*").alias("d"),
    ).agg(
        F.count("*").alias("n"),
        F.sum("b").alias("bytes"),
        F.max("b").alias("max_bytes"),
        F.min("d").alias("d_min"), F.max("d").alias("d_max"),
    ).first()
    disk_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(a.disk_dir) for f in fs
    )

    # probe: new keys straddle the seen boundary (overlap fraction
    # below it). id-derived accounting replaces the 10^10-row exact
    # anti-join THIS soak doesn't need (production runs it against the
    # key-bucketed frontier store; here every verdict is decidable
    # from the id): survivors with id < seen are false negatives
    # (must be 0), survivors with id >= seen are the true uniques.
    start = int(a.seen - a.overlap * a.new)
    new = spark.range(start, start + a.new, 1, par).select(
        F.col("id"), _url(F.col("id")).alias("url")
    )
    t1 = time.perf_counter()
    surv = bloom_prefilter(new, shards, num_shards=a.shards)
    counts = surv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("id") < a.seen).cast("long")).alias("fn"),
        F.sum((F.col("id") >= a.seen).cast("long")).alias("uniq"),
    ).first()
    t_probe = time.perf_counter() - t1

    probe = spark.range(
        a.seen + a.new, a.seen + a.new + a.fpr_probe, 1, par
    ).select(_url(F.col("id")).alias("url"))
    t2 = time.perf_counter()
    kept = bloom_prefilter(probe, shards, num_shards=a.shards).count()
    t_fpr = time.perf_counter() - t2
    fpr = (a.fpr_probe - kept) / a.fpr_probe

    expected_unique = a.new - int(a.overlap * a.new)
    print(json.dumps({
        "mode": "dedup-soak-waves",
        "n_seen": a.seen, "n_new": a.new, "overlap": a.overlap,
        "num_shards": a.shards, "waves": a.waves,
        "fpp_budget": a.fpp, "fpp_per_wave": fpp_wave, "cpus": a.cpus,
        "build_s": round(t_build, 1),
        "wave_walls_s": wave_walls,
        "probe_s": round(t_probe, 1),
        "fpr_probe_s": round(t_fpr, 1),
        "probe_ops_per_sec": round(a.new / t_probe),
        "false_negatives": int(counts["fn"]),
        "unique_out": int(counts["uniq"]),
        "expected_unique_max": expected_unique,
        "unique_shortfall_bloom_fp": expected_unique - int(counts["uniq"]),
        "shards_built": int(shard_stats["n"]),
        "deltas_per_shard": [int(shard_stats["d_min"]),
                             int(shard_stats["d_max"])],
        "bitmap_bytes_total": int(shard_stats["bytes"]),
        "bitmap_bytes_max_shard": int(shard_stats["max_bytes"]),
        "disk_bytes": disk_bytes,
        "fpr_probe_keys": a.fpr_probe,
        "fpr_measured": round(fpr, 7),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
