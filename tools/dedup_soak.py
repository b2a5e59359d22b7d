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
    a = ap.parse_args()

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


if __name__ == "__main__":
    main()
