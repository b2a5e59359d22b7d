"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule requires throughput scaling efficiency >= 0.8 between a cluster
of N and 4N executors. No real cluster exists in this sandbox, so the
sanctioned evidence is: run the SAME job on the SAME input at two
parallelism levels (local[8] vs local[32]) and report throughput at both
plus efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).

Each level gets a fresh SparkSession (fresh JVM would be even cleaner,
so each level runs in a subprocess) with shuffle partitions sized to its
core count — the same knob a spark-submit deployment would set.

Usage:
  python tools/scaling_bench.py            # orchestrate both levels
  python tools/scaling_bench.py --worker 8 # run one level, print JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (8, 32)


def run_level(cpus: int) -> dict:
    import bench
    from lightcrawler_spark.session import get_spark

    bench.CPUS = cpus
    spark = get_spark(
        f"scaling-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    try:
        # warm the JVM/Arrow paths so the measured runs compare codegen'd
        # steady state, not first-query classloading
        spark.range(100000).selectExpr("xxhash64(id) h").groupBy().sum("h").collect()
        t0 = time.time()
        dedup = bench.bench_frontier_dedup(spark)
        pages = bench.bench_page_pipeline(spark)
        imgs = bench.bench_image_decode(spark)
        total = time.time() - t0
    finally:
        spark.stop()
    return {
        "cpus": cpus,
        "total_sec": round(total, 2),
        "dedup_ops_per_sec": round(dedup["ops_per_sec"]),
        "pages_per_sec": round(pages["pages_per_sec"]),
        "images_per_sec": round(imgs["images_per_sec"]),
    }


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    results = {}
    for cpus in LEVELS:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)

    lo, hi = LEVELS
    report = {"sf_dir": SF_DIR, "levels": results}
    for key in ("dedup_ops_per_sec", "pages_per_sec", "images_per_sec"):
        speedup = results[hi][key] / max(results[lo][key], 1)
        report[f"{key}_speedup_{lo}to{hi}"] = round(speedup, 3)
        report[f"{key}_efficiency"] = round(speedup / (hi / lo), 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
