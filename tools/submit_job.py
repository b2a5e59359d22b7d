"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Usage:
    cd /root/repo && zip -qr /tmp/lightcrawler_spark.zip lightcrawler_spark
    spark-submit --master local[8] \
        --py-files /tmp/lightcrawler_spark.zip \
        tools/submit_job.py [n_urls] [budget] [rounds]

The job is deliberately cluster-shaped: it builds a synthetic frontier
with `spark.range` (never materialized driver-side), canonicalizes and
md5-keys it with the same kernels the engine uses, anti-joins against a
seen set, runs the per-host politeness pop, and prints ONE JSON line
with row counts + throughput. Everything is imported from the shipped
zip — the script itself holds no engine logic, proving the package is
self-contained under spark-submit's PYTHONPATH isolation.

On a real cluster, swap --master for the cluster manager and size
--num-executors; nothing in the package assumes local mode.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = SparkSession.builder.appName("lightcrawler-submit-smoke").getOrCreate()

    # imports resolve from the --py-files zip on every executor
    from lightcrawler_spark.functions.spark_udfs import resolve_link_udf
    from lightcrawler_spark.operators import scheduler
    from lightcrawler_spark.operators.dedup import anti_join_seen

    t0 = time.time()
    hosts = 97
    urls = spark.range(n_urls).select(
        F.concat(
            F.lit("//h"),
            (F.col("id") % hosts).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("link_raw"),
        F.lit("http://seed.example.com/").alias("base_url"),
        (F.col("id") % 5).cast("int").alias("priority_level"),
        F.col("id").alias("insert_seq"),
    )
    canon = (
        urls.withColumn(
            "url", resolve_link_udf(F.col("link_raw"), F.col("base_url"))
        )
        .filter(F.col("url").isNotNull())
        .withColumn("url_md5", F.md5(F.col("url")))
    )
    seen = canon.filter(F.col("insert_seq") % 3 == 0).select("url_md5")
    fresh = anti_join_seen(canon, seen, key_col="url_md5")
    popped = scheduler.pop_per_host(
        fresh.withColumn("host", F.regexp_extract("url", r"//([^/]+)/", 1)),
        per_host_budget=budget,
    )
    n_fresh = fresh.count()
    n_popped = popped.count()
    dt = time.time() - t0
    print(json.dumps({
        "n_urls": n_urls,
        "n_fresh": n_fresh,
        "n_popped": n_popped,
        "hosts": hosts,
        "sec": round(dt, 2),
        "urls_per_sec": round(n_urls / dt),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
