"""Conditional-GET bandwidth A/B: the same revisit-heavy crawl with
spec.conditional_get on vs off, identical pop schedules (the flag only
changes 200→304 on unchanged pages, never the order), reporting bytes
transferred, 304 share, and wall time.

Fixture: 120 revisit-matching list pages (~5 KB bodies, all with
ETags) + root, revisited up to 3 times each — the slow-changing-corpus
shape where conditional revalidation pays (Common Crawl-style
recrawls). Usage: python tools/conditional_bench.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def build_web():
    from lightcrawler_spark.fixtures import _page_row

    root = "http://cond-bench.test"
    links = "".join(
        f"<a href='/list/p{i}.htm'>p{i}</a>" for i in range(120)
    )
    pages = [_page_row(root, f"<html>{links}</html>")]
    for i in range(120):
        body = "<html>" + ("x" * 5000) + f"p{i}</html>"
        pages.append(
            _page_row(f"{root}/list/p{i}.htm", body, etag=f'"v{i}"')
        )
    return pages


def build_spec(conditional: bool):
    from lightcrawler_spark.config import CrawlSpec

    return CrawlSpec(
        seeds=["http://cond-bench.test"],
        max_depth=2,
        revisit_url_rules=[r"#/list/# i"],
        revisit_after_rounds=1,
        max_revisits=3,
        conditional_get=conditional,
        crawl_delay_s=5.0,
        round_duration_s=5.0 * 200,  # budget 200/round
    )


def run_arm(spark, conditional: bool):
    from pyspark.sql import functions as F

    from lightcrawler_spark.fixtures import webgraph_df
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.sources.fetcher import SyntheticFetcher

    spec = build_spec(conditional)
    engine = CrawlEngine(
        spark, spec,
        SyntheticFetcher(webgraph_df(spark, build_web()), spec),
    )
    t0 = time.perf_counter()
    res = engine.run(max_rounds=40)
    wall = time.perf_counter() - t0
    agg = res.trace.agg(
        F.count("*").alias("pops"),
        F.sum("bytes_received").alias("bytes"),
        F.sum((F.col("status") == 304).cast("int")).alias("n_304"),
    ).first()
    return {
        "pops": int(agg["pops"]),
        "bytes": int(agg["bytes"]),
        "n_304": int(agg["n_304"]),
        "wall_s": round(wall, 2),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from lightcrawler_spark.session import get_spark

    spark = get_spark(
        "conditional-bench", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    best = {}
    for arm, flag in (("off", False), ("on", True)):
        runs = [run_arm(spark, flag) for _ in range(reps)]
        b = min(runs, key=lambda r: r["wall_s"])
        # pops/bytes/304s are deterministic across reps — assert it
        assert all(
            (r["pops"], r["bytes"], r["n_304"])
            == (b["pops"], b["bytes"], b["n_304"])
            for r in runs
        ), "nondeterministic arm!"
        best[arm] = b
    out = {
        "metric": "conditional-GET bandwidth A/B (best-of-%d)" % reps,
        "off": best["off"],
        "on": best["on"],
        "bytes_saved_pct": round(
            100.0 * (1 - best["on"]["bytes"] / best["off"]["bytes"]), 2
        ),
        "pop_schedule_identical": best["on"]["pops"] == best["off"]["pops"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
