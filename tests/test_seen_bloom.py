"""LSM seen-Bloom mode (P1 scale path; BASELINE.json north_rule:
"Bloom/cuckoo-filter URL-seen set built with vectorized Arrow UDFs").

`spec.seen_filter="bloom"` replaces the per-round O(frontier) url_md5
anti-join with a probe against per-round delta Bloom shards appended to
the `seen_bloom` store table — per-round dedup cost becomes O(new links).
A false positive drops a new URL; at fixture scale with fpp=1e-6 the
deterministic build makes these tests stable: if they pass once they
always pass (NumpyBloom hashing has no randomness).

Pinned here:
- trace + pages parity with exact mode on the multihost and skew fixtures
  (bloom mode is a physical dedup strategy, not a semantic change);
- delta accumulation: one shard-set row group per round in the store;
- resume keeps the delta history (crash after round K probes K deltas).
"""

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.fixtures import (
    make_multihost_webgraph,
    make_skewed_webgraph,
    multihost_spec,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.plans.storage import MemoryRoundStore
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


def run(spark, web, spec, max_rounds=25):
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec)
    )
    return engine.run(max_rounds=max_rounds)


def trace_rows(result):
    return [
        (r["seq"], r["url"], r["url_md5"], r["depth"], r["status"])
        for r in result.trace.orderBy("seq").collect()
    ]


class TestSeenBloomParity:
    def test_multihost_trace_identical_to_exact(self, spark):
        web = make_multihost_webgraph(n_hosts=4, chain_len=3)
        exact = run(spark, web, multihost_spec(per_host_budget=2))
        bloom = run(
            spark, web, multihost_spec(per_host_budget=2, seen_filter="bloom")
        )
        assert trace_rows(bloom) == trace_rows(exact)
        assert bloom.pages_fetched == exact.pages_fetched

    def test_skew_trace_identical_to_exact(self, spark):
        web = make_skewed_webgraph(n_small=2, mega_branches=4, leaves_per_branch=6)
        spec_e = multihost_spec(per_host_budget=5)
        spec_e.seeds = ["http://hub.skew.test"]
        spec_b = multihost_spec(per_host_budget=5, seen_filter="bloom")
        spec_b.seeds = ["http://hub.skew.test"]
        exact = run(spark, web, spec_e)
        bloom = run(spark, web, spec_b)
        assert trace_rows(bloom) == trace_rows(exact)
        # the frontier (URL-seen set) is identical too
        seen = lambda res: sorted(
            r["url_md5"] for r in res.frontier.select("url_md5").collect()
        )
        assert seen(bloom) == seen(exact)

    def test_delta_per_round_in_store(self, spark):
        web = make_multihost_webgraph(n_hosts=3, chain_len=2)
        spec = multihost_spec(per_host_budget=2, seen_filter="bloom")
        store = MemoryRoundStore(spark)
        engine = CrawlEngine(
            spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec),
            store=store,
        )
        result = engine.run(max_rounds=25)
        assert result.pages_fetched == 1 + 3 * (2 * 2 + 2)
        shards = store.read_upto("seen_bloom", store.last_complete_round())
        rounds_with_deltas = sorted(
            r["round"] for r in shards.select("round").distinct().collect()
        )
        # seed round 0 plus every frontier-growing round wrote a delta
        assert rounds_with_deltas[0] == 0
        assert len(rounds_with_deltas) >= 3
        # shard rows carry self-describing sizing
        row = shards.first()
        assert row["num_bits"] > 0 and row["num_hashes"] >= 1
        assert len(bytes(row["bitmap"])) == (row["num_bits"] + 7) // 8
