"""Per-round Spark-job discipline of the BSP engine (plans/crawl.py).

The fused fast path must run ONE action per common round — the frontier
checkpoint, with the round stats riding it as an Observation. Steal
noise on this VM makes wall-clock asserts meaningless, but job COUNTS
are deterministic, so this is the regression guard for the fused path.
"""

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from lightcrawler_spark.fixtures import (
    ROBOTS_FIXTURE,
    default_spec,
    make_images,
    make_webgraph,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


def test_fused_round_job_count(spark):
    web = make_webgraph(n_lists=3, details_per_list=4, images=make_images(4))
    web_df = webgraph_df(spark, web)
    spec = default_spec(budget=64)
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(web_df, spec),
        robots_fixture=ROBOTS_FIXTURE,
    )

    sc = spark.sparkContext
    counts = {}
    orig = CrawlEngine._run_round

    def counted(self, r, base_seq):
        group = f"jobcount-r{r}"
        sc.setJobGroup(group, group)
        try:
            out = orig(self, r, base_seq)
        finally:
            sc.setJobGroup(None, None)
        counts[r] = len(sc.statusTracker().getJobIdsForGroup(group))
        return out

    CrawlEngine._run_round = counted
    try:
        result = engine.run(max_rounds=10)
    finally:
        CrawlEngine._run_round = orig

    assert result.pages_fetched > 0
    # round 1 bootstraps caches; steady-state rounds must be fused:
    # 1 action + at most 1 broadcast-build job for the fixture web.
    steady = {r: c for r, c in counts.items() if r >= 2}
    assert steady, counts
    for r, c in steady.items():
        assert c <= 2, f"round {r} ran {c} jobs (fused path regressed): {counts}"


def test_slow_path_when_fetcher_has_side_effects(spark):
    """A fetcher without side_effect_free=True must keep the two-job
    path (stats aggregate first) so a multi-scan action can never
    re-run fetches."""
    web = make_webgraph(n_lists=2, details_per_list=3, images=make_images(2))
    web_df = webgraph_df(spark, web)
    spec = default_spec(budget=64)

    class OpaqueFetcher(SyntheticFetcher):
        side_effect_free = False
        fetch_calls = 0

    fetcher = OpaqueFetcher(web_df, spec)
    engine = CrawlEngine(
        spark, spec, fetcher, robots_fixture=ROBOTS_FIXTURE
    )
    result = engine.run(max_rounds=6)
    assert result.pages_fetched > 0
    # trace parity: the slow path produces the same outcome as goldens
    # elsewhere; here we only pin that it still completes and commits.
    assert result.rounds_run >= 2
