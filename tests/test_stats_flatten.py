"""Memory-store Catalyst stats hygiene (plans/crawl.py `_to_local`).

A localCheckpoint's LogicalRDD inherits its source plan's sizeInBytes;
per-host rounds multiply those stats through their joins, so a crawl
that only checkpoints compounds the stored frontier's sizeInBytes digit
count geometrically per round — a round-~10 planner stall
(BigInteger.multiply grind, measured 24,836,339 digits after 10 fixture
rounds). Periodic flattening cannot fix it (old checkpointed frames
persist in the cumulative union and keep compounding); a per-round
driver collect fixes it but cost 43% of the fixture engine bench. The
shipped fix severs stats JVM-side: checkpoint, then rewrap the internal
RDD via internalCreateDataFrame — constant defaultSizeInBytes per
stored frame, no driver round-trip, same single action per round.

Wall-clock asserts are meaningless on this VM, but the sizeInBytes
DIGIT COUNT of the stored frontier plan is deterministic — the guard
covers both failure directions:
  - severed arm: digits stay flat-bounded → no stall can re-develop
  - checkpoint-only arm: digits blow up → the metric really measures
    the compounding (if this stops failing, severing is dead weight)
  - traces match between arms → severing changes plans, not semantics
"""

import sys

from lightcrawler_spark.fixtures import (
    ROBOTS_FIXTURE,
    default_spec,
    make_images,
    make_webgraph,
    webgraph_df,
)
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher

_COMPOUNDED = 10**9  # sentinel: too many digits to even convert


def _stat_digits(df) -> int:
    """Digit count of the optimized plan's sizeInBytes estimate.
    Conversion-safe: a compounded BigInt can exceed CPython's int-parse
    limit inside py4j — that IS the failure being probed, so it maps to
    a huge sentinel instead of an error."""
    old = sys.get_int_max_str_digits()
    sys.set_int_max_str_digits(30_000)
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return len(str(stats.sizeInBytes()))
    except ValueError:
        return _COMPOUNDED
    finally:
        sys.set_int_max_str_digits(old)


def _run(spark, sever: bool, rounds: int):
    web = make_webgraph(n_lists=8, details_per_list=8,
                        images=make_images(8))
    web_df = webgraph_df(spark, web)
    spec = default_spec(
        budget=6,
        per_host_politeness=True,
        sever_stored_stats=sever,
    )
    engine = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                         robots_fixture=ROBOTS_FIXTURE)
    result = engine.run(max_rounds=rounds)
    stored = engine.store.read_upto("frontier", result.rounds_run)
    trace = sorted(
        (r["url"], r["round"]) for r in result.pages.select(
            "url", "round").collect()
    )
    return result, _stat_digits(stored), trace


def test_severed_stats_stay_flat_and_preserve_trace(spark):
    res_s, digits_sever, trace_sever = _run(spark, sever=True, rounds=12)
    assert res_s.rounds_run >= 10, "fixture must sustain 10+ rounds"
    # every stored frame carries the CONSTANT defaultSizeInBytes; the
    # union sums ~rounds of them (~21 digits measured) — growth with
    # rounds is additive, never multiplicative
    assert digits_sever <= 40, (
        f"stored frontier sizeInBytes has {digits_sever} digits — "
        "stats compounding is re-developing"
    )
    # semantics parity vs the checkpoint-only arm on a shared prefix:
    # severing changes statistics, not rows
    res_c, _, trace_ckpt = _run(spark, sever=False, rounds=7)
    prefix_s = [t for t in trace_sever if t[1] <= res_c.rounds_run]
    assert prefix_s == trace_ckpt


def test_checkpoint_only_arm_compounds(spark):
    """The failure mode is real: without severing, stored stats blow
    past any flat bound within a handful of rounds."""
    _, digits_never, _ = _run(spark, sever=False, rounds=7)
    assert digits_never > 5_000, (
        f"checkpoint-only arm stayed at {digits_never} digits — "
        "compounding gone; revisit whether severing is still needed"
    )


def _run_revisit(spark, sever: bool, rounds: int):
    """Memory-store crawl with the pages→pending feedback ON (revisit
    rules): pages stats must be severed too (CrawlEngine.
    _pages_feedback) — the left-anti seen join is left-child-stats-only
    so the frontier-side sever never covered this path, and the r5
    120-host live-soak revisit A/B found the re-closure as a driver
    heap OOM inside the sizeInBytes visitor."""
    web = make_webgraph(n_lists=6, details_per_list=6,
                        images=make_images(6))
    web_df = webgraph_df(spark, web)
    spec = default_spec(
        budget=6,
        per_host_politeness=True,
        sever_stored_stats=sever,
    )
    spec.revisit_url_rules = ["#/detail#"]
    spec.revisit_after_rounds = 2
    spec.max_revisits = 2
    engine = CrawlEngine(spark, spec, SyntheticFetcher(web_df, spec),
                         robots_fixture=ROBOTS_FIXTURE)
    result = engine.run(max_rounds=rounds)
    stored = engine.store.read_upto("pages", result.rounds_run)
    return result, _stat_digits(stored)


def test_pages_feedback_severed_stats_stay_flat(spark):
    res, digits = _run_revisit(spark, sever=True, rounds=12)
    assert res.rounds_run >= 8, "revisit fixture must sustain 8+ rounds"
    assert digits <= 40, (
        f"stored pages sizeInBytes has {digits} digits with revisit "
        "feedback on — the pages-side sever is dead or bypassed"
    )


def test_pages_feedback_unsevered_arm_compounds(spark):
    """Direction check: with severing off, the revisit feedback loop
    really does compound through the pages table (if this stops
    failing, the pages-side sever is dead weight)."""
    _, digits = _run_revisit(spark, sever=False, rounds=8)
    assert digits > 1_000, (
        f"unsevered revisit arm stayed at {digits} digits — "
        "pages-side compounding gone; revisit _pages_feedback"
    )
