"""The BSP crawl engine (SURVEY.md §3.4): one crawl round == one Spark job.

Replaces the reference's lock-serialized pop loop
(/root/reference/vendor/PHPCrawl_083/libs/PHPCrawler.class.php:632-695)
with rounds of pure DataFrame algebra over append-only round tables:

  round r:
    pending   = frontier(≤r-1)  ANTI  claimed(≤r-1)          -- A5 gate
    work      = top-B of pending by (priority DESC, seq ASC) -- P3 + P8
    results   = fetch(work)                                  -- S5
    trace    += results (global fetch sequence)              -- golden trace
    links     = extract(results)  → explode → admit (F1–F9)
    new       = first-wins(links) ANTI frontier(≤r)          -- P1
    frontier += new ; commit round watermark                 -- P4/P5 + resume

Determinism contract (the golden-trace anchor): pop order is
(priority_level DESC, insert_seq ASC) where insert_seq is the bit-packed
key ``(round+1) << 40 | src_fetch_rank << 20 | link_position`` — exactly
the reference's frontier insertion order under BSP, computed WITHOUT any
global counter or zipWithIndex (no extra shuffle, resume-safe). With the
reference politeness budget (1 fetch per round) the engine's trace equals
the reference's sequential trace row-for-row; larger budgets batch the
same order.

Scale properties: every per-round table is bounded by the politeness
budget (work) or the link fan-out of one round (new); the only joins
against unbounded state are the seen anti-join (bloom-prefiltered,
operators/dedup.py) and the pending anti-join (key-only). All heavy
predicates are JVM expressions; Python appears only in the Arrow-batched
extract/decode kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlSpec
from ..functions import urlkit
from ..operators import scheduler
from ..operators.admission import admission_predicate, apply_robots_filter, host_expr, robots_rules_df
from ..operators.dedup import first_wins_within_batch
from ..operators.extract import extract_links_udf
from .storage import MemoryRoundStore, RoundStore

__all__ = ["CrawlEngine", "CrawlResult"]

# insert_seq bit packing: 20 bits for link position within a page, 20 bits
# for the fetch rank within a round → budgets/pages up to ~1M links each.
_POS_BITS = 20
_RANK_BITS = 20

FRONTIER_COLS = [
    "url", "url_md5", "host", "depth", "referer", "link_raw", "linktext",
    "is_redirect", "priority_level", "insert_seq",
]


@dataclass
class CrawlResult:
    trace: DataFrame       # seq, round, url, url_md5, depth, referer, priority_level, status
    frontier: DataFrame    # every URL ever admitted (== the seen set)
    pages: DataFrame | None  # fetched page rows of the final run
    rounds_run: int
    pages_fetched: int


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        spec: CrawlSpec,
        fetcher,
        store=None,
        robots_fixture: list[tuple[str, str]] | None = None,
    ):
        self.spark = spark
        self.spec = spec
        self.fetcher = fetcher
        self.store = store or MemoryRoundStore(spark)
        self.robots_rules = None
        if spec.obey_robots_txt and robots_fixture:
            self.robots_rules = robots_rules_df(
                spark, robots_fixture, spec.user_agent
            ).cache()

    # -- frontier bootstrap --------------------------------------------------
    def _seed_frontier(self) -> DataFrame:
        rows = []
        for i, s in enumerate(self.spec.seeds):
            norm = urlkit.normalize_url(s)
            if norm is None:
                continue
            rows.append(
                (
                    norm,
                    urlkit.url_md5(norm),
                    urlkit.split_url(norm).host,
                    # first seed depth 0, extra seeds depth 1
                    # (PHPCrawler.class.php:376-385, 1190-1200)
                    0 if i == 0 else 1,
                    None, None, None, False,
                    0,  # priority assigned below
                    i,  # insert_seq: seeds occupy the low range
                )
            )
        df = self.spark.createDataFrame(
            rows,
            "url string, url_md5 string, host string, depth int, "
            "referer string, link_raw string, linktext string, "
            "is_redirect boolean, priority_level int, insert_seq long",
        )
        return scheduler.assign_priority(df, self.spec.priority_rules)

    # -- one BSP round ---------------------------------------------------------
    def _run_round(self, r: int, base_seq: int) -> tuple[int, bool]:
        """Returns (pages_fetched, frontier_grew)."""
        spec = self.spec
        frontier = self.store.read_upto("frontier", r - 1)
        claimed = self.store.read_upto("claimed", r - 1)
        pending = frontier.drop("round")
        if claimed is not None:
            pending = pending.join(
                claimed.select("url_md5"), "url_md5", "left_anti"
            )
        pending_before_cooldown = pending
        if spec.host_delay_rounds > 0:
            # P8 cross-round cooldown: hosts fetched within the last
            # host_delay_rounds rounds are ineligible this round. The
            # host_state rows carry their round via the store's lineage
            # column, so "last fetch round per host" is a groupBy max —
            # resume-safe (uncommitted rounds are purged with the rest).
            host_state = self.store.read_upto("host_state", r - 1)
            if host_state is not None:
                cooling = (
                    host_state.groupBy("host")
                    .agg(F.max("round").alias("_last_round"))
                    .filter(F.lit(r) - F.col("_last_round")
                            < F.lit(spec.host_delay_rounds))
                    .select("host")
                )
                pending = pending.join(F.broadcast(cooling), "host", "left_anti")
        if spec.request_limit:
            remaining = spec.request_limit - base_seq
            if remaining <= 0:
                return 0, False
        else:
            remaining = 2 ** 31 - 1

        budget = min(spec.budget_per_round, remaining)
        work = scheduler.pop_batch(pending, spec)
        if spec.per_host_politeness:
            # cap the round total as well when a global request_limit exists
            work = work.withColumn(
                "fetch_rank",
                F.row_number().over(
                    Window.orderBy(*scheduler.pop_order())
                ),
            ).filter(F.col("fetch_rank") <= budget)
        else:
            work = work.withColumnRenamed("pop_rank", "fetch_rank").filter(
                F.col("fetch_rank") <= budget
            )

        # host-salted repartition ahead of the fetch stage (skew defusal for
        # real fetch workloads); skipped for small budgets where the extra
        # shuffle costs more than the skew it prevents
        if budget >= 64:
            work = scheduler.salted_repartition(work, "host", salt_buckets=8)

        results = self.fetcher.fetch(work).localCheckpoint(eager=True)
        n_fetched = results.count()
        if n_fetched == 0:
            if (
                spec.host_delay_rounds > 0
                and pending.limit(1).count() == 0
                and pending_before_cooldown.limit(1).count() > 0
            ):
                # the cooldown filter removed EVERY pending row: an idle
                # politeness round — commit it so cooldowns age. If
                # pending survived the cooldown yet nothing was fetched,
                # the work is unfetchable: terminate instead of spinning
                # empty rounds until max_rounds.
                return 0, True
            return 0, False

        trace = results.select(
            (F.lit(base_seq) + F.col("fetch_rank") - 1).alias("seq"),
            "url", "url_md5", "depth", "referer", "priority_level",
            F.col("status").cast("int").alias("status"),
            "bytes_received",
            F.col("latency_ms").cast("int").alias("latency_ms"),
        )
        self.store.write("trace", r, trace)
        self.store.write("claimed", r, results.select("url_md5"))
        if spec.host_delay_rounds > 0:
            self.store.write("host_state", r, results.select("host").distinct())
        self.store.write(
            "pages", r,
            results.select(
                "url", "url_md5", "depth", "status", "content_type",
                "body", "body_text", "bytes_received", "fetch_rank",
            ),
        )

        # ---- extract + admit -----------------------------------------------
        links = (
            results.withColumn(
                "links",
                extract_links_udf(
                    F.col("body_text"), F.col("url"), F.col("redirect_to")
                ),
            )
            .select(
                F.col("url").alias("referer"),
                F.col("depth").alias("src_depth"),
                F.col("fetch_rank").alias("src_rank"),
                F.posexplode_outer("links").alias("link_pos", "l"),
            )
            .filter(F.col("l").isNotNull())
            .select(
                "referer", "src_rank", "link_pos",
                F.col("l.link_raw").alias("link_raw"),
                F.col("l.linkcode").alias("linkcode"),
                F.col("l.linktext").alias("linktext"),
                F.col("l.url").alias("url"),
                F.col("l.is_redirect").alias("is_redirect"),
                (F.col("src_depth") + 1).alias("depth"),
            )
        )

        admitted = links.filter(
            admission_predicate(spec, self.spec.seeds[0])
        )
        if self.robots_rules is not None:
            admitted = apply_robots_filter(admitted, self.robots_rules)

        # insert_seq: deterministic bit-packed insertion order (no counter)
        admitted = admitted.withColumn(
            "insert_seq",
            F.lit(r + 1).cast("long") * F.lit(1 << (_POS_BITS + _RANK_BITS))
            + F.col("src_rank").cast("long") * F.lit(1 << _POS_BITS)
            + F.col("link_pos").cast("long"),
        ).withColumn("url_md5", F.md5("url")).withColumn(
            "host", host_expr(F.col("url"))
        )

        admitted = scheduler.assign_priority(admitted, spec.priority_rules)
        new = first_wins_within_batch(admitted, "url_md5", "insert_seq")
        new = new.join(
            frontier.select("url_md5"), "url_md5", "left_anti"
        ).select(*FRONTIER_COLS)

        # materialize now: `new` feeds every later round's cumulative
        # frontier — keeping it lazy chains plans across rounds
        self.store.write("frontier", r, new.localCheckpoint(eager=True))
        return n_fetched, True

    # -- driver loop -------------------------------------------------------
    def run(self, max_rounds: int | None = None, resume: bool = False) -> CrawlResult:
        spec = self.spec
        max_rounds = max_rounds or spec.max_rounds

        start_round = 0
        if resume:
            wm = self.store.last_complete_round()
            self.store.purge_inflight(wm)  # P6: kill in-flight work
            start_round = wm + 1
        else:
            self.store.purge_inflight(-1)

        if start_round == 0:
            # round -1 == seeding; stored as frontier round 0's base? No:
            # store the seed rows as frontier round=0 with no claims yet.
            self.store.write(
                "frontier", 0, self._seed_frontier().localCheckpoint(eager=True)
            )
            self.store.commit_round(0)
            start_round = 1
            base_seq = 0
        else:
            t = self.store.read_upto("trace", start_round - 1)
            base_seq = t.count() if t is not None else 0

        rounds_run = 0
        r = start_round
        while r < start_round + max_rounds:
            fetched, keep_going = self._run_round(r, base_seq)
            if fetched == 0 and not keep_going:
                break
            self.store.commit_round(r)
            base_seq += fetched
            rounds_run += 1
            r += 1
            if spec.request_limit and base_seq >= spec.request_limit:
                break

        wm = self.store.last_complete_round()
        trace = self.store.read_upto("trace", wm)
        frontier = self.store.read_upto("frontier", wm)
        pages = self.store.read_upto("pages", wm)
        return CrawlResult(
            trace=trace,
            frontier=frontier,
            pages=pages,
            rounds_run=rounds_run,
            pages_fetched=base_seq,
        )
