"""The BSP crawl engine (SURVEY.md §3.4): one crawl round == one Spark job.

Replaces the reference's lock-serialized pop loop
(/root/reference/vendor/PHPCrawl_083/libs/PHPCrawler.class.php:632-695)
with rounds of pure DataFrame algebra over append-only round tables:

  round r:
    pending   = frontier(≤r-1)  ANTI  pages(≤r-1)             -- A5 gate
    work      = top-B of pending by (priority DESC, seq ASC)  -- P3 + P8
    results   = fetch(work)  (inline retry P9 inside)         -- S5
    pages    += results (ONE unified round table: trace =      -- golden trace
                claimed = host-state = projections of it)
    links     = extract(results) → explode → admit
                (F1–F8 battery + page-nofollow F3; or F9
                redirect-only while bootstrapping)
    new       = first-wins(links) ANTI frontier(≤r)           -- P1
    frontier += new ; commit round watermark                  -- P4/P5 + resume

Determinism contract (the golden-trace anchor): pop order is
(priority_level DESC, insert_seq ASC) where insert_seq is the bit-packed
key ``(round+1) << 40 | src_fetch_rank << 20 | link_position`` — exactly
the reference's frontier insertion order under BSP, computed WITHOUT any
global counter or zipWithIndex (no extra shuffle, resume-safe). With the
reference politeness budget (1 fetch per round) the engine's trace equals
the reference's sequential trace row-for-row; larger budgets batch the
same order. Retries (P9) happen INLINE within a pop, like the reference
(PHPCrawler.class.php:735-762) — each pop still counts once against the
round budget, while `n_attempts` surfaces in the trace.

F9 redirect-only bootstrap (PHPCrawler.class.php:800-823): until the
first status-200 page is seen, only redirect links enter the frontier
(depth handed back, ALL other admission checks bypassed — matching
keepRedirectUrls, which skips urlMatchesRules entirely); when content is
found the URL filter re-bases to that page (setBaseURL), so follow-mode
checks compare against the first CONTENT url, not the seed.

P10 budget checks (PHPCrawler.class.php:860-900): the driver loop stops
with an abort_reason mirroring PHPCrawlerAbortReasons (passedthrough /
trafficlimit / filelimit / roundlimit).

Driver-job discipline (the per-round overhead budget): ONE Spark job per
round on the common path. The round stats (count, bytes, set-cookie
tally) ride the new-frontier materialization as an `Observation`
(CollectMetrics — computed on the rows already flowing through the
action, zero extra jobs), and the fetch results' lazy localCheckpoint is
materialized by that same action, so pages/trace projections read cached
blocks. Rounds whose PLAN depends on this round's data fall back to a
separate stats aggregate first: F9 bootstrap (the admission split needs
first_content_rank before the link plan exists) and per-host live-robots
learning (needs the admitted hosts mid-round); durable stores pay their
writes instead of the checkpoints. Small budgets also clamp shuffle
partitions for the round so micro-round stages don't schedule hundreds
of empty tasks.

Scale properties: every per-round table is bounded by the politeness
budget (work) or the link fan-out of one round (new); the only joins
against unbounded state are the seen anti-join (bloom-prefiltered,
operators/dedup.py) and the pending anti-join (key-only). All heavy
predicates are JVM expressions; Python appears only in the Arrow-batched
extract/decode kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlSpec
from ..functions import urlkit
from ..operators import scheduler
from ..operators.admission import (
    admission_predicate,
    apply_robots_filter,
    host_expr,
    parse_robots_body,
    parse_robots_crawl_delay,
    robots_deny_predicate,
    robots_rules_df,
)
from ..operators.dedup import first_wins_within_batch
from ..operators.extract import (
    extract_links_udf,
    page_nofollow_udf,
    synthesize_pagination,
)
from .storage import MemoryRoundStore, RoundStore

__all__ = ["CrawlEngine", "CrawlResult", "ABORT_PASSEDTHROUGH",
           "ABORT_TRAFFICLIMIT", "ABORT_FILELIMIT", "ABORT_ROUNDLIMIT"]

# insert_seq bit packing: 20 bits for link position within a page, 20 bits
# for the fetch rank within a round → budgets/pages up to ~1M links each.
_POS_BITS = 20
_RANK_BITS = 20
# low slice of each page's pos range reserved for pagination feeds
# (addFeed inserts run BEFORE the page's extracted links)
_FEED_POS_SLOTS = 1024

FRONTIER_COLS = [
    "url", "url_md5", "host", "depth", "referer", "link_raw", "linktext",
    "is_redirect", "priority_level", "insert_seq",
]

# mirrors Enums/PHPCrawlerAbortReasons.class.php:9-34 (roundlimit is ours:
# the BSP driver's max_rounds has no reference analog)
ABORT_PASSEDTHROUGH = "passedthrough"   # ABORTREASON_PASSEDTHROUGH
ABORT_TRAFFICLIMIT = "trafficlimit"     # ABORTREASON_TRAFFICLIMIT_REACHED
ABORT_FILELIMIT = "filelimit"           # ABORTREASON_FILELIMIT_REACHED
ABORT_ROUNDLIMIT = "roundlimit"

# unified per-round table: trace, claimed and host_state are projections
PAGES_COLS = [
    "seq", "url", "url_md5", "host", "depth", "referer", "priority_level",
    "status", "content_type", "body", "body_text", "bytes_received",
    "latency_ms", "n_attempts", "benchmarks", "fetch_rank", "retry_after",
    # conditional-revalidation validators harvested from the response
    # (opaque strings; feed the next revisit's If-None-Match /
    # If-Modified-Since when spec.conditional_get)
    "etag", "last_modified",
    # frontier-insert lineage: drives the per-host claimed-watermark
    # pending fast path (see _run_round) and lets any page row be traced
    # back to the exact frontier insertion that produced it
    "insert_seq",
]


def _observed_stats(obs: Observation, timeout_s: float = 10.0) -> dict | None:
    """Non-blocking read of an Observation after its action completed.

    The ExecutionListenerBus delivers CollectMetrics results a few ms
    after the action returns, so poll ``getRowOrEmpty`` instead of the
    blocking ``Observation.get`` — if the metrics never arrive (listener
    dropped, or an optimizer collapsed the observed subtree) the caller
    re-aggregates rather than deadlocking the driver loop."""
    import time as _time

    from pyspark.serializers import CPickleSerializer

    deadline = _time.time() + timeout_s
    while True:
        opt = obs._jo.getRowOrEmpty()
        if opt.isDefined():
            utils = getattr(
                obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
            )
            row = CPickleSerializer().loads(utils.toPyRow(opt.get()))
            return row.asDict(recursive=False)
        if _time.time() > deadline:
            return None
        _time.sleep(0.005)


@dataclass
class CrawlResult:
    trace: DataFrame       # seq, round, url, url_md5, depth, referer, priority_level, status, ...
    frontier: DataFrame    # every URL ever admitted (== the seen set)
    pages: DataFrame | None  # fetched page rows of the final run
    rounds_run: int
    pages_fetched: int
    bytes_received: int = 0
    abort_reason: str = ABORT_PASSEDTHROUGH


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        spec: CrawlSpec,
        fetcher,
        store=None,
        robots_fixture: list[tuple[str, str]] | None = None,
        cookie_jar=None,
        send_data_rules=None,
        harvest_cookies: bool = True,
    ):
        self.spark = spark
        self.spec = spec
        self.fetcher = fetcher
        self.store = store or MemoryRoundStore(spark)
        # P12/P13: optional broadcast-side dimension tables attached to
        # each round's work-list (cookie_header / post_data / auth
        # columns, consumed by HttpFetcher — PHPCrawler.class.php:718-733)
        self.cookie_jar = cookie_jar
        self.send_data_rules = send_data_rules
        # P12 harvest-back: Set-Cookie headers from each round's
        # responses are parsed into the jar between rounds (the
        # reference stores them on every pop, PHPCrawler.class.php:830;
        # under BSP a cookie becomes attachable one round later). Rows
        # are also written to the store's `cookies` table, so the jar —
        # like the reference's SQLite cookie cache — survives resume.
        self.harvest_cookies = harvest_cookies
        # F8: small rule sets fold into one literal predicate (no
        # broadcast sub-job per round); big ones broadcast anti-join
        self.robots_rules = None
        self.robots_pairs: list[tuple[str, str]] | None = None
        # S6 live acquisition: with obey_robots_txt and NO fixture, the
        # engine fetches robots.txt itself through its own fetcher —
        # seed hosts at startup (reference parity,
        # PHPCrawler.class.php:522-524) and, in "per_host" mode, each
        # new host its links introduce (once, cached driver-side).
        self._robots_live = spec.obey_robots_txt and robots_fixture is None
        self._robots_hosts_fetched: set[str] = set()
        # P8 extension: robots Crawl-delay → per-host budgets (used only
        # with per_host_politeness + honor_crawl_delay). Filled from the
        # fixture here and from live robots fetches as hosts appear.
        self._host_delays: dict[str, float] = {}
        self._host_budgets_cache: tuple | None = None
        # sitemap bootstrap (spec.ingest_sitemaps): robots BODIES are
        # kept (fixture order / live arrival order) so round 0 can scan
        # them for `Sitemap:` directives
        self._robots_bodies: list[tuple[str, str]] = (
            list(robots_fixture or []) if spec.ingest_sitemaps else []
        )
        if spec.obey_robots_txt and robots_fixture:
            pairs = [
                (host, p)
                for host, body in robots_fixture
                for p in parse_robots_body(body, spec.user_agent, f"http://{host}")
            ]
            for host, body in robots_fixture:
                d = parse_robots_crawl_delay(body, spec.user_agent)
                if d is not None:
                    self._host_delays[host] = d
            if len(pairs) <= 64:
                self.robots_pairs = pairs
            else:
                self.robots_rules = robots_rules_df(
                    spark, robots_fixture, spec.user_agent
                ).cache()
        elif self._robots_live:
            self.robots_pairs = []
        # F9 state: first 200-status page url (None → still bootstrapping
        # when spec.follow_redirects_till_content)
        self._first_content_url: str | None = None
        self._bytes_total = 0
        # per-round plan-construction caches (Column trees are immutable
        # and DataFrame-independent — reuse across rounds)
        self._battery_pred_cache: dict = {}
        self._stat_cols_cache: dict = {}
        # frontier-size bookkeeping for the drained-skip: None = unknown
        # (resume, or any slow-path round ran without observing n_new)
        self._frontier_total: int | None = None
        # Round-scoped localCheckpoint block handles (java RDDs). Durable
        # stores re-read every committed row from parquet, so a round's
        # checkpointed fetch blocks are dead weight the moment the round
        # commits — but Spark never frees them (localCheckpoint persists
        # the RDD outside the cache manager, so DataFrame.unpersist can't
        # reach it). Without this, a long crawl accumulates one round's
        # worth of MEMORY_AND_DISK blocks per round until the driver heap
        # dies (measured: OOM at round 25 of the 5.2e5-URLs/round soak in
        # an 8g heap). Freed in run() right after commit_round; memory
        # stores keep their blocks (their tables ARE the blocks).
        self._round_block_rdds: list = []
        # previous round's fetched-page count: drives the rows-based
        # fetch-repartition gate (spec.fetch_repartition_rows) without an
        # extra count job. Starts 0 (seed rounds are small); after a
        # resume the first round may run under-partitioned once, which is
        # the cheapest correct behavior.
        self._prev_round_n: int = 0

    # -- S6: live robots.txt acquisition -------------------------------------
    def _fetch_robots_live(self, host_roots: list[tuple[str, str]]) -> None:
        """Fetch ``<root>/robots.txt`` for hosts not yet seen, parse the
        bodies (same parse_robots_body as the fixture path), and fold
        the Disallow prefixes into the active rule set.

        Matches PHPCrawlerRobotsTxtParser::process
        (PHPCrawlerRobotsTxtParser.class.php:30-60): its getURIContent
        reads the body regardless of content type, so an HttpFetcher is
        re-specced with a catch-all receive rule for this one fetch; a
        non-200 answer means no rules for that host (also cached, so a
        dead robots endpoint is not re-fetched every round). The fetch
        runs through the engine's own fetcher OUTSIDE the politeness
        budget and never enters the trace — exactly like the
        reference's out-of-band robots fetch."""
        todo = [
            (h, root) for h, root in host_roots
            if root not in self._robots_hosts_fetched
        ]
        if not todo:
            return
        # keyed by root (scheme://host[:port]) — robots prefixes carry
        # the port, hosts serving on two ports fetch twice, like the
        # reference's per-normalized-base robots URLs
        self._robots_hosts_fetched.update(root for _, root in todo)

        fetcher = self.fetcher
        from ..sources.fetcher import HttpFetcher

        if isinstance(fetcher, HttpFetcher):
            import dataclasses

            permissive = dataclasses.replace(
                self.spec, content_type_receive_rules=[r"#.*#"]
            )
            fetcher = HttpFetcher(permissive, timeout_s=fetcher.timeout_s)
        work = self.spark.createDataFrame(
            [(f"{root}/robots.txt", h, root) for h, root in todo],
            "url string, _rb_host string, _rb_root string",
        )
        rows = fetcher.fetch(work).select(
            "_rb_host", "_rb_root", "status", "body"
        ).collect()
        new_pairs: list[tuple[str, str]] = []
        for row in rows:
            if row["status"] == 200 and row["body"] is not None:
                body = bytes(row["body"]).decode("utf-8", errors="replace")
                if self.spec.ingest_sitemaps:
                    self._robots_bodies.append((row["_rb_host"], body))
                new_pairs += [
                    (row["_rb_host"], p)
                    for p in parse_robots_body(
                        body, self.spec.user_agent, row["_rb_root"]
                    )
                ]
                d = parse_robots_crawl_delay(body, self.spec.user_agent)
                if d is not None:
                    self._host_delays[row["_rb_host"]] = d
        if not new_pairs:
            return
        if self.robots_pairs is not None and len(self.robots_pairs) + len(new_pairs) <= 64:
            self.robots_pairs = self.robots_pairs + new_pairs
        else:
            # rule set outgrew the literal-predicate form → broadcast table
            all_pairs = (self.robots_pairs or []) + new_pairs
            self.robots_pairs = None
            fresh = self.spark.createDataFrame(
                all_pairs, "host string, deny_prefix string"
            )
            if self.robots_rules is not None:
                fresh = self.robots_rules.unionByName(fresh)
            self.robots_rules = fresh.localCheckpoint(eager=True)

    def _host_budgets_df(self) -> DataFrame | None:
        """(host, host_budget) override dim for pop_per_host, from the
        robots Crawl-delay map (fixture-parsed at init, live-fetched as
        hosts appear). Tiny by construction — one row per host that
        DECLARED a delay — and rebuilt only when the map changes."""
        spec = self.spec
        if not (
            spec.per_host_politeness
            and spec.honor_crawl_delay
            and self._host_delays
        ):
            return None
        snapshot = tuple(sorted(self._host_delays.items()))
        if self._host_budgets_cache and self._host_budgets_cache[0] == snapshot:
            return self._host_budgets_cache[1]
        df = self.spark.createDataFrame(
            [(h, spec.budget_for_delay(d)) for h, d in snapshot],
            "host string, host_budget int",
        )
        self._host_budgets_cache = (snapshot, df)
        return df

    def _seed_hosts(self) -> list[tuple[str, str]]:
        import re as _re

        roots = []
        for s in self.spec.seeds:
            norm = urlkit.normalize_url(s) or s
            parts = urlkit.split_url(norm)
            m = _re.match(r"^([a-zA-Z0-9+.-]+://[^/?#]+)", norm)
            if parts is not None and parts.host and m:
                # root keeps a non-default port (robots prefixes must
                # literally prefix the crawled URLs)
                roots.append((parts.host, m.group(1)))
        return roots

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
        )  # bare LocalTableScan: keep the broadcast/collect fast paths
        self._frontier_total = len(rows)  # drained-skip baseline
        return scheduler.assign_priority(df, self.spec.priority_rules)

    # -- sitemap bootstrap (spec.ingest_sitemaps) -----------------------------
    def _fetch_bodies(self, urls: list[str]) -> dict[str, str]:
        """Out-of-band fetch (robots-style: permissive receive rules,
        outside the politeness budget, never in the trace) returning
        url → decoded body for 200 responses."""
        if not urls:
            return {}
        fetcher = self.fetcher
        from ..sources.fetcher import HttpFetcher

        if isinstance(fetcher, HttpFetcher):
            import dataclasses

            fetcher = HttpFetcher(
                dataclasses.replace(
                    self.spec, content_type_receive_rules=[r"#.*#"]
                ),
                timeout_s=fetcher.timeout_s,
            )
        work = self.spark.createDataFrame([(u,) for u in urls], "url string")
        rows = fetcher.fetch(work).select("url", "status", "body").collect()
        return {
            r["url"]: bytes(r["body"]).decode("utf-8", errors="replace")
            for r in rows
            if r["status"] == 200 and r["body"] is not None
        }

    def _sitemap_frontier(self, n_seeds: int) -> DataFrame | None:
        """Round-0 sitemap ingestion: `Sitemap:` directives from the
        acquired robots bodies → out-of-band fetch → parse (one level of
        <sitemapindex> recursion, per the sitemaps.org protocol) →
        <loc> entries resolved (C3) and pushed through the FULL F1-F8
        battery (base = first seed; no F9 bypass — ingestion is defined
        outside the redirect bootstrap) → frontier rows at depth 1.

        insert_seq is bit-packed discovery order (wave, sitemap index,
        document position) offset past the seeds and far below round-1
        links' (r+1)<<40 base, so pop order is exactly the simulator's
        consecutive-push order without a global rank window. Bootstrap
        volumes are protocol-bounded (≤50k locs per sitemap), so the
        two driver collects here are one-time O(sitemaps) costs."""
        import re as _re

        from ..functions.spark_udfs import resolve_link_udf
        from ..operators.sitemap import _SITEMAP_DIRECTIVE, parse_sitemaps

        seen_sm: set[str] = set()
        wave0: list[str] = []
        for _host, body in self._robots_bodies:
            for m in _re.finditer(_SITEMAP_DIRECTIVE, body):
                u = m.group(1)
                if u not in seen_sm:
                    seen_sm.add(u)
                    wave0.append(u)
        if not wave0:
            return None

        spark = self.spark

        def parse_wave(wave_no: int, sm_urls: list[str]) -> DataFrame | None:
            bodies = self._fetch_bodies(sm_urls)
            rows = [
                (wave_no, idx, u, bodies[u])
                for idx, u in enumerate(sm_urls)
                if u in bodies
            ]
            if not rows:
                return None
            df = spark.createDataFrame(
                rows, "wave int, sm_idx int, sitemap_url string, body string"
            )
            parsed = parse_sitemaps(df)
            order = df.select("wave", "sm_idx", "sitemap_url")
            return parsed.join(F.broadcast(order), "sitemap_url")

        parsed0 = parse_wave(0, wave0)
        if parsed0 is None:
            return None
        parsed0 = parsed0.localCheckpoint(eager=True)  # read twice below

        children: list[str] = []
        for r in (
            parsed0.filter(F.col("kind") == "index")
            .select("sm_idx", "seq", "loc", "sitemap_url")
            .sort("sm_idx", "seq")
            .collect()
        ):
            parts = urlkit.split_url(r["sitemap_url"])
            cu = urlkit.build_url_from_link(r["loc"], parts) if parts else None
            if cu and cu not in seen_sm:
                seen_sm.add(cu)
                children.append(cu)
        parsed1 = parse_wave(1, children) if children else None

        locs = parsed0.filter(F.col("kind") == "urlset")
        if parsed1 is not None:
            # an index inside a child sitemap is NOT followed (the
            # protocol allows one level of nesting)
            locs = locs.unionByName(
                parsed1.filter(F.col("kind") == "urlset")
            )

        cand = locs.select(
            resolve_link_udf(F.col("loc"), F.col("sitemap_url")).alias("url"),
            F.col("loc").alias("link_raw"),
            F.lit(None).cast("string").alias("linktext"),
            F.lit(None).cast("string").alias("linkcode"),
            F.lit(1).alias("depth"),
            F.lit(False).alias("is_redirect"),
            F.col("sitemap_url").alias("referer"),
            F.lit(False).alias("page_nofollow"),
            "wave", "sm_idx", "seq",
        ).filter(F.col("url").isNotNull())

        spec = self.spec
        pred = admission_predicate(
            spec, spec.seeds[0], page_nofollow=F.col("page_nofollow")
        )
        if self.robots_pairs is not None:
            pred = pred & robots_deny_predicate(self.robots_pairs)
        if spec.drop_traps:
            from ..operators.traps import is_trap_expr

            pred = pred & ~is_trap_expr(F.col("url"))
        out = cand.filter(pred)
        if self.robots_rules is not None:
            out = apply_robots_filter(out, self.robots_rules)

        # discovery-order key: stays past the seeds and far below the
        # round-1 link base (1 << 40)
        packed = (
            F.col("wave").cast("long") * F.lit(1 << 26)
            + F.col("sm_idx").cast("long") * F.lit(1 << 16)
            + F.least(F.col("seq").cast("long"), F.lit((1 << 16) - 1))
        )
        rows = out.select(
            "url",
            F.md5("url").alias("url_md5"),
            host_expr(F.col("url")).alias("host"),
            F.col("depth").cast("int").alias("depth"),
            "referer", "link_raw", "linktext", "is_redirect",
            F.lit(0).alias("priority_level"),
            (F.lit(n_seeds).cast("long") + packed).alias("insert_seq"),
        )
        return scheduler.assign_priority(rows, spec.priority_rules)

    # -- P7 revisit scheduling (spec.revisit_url_rules) -----------------------
    def _revisit_pred(self):
        from functools import reduce

        rules = self.spec.std_rules(self.spec.revisit_url_rules)
        return reduce(
            lambda a, b: a | b, [F.col("url").rlike(x) for x in rules]
        )

    def _revisit_candidates(self, claimed: DataFrame, r: int) -> DataFrame:
        """Round-r revisit rows, DERIVED from the committed pages (no
        state table; resume-safe by construction): per matching URL —
        fetch count n and last fetch round from one groupBy, the
        ORIGINAL row attributes via min_by(seq); eligible when
        n <= max_revisits and the last fetch is revisit_after_rounds
        old. insert_seq = 1<<61 + original seq: unique, stable across
        recomputation (deterministic pop order), and ABOVE every fresh
        row — fresh discovery outranks revisits at equal priority."""
        spec = self.spec
        hist = (
            claimed.filter(self._revisit_pred())
            .groupBy("url_md5")
            .agg(
                F.count("*").alias("_n"),
                F.max("round").alias("_last"),
                F.min_by(
                    F.struct("url", "host", "depth", "referer",
                             "priority_level", "insert_seq"),
                    "seq",
                ).alias("_row"),
                # conditional_get: the latest NON-NULL validator per
                # family — a 304 from a terse real server may omit
                # ETag/Last-Modified (RFC-legal), and overwriting with
                # its null would force the next revisit unconditional,
                # halving the bandwidth saving. max(struct(seq, v))
                # over non-null v = argmax-seq among rows that carried
                # one. Pre-upgrade stores lack the columns entirely
                # (they joined PAGES_COLS this round): fall back to
                # null literals so resume keeps working.
                *(
                    [
                        F.max(
                            F.when(
                                F.col("etag").isNotNull(),
                                F.struct("seq", "etag"),
                            )
                        )["etag"].alias("_etag"),
                        F.max(
                            F.when(
                                F.col("last_modified").isNotNull(),
                                F.struct("seq", "last_modified"),
                            )
                        )["last_modified"].alias("_lm"),
                    ]
                    if "etag" in claimed.columns
                    else [
                        F.max(F.lit(None).cast("string")).alias("_etag"),
                        F.max(F.lit(None).cast("string")).alias("_lm"),
                    ]
                ),
            )
        )
        elig = hist.filter(
            (F.col("_n") <= F.lit(int(spec.max_revisits)))
            & (F.lit(r) - F.col("_last")
               >= F.lit(int(spec.revisit_after_rounds)))
        )
        return elig.select(
            F.col("_row.url").alias("url"),
            "url_md5",
            F.col("_row.host").alias("host"),
            F.col("_row.depth").alias("depth"),
            F.col("_row.referer").alias("referer"),
            F.lit(None).cast("string").alias("link_raw"),
            F.lit(None).cast("string").alias("linktext"),
            F.lit(False).alias("is_redirect"),
            F.col("_row.priority_level").alias("priority_level"),
            (F.lit(1 << 61) + F.col("_row.insert_seq")).alias("insert_seq"),
            F.col("_etag").alias("if_none_match"),
            F.col("_lm").alias("if_modified_since"),
        )

    def _future_revisits(self, r: int) -> bool:
        """True when some matching URL still has revisit budget — the
        crawl idles (committing empty rounds so age advances) instead
        of draining. Runs only on otherwise-empty rounds. Revisits on
        QUOTA-CAPPED hosts don't count: the pending filter would delete
        them every round, so counting them would idle-spin the crawl to
        max_rounds instead of draining."""
        spec = self.spec
        claimed = self._pages_upto(r)
        if claimed is None:
            return False
        cands = (
            claimed.filter(self._revisit_pred())
            .groupBy("url_md5")
            .agg(
                F.count("*").alias("_n"),
                F.first("host").alias("host"),
            )
            .filter(F.col("_n") <= F.lit(int(spec.max_revisits)))
        )
        if spec.host_page_cap > 0 or spec.host_byte_cap > 0:
            totals = claimed.groupBy("host").agg(
                F.count(F.lit(1)).alias("_n_pages"),
                F.coalesce(
                    F.sum(F.col("bytes_received").cast("long")), F.lit(0)
                ).alias("_n_bytes"),
            )
            cap_pred = F.lit(False)
            if spec.host_page_cap > 0:
                cap_pred = cap_pred | (
                    F.col("_n_pages") >= F.lit(int(spec.host_page_cap))
                )
            if spec.host_byte_cap > 0:
                cap_pred = cap_pred | (
                    F.col("_n_bytes") >= F.lit(int(spec.host_byte_cap))
                )
            capped = totals.filter(cap_pred).select("host")
            cands = cands.join(F.broadcast(capped), "host", "left_anti")
        return cands.limit(1).count() > 0

    # -- unified round-table projections -------------------------------------
    def _pages_upto(self, r: int) -> DataFrame | None:
        return self.store.read_upto("pages", r)

    def _trace_upto(self, r: int) -> DataFrame | None:
        p = self._pages_upto(r)
        if p is None:
            return None
        return p.select(
            "seq", "round", "url", "url_md5", "depth", "referer",
            "priority_level", "status", "bytes_received", "latency_ms",
            "n_attempts", "benchmarks",
        )

    # -- one BSP round ---------------------------------------------------------
    def _run_round(self, r: int, base_seq: int) -> tuple[int, bool]:
        """Returns (pages_fetched, frontier_grew)."""
        spec = self.spec
        frontier = self.store.read_upto("frontier", r - 1)
        claimed = self._pages_upto(r - 1)
        pending = frontier.drop("round")
        if spec.frontier_ttl_rounds > 0:
            # frontier TTL: expire fresh rows whose packed insertion
            # round (insert_seq >> 40; seeds/sitemap rows pack round 0,
            # round-r discoveries pack r+1) is more than ttl rounds old.
            # BEFORE the anti-join, so expired rows never ride the
            # round's wide pending shuffle.
            pending = pending.filter(
                F.lit(r)
                - F.shiftright(F.col("insert_seq"),
                               _POS_BITS + _RANK_BITS)
                <= F.lit(int(spec.frontier_ttl_rounds))
            )
        if claimed is not None:
            # Pending = frontier − claimed. The generic form is a
            # url_md5 anti-join — an O(frontier) full-width shuffle every
            # round, the measured per-round scale cost. With uniform
            # priorities (no priority_rules) the pop order per host is
            # insert_seq ASC, so the claimed set per host is always an
            # exact PREFIX of that host's insert_seq order (pops take
            # the smallest pending seqs; inline retries mark-followed
            # unconditionally; caps/cooldowns/crawl-delay budgets only
            # shrink the per-host take-k, never skip within it; new
            # inserts of round r are bit-packed above every earlier
            # round's seqs). Pending is then a per-host watermark
            # filter: seq > max(claimed seq of host) — a tiny
            # groupBy(host) partial agg joined on host. AQE broadcasts
            # the dim when hosts are few; when it shuffles instead, the
            # hash(host) partitioning is exactly what the pop window
            # needs next, so there is still only ONE wide exchange.
            # Priority rules reorder pops within a host → prefix breaks
            # → keep the exact anti-join for those crawls. Durable
            # stores only: the wm JOIN multiplies Catalyst size stats
            # (pages × frontier), which is fine over parquet scans with
            # real statistics but re-closes the memory store's
            # stats-compounding feedback loop (storage.py:write) — and
            # memory-mode crawls are micro-scale fixtures where the
            # anti-join (left-child-only stats) is both safe and the
            # reference-parity path the goldens pin. Proven equivalent:
            # the 10M-node soak reproduces the anti-join build's
            # seen/trace hashes bit-for-bit under the watermark path.
            if (
                getattr(self.store, "materializes", False)
                and not spec.priority_rules
                # revisit fetches carry 1<<61-offset seqs that would
                # blow the per-host watermark past every fresh row —
                # revisit crawls keep the exact anti-join
                and not spec.revisit_url_rules
                and "insert_seq" in claimed.columns
            ):
                wm = claimed.groupBy("host").agg(
                    F.max("insert_seq").alias("_wm_seq")
                )
                pending = (
                    pending.join(wm, "host", "left")
                    .filter(
                        F.col("_wm_seq").isNull()
                        | (F.col("insert_seq") > F.col("_wm_seq"))
                    )
                    .drop("_wm_seq")
                )
            else:
                pending = pending.join(
                    claimed.select("url_md5"), "url_md5", "left_anti"
                )
        if spec.revisit_url_rules and claimed is not None:
            # P7 revisits join the pending set BEFORE the politeness
            # dims (cooldown/backoff/budgets gate them like any row)
            cands = self._revisit_candidates(claimed, r)
            if spec.conditional_get:
                # fresh rows carry null validators; the fetcher sends
                # If-None-Match / If-Modified-Since only on revisits
                pending = pending.withColumn(
                    "if_none_match", F.lit(None).cast("string")
                ).withColumn(
                    "if_modified_since", F.lit(None).cast("string")
                )
            else:
                cands = cands.drop("if_none_match", "if_modified_since")
            pending = pending.unionByName(cands)
        if (spec.host_page_cap > 0 or spec.host_byte_cap > 0) \
                and claimed is not None:
            # lifetime host quotas: page/byte totals over ALL committed
            # pages; hosts at either cap drop out of pending for good
            # (same partial-agg + broadcast anti-join shape as cooldown)
            totals = claimed.groupBy("host").agg(
                F.count(F.lit(1)).alias("_n_pages"),
                F.coalesce(
                    F.sum(F.col("bytes_received").cast("long")), F.lit(0)
                ).alias("_n_bytes"),
            )
            cap_pred = F.lit(False)
            if spec.host_page_cap > 0:
                cap_pred = cap_pred | (
                    F.col("_n_pages") >= F.lit(int(spec.host_page_cap))
                )
            if spec.host_byte_cap > 0:
                cap_pred = cap_pred | (
                    F.col("_n_bytes") >= F.lit(int(spec.host_byte_cap))
                )
            capped = totals.filter(cap_pred).select("host")
            pending = pending.join(F.broadcast(capped), "host", "left_anti")
            # BEFORE the pending_before_cooldown capture: quota-capped
            # rows are dead for the rest of the crawl (unlike cooling
            # rows) and must not hold an idle cooldown crawl alive
        pending_before_cooldown = pending
        if spec.host_delay_rounds > 0:
            # P8 cross-round cooldown: hosts fetched within the last
            # host_delay_rounds rounds are ineligible this round. The
            # pages rows carry their round via the store's lineage
            # column, so "last fetch round per host" is a groupBy max —
            # resume-safe (uncommitted rounds are purged with the rest).
            if claimed is not None:
                cooling = (
                    claimed.groupBy("host")
                    .agg(F.max("round").alias("_last_round"))
                    .filter(F.lit(r) - F.col("_last_round")
                            < F.lit(spec.host_delay_rounds))
                    .select("host")
                )
                pending = pending.join(F.broadcast(cooling), "host", "left_anti")
        if spec.retry_after_backoff and claimed is not None:
            # adaptive throttle backoff: a host whose LAST throttled
            # fetch (429/503) was in round t sits out rounds
            # t+1 .. t+ceil(Retry-After/round_duration) (or
            # default_backoff_rounds without the header). Same scale
            # shape as the cooldown above: partial-agg groupBy(host)
            # over the pages scan, tiny blocked-host dim broadcast into
            # an anti-join — state derives from persisted rows, so it
            # survives resume for free.
            blocked = scheduler.backoff_blocked_hosts(
                claimed, r, spec.round_duration_s, spec.default_backoff_rounds
            )
            pending = pending.join(F.broadcast(blocked), "host", "left_anti")
        if spec.request_limit:
            remaining = spec.request_limit - base_seq
            if remaining <= 0:
                return 0, False
        else:
            remaining = 2 ** 31 - 1

        budget = min(spec.budget_per_round, remaining)
        host_budgets = self._host_budgets_df()
        if (spec.adaptive_latency_budgets and spec.per_host_politeness
                and claimed is not None):
            # latency-adaptive budgets: exact int64 stats over the
            # persisted pages rows (completed rounds only -> resume-safe
            # for free, like cooldown/backoff); MIN-combined with any
            # Crawl-delay override so the most conservative signal wins
            lat = scheduler.latency_budgets(
                claimed, int(spec.round_duration_s * 1000),
                default_budget=spec.budget_per_round,
                max_budget=spec.budget_per_round,
                latency_col="latency_ms",
            ).select(
                "host",
                F.col("host_budget").cast("int").alias("host_budget"),
            )
            host_budgets = (
                lat if host_budgets is None
                else host_budgets.unionByName(lat)
                .groupBy("host")
                .agg(F.min("host_budget").alias("host_budget"))
            )
        if (spec.host_byte_budget > 0 and spec.per_host_politeness
                and claimed is not None):
            # bandwidth politeness: observed mean page size converts the
            # per-host byte target to a count budget — same persisted-
            # stats shape as the latency dim (resume-safe for free)
            bb = scheduler.byte_budgets(
                claimed, spec.host_byte_budget,
                default_budget=spec.budget_per_round,
                max_budget=spec.budget_per_round,
            ).select(
                "host",
                F.col("host_budget").cast("int").alias("host_budget"),
            )
            host_budgets = (
                bb if host_budgets is None
                else host_budgets.unionByName(bb)
                .groupBy("host")
                .agg(F.min("host_budget").alias("host_budget"))
            )
        if spec.apportion_round_budget > 0 and spec.per_host_politeness:
            # Hamilton apportionment of a GLOBAL round budget across
            # hosts proportional to pending frontier size (P8 extension;
            # the reference's request_limit has no division notion).
            # MIN-combined with the per-host default and every other
            # budget dim, so a skewed frontier gets proportional shares
            # while Crawl-delay / latency / backoff still cap below.
            # Flag-gated: apportion_budget centralizes two driver
            # scalars (total, leftover) per round.
            # The counts dim MUST be severed from `pending`'s plan before
            # joining shares back into pending's own pop pipeline: a
            # self-embedded subtree sits on both sides of every
            # downstream join, and the sizeInBytes stats visitor
            # multiplies child estimates (unions included), so the
            # BigInt digit count doubles per embedding level — measured
            # as 3s → 12s → 112s per-round blowup on a fixture crawl,
            # grinding inside BigInteger.multiply. A checkpoint is not
            # enough (LogicalRDD keeps the source plan's estimate);
            # _to_local rewraps the checkpointed agg through
            # internalCreateDataFrame, whose fresh LogicalRDD carries
            # the CONSTANT defaultSizeInBytes — stats severed with ZERO
            # host rows on the driver (the r3 collect→createDataFrame
            # form of this fix centralized O(hosts) rows per round,
            # a driver bottleneck at 10^8 hosts).
            counts = self._apportion_counts(pending)
            shares = scheduler.apportion_budget(
                counts, spec.apportion_round_budget,
            ).select(
                "host",
                F.least(F.col("budget"), F.lit(budget))
                .cast("int").alias("host_budget"),
            )
            host_budgets = (
                shares if host_budgets is None
                else host_budgets.unionByName(shares)
                .groupBy("host")
                .agg(F.min("host_budget").alias("host_budget"))
            )
        work = scheduler.pop_batch(pending, spec,
                                   host_budgets=host_budgets)
        if spec.per_host_politeness:
            # P8 at scale: budget_per_round is PER HOST — a round fetches
            # up to B × hosts pages. fetch_rank is the deterministic host
            # interleave (two-stage rank, no single-partition window);
            # the GLOBAL cap applies only when a request_limit exists.
            work = scheduler.interleave_rank(work)
            if spec.request_limit:
                work = work.filter(F.col("fetch_rank") <= F.lit(remaining))
        else:
            work = work.withColumnRenamed("pop_rank", "fetch_rank").filter(
                F.col("fetch_rank") <= budget
            )

        # host-salted repartition ahead of the fetch stage (skew defusal for
        # real fetch workloads); skipped for small budgets where the extra
        # shuffle costs more than the skew it prevents. The partition count
        # is pinned explicitly: the work list is tiny in BYTES (urls +
        # metadata) but each row expands ~1000x in CPU/output inside the
        # fetch stage, so AQE's byte-based coalescer would collapse this
        # exchange to a handful of tasks and break wave-packing on the
        # executors (measured: 19 tasks on 16 cores = a 3-task straggler
        # wave, ~10% steady-throughput loss at the 5e5-URLs/round soak
        # shape). An explicit numPartitions is exempt from AQE coalescing.
        # The rows-based arm (opt-in, spec.fetch_repartition_rows > 0;
        # see config.py for the leg-10 A/B that turned it off by
        # default) covers per-host budgets BELOW the salt threshold:
        # the previous round's fetch count is the size estimate —
        # accurate in steady state, free (already observed), and 0 on
        # the small fixture goldens so pinned job counts are untouched.
        if budget >= spec.salt_fetch_threshold or (
            spec.fetch_repartition_rows > 0
            and self._prev_round_n >= spec.fetch_repartition_rows
        ):
            work = scheduler.salted_repartition(
                work, "host", salt_buckets=8,
                num_partitions=int(
                    self.spark.conf.get("spark.sql.shuffle.partitions")
                ),
            )

        # P12/P13: attach per-request cookies / post-data / auth
        if self.cookie_jar is not None:
            from ..operators.cookies import attach_cookie_headers

            work = attach_cookie_headers(work, self.cookie_jar)
        if self.send_data_rules is not None:
            from ..operators.senddata import attach_send_data

            work = attach_send_data(work, self.send_data_rules)

        # lazy checkpoint: the round's single materializing action (the
        # frontier checkpoint below, or the fallback stats aggregate)
        # pins the fetch results; every later projection reads cached
        # blocks and a fetch is never re-executed
        results = self.fetcher.fetch(work).localCheckpoint(eager=False)
        self._track_round_blocks(results)
        can_harvest = self.harvest_cookies and "set_cookies" in results.columns
        # F9 stats are only consulted while still bootstrapping — once a
        # content page exists (or the flag is off) the two aggregate
        # expressions are dead weight in every round's hot action
        need_f9 = (
            spec.follow_redirects_till_content
            and self._first_content_url is None
        )
        stat_cols = self._stat_cols_cache.get((need_f9, can_harvest))
        if stat_cols is None:
            stat_cols = [
                F.count("*").alias("n"),
                F.coalesce(F.sum("bytes_received"), F.lit(0)).alias("bytes"),
            ]
            if need_f9:
                stat_cols += [
                    F.min(
                        F.when(F.col("status") == 200, F.col("fetch_rank"))
                    ).alias("first_content_rank"),
                    F.min_by(
                        "url",
                        F.when(F.col("status") == 200, F.col("fetch_rank")),
                    ).alias("first_content_url"),
                ]
            if can_harvest:
                # piggybacked on the existing stats action: zero extra
                # jobs on cookie-less rounds
                stat_cols.append(
                    F.coalesce(
                        F.sum(F.coalesce(F.size("set_cookies"), F.lit(0))),
                        F.lit(0),
                    ).alias("n_set_cookies")
                )
            self._stat_cols_cache[(need_f9, can_harvest)] = stat_cols
        # Fused fast path: when nothing in this round's PLAN depends on
        # this round's DATA, the stats ride the frontier-checkpoint
        # action as an Observation — one Spark job per round. The slow
        # path (separate stats aggregate first) remains for F9 bootstrap
        # (the admission split is a plan decision on first_content_rank),
        # per-host live-robots learning (mid-round distinct-host
        # collect), and durable stores (their writes interleave jobs).
        fused = (
            not need_f9
            and not (self._robots_live and spec.robots_fetch_mode == "per_host")
            and not getattr(self.store, "materializes", False)
            and getattr(self.fetcher, "side_effect_free", False)
        )
        obs: Observation | None = None
        if fused:
            obs = Observation()
            links_src = results.observe(obs, *stat_cols)
            stats = None
        else:
            links_src = results
            # slow path doesn't observe new-frontier counts — the
            # drained-skip bookkeeping goes dark for the rest of the run
            self._frontier_total = None
            stats = results.agg(*stat_cols).first()
            if int(stats["n"]) == 0:
                return self._empty_round(pending_before_cooldown)

        # ---- extract + admit -----------------------------------------------
        link_cols = [
            F.col("url").alias("referer"),
            F.col("depth").alias("src_depth"),
            F.col("fetch_rank").alias("src_rank"),
        ]
        if spec.obey_nofollow:
            # F3 page level: one Arrow pass over the fetched bodies
            link_cols.append(
                page_nofollow_udf(F.col("body_text")).alias("page_nofollow")
            )
        else:
            link_cols.append(F.lit(False).alias("page_nofollow"))
        links = (
            links_src.withColumn(
                "links",
                extract_links_udf(
                    F.col("body_text"), F.col("url"), F.col("redirect_to")
                ),
            )
            .select(*link_cols, F.posexplode_outer("links").alias("link_pos", "l"))
            .filter(F.col("l").isNotNull())
            .select(
                "referer", "src_rank", "link_pos", "page_nofollow",
                F.col("l.link_raw").alias("link_raw"),
                F.col("l.linkcode").alias("linkcode"),
                F.col("l.linktext").alias("linktext"),
                F.col("l.url").alias("url"),
                F.col("l.is_redirect").alias("is_redirect"),
                (F.col("src_depth") + 1).alias("depth"),
            )
        )

        admitted = self._admit(links, stats)

        # insert_seq: deterministic bit-packed insertion order (no
        # counter). Pagination feeds (E17/addFeed) insert BEFORE the
        # page's own links, so they occupy pos < _FEED_POS_SLOTS and
        # extracted links are shifted past them.
        round_base = F.lit(r + 1).cast("long") * F.lit(1 << (_POS_BITS + _RANK_BITS))
        admitted = admitted.withColumn(
            "insert_seq",
            round_base
            + F.col("src_rank").cast("long") * F.lit(1 << _POS_BITS)
            + F.col("link_pos").cast("long") + F.lit(_FEED_POS_SLOTS),
        ).withColumn("url_md5", F.md5("url")).withColumn(
            "host", host_expr(F.col("url"))
        )

        if self._robots_live and spec.robots_fetch_mode == "per_host":
            # learn robots for hosts these links introduce, then filter
            # the SAME links with the full rule set before they enter
            # the frontier (a disallowed URL is never admitted). The
            # checkpoint bounds this mode's extra cost to one job plus
            # one driver-side distinct-host collect per round; each host
            # is fetched once ever. Pagination feeds below stay exempt —
            # addFeed bypasses all admission in the reference.
            admitted = admitted.localCheckpoint(eager=True)
            self._track_round_blocks(admitted)
            hosts = [
                (r["host"], r["_root"])
                for r in admitted.select(
                    "host",
                    F.regexp_extract(
                        "url", r"^([a-zA-Z0-9+.-]+://[^/?#]+)", 1
                    ).alias("_root"),
                ).distinct().collect()
            ]
            self._fetch_robots_live(hosts)
            if self.robots_pairs:
                admitted = admitted.filter(
                    robots_deny_predicate(self.robots_pairs)
                )
            if self.robots_rules is not None:
                admitted = apply_robots_filter(admitted, self.robots_rules)

        if spec.pagination_rules:
            feeds = []
            slots_per_rule = _FEED_POS_SLOTS // len(spec.pagination_rules)
            for ri, (pattern, template) in enumerate(spec.pagination_rules):
                pag = synthesize_pagination(
                    results, body_col="body_text", url_col="url",
                    pattern=pattern, template=template,
                    extra_cols=("fetch_rank",),
                )
                feeds.append(
                    pag.select(
                        "url",
                        F.md5("url").alias("url_md5"),
                        host_expr(F.col("url")).alias("host"),
                        F.lit(0).alias("depth"),  # addFeed: depth forced 0
                        F.col("referer"),
                        F.col("url").alias("link_raw"),
                        F.lit(None).cast("string").alias("linktext"),
                        F.lit(False).alias("is_redirect"),
                        (
                            round_base
                            + F.col("fetch_rank").cast("long") * F.lit(1 << _POS_BITS)
                            + F.lit(ri * slots_per_rule)
                            + F.least(F.col("feed_pos").cast("long"),
                                      F.lit(slots_per_rule - 1))
                        ).alias("insert_seq"),
                    )
                )
            feed_df = feeds[0]
            for f in feeds[1:]:
                feed_df = feed_df.unionByName(f)
            admitted = feed_df.unionByName(
                admitted.select(
                    "url", "url_md5", "host", "depth", "referer",
                    "link_raw", "linktext", "is_redirect", "insert_seq",
                )
            )

        admitted = scheduler.assign_priority(admitted, spec.priority_rules)
        new = first_wins_within_batch(admitted, "url_md5", "insert_seq")
        if spec.seen_filter == "bloom":
            # P1 scale mode (the north-rule design): probe the LSM
            # seen-Bloom instead of anti-joining the full frontier key
            # set. One cogroup Arrow pass over the round's links ORs
            # every committed delta bitmap per shard — per-round dedup
            # cost is O(new links), independent of frontier size. A
            # false positive drops a genuinely new URL (cumulative FPR
            # ≈ rounds × seen_bloom_fpp); exact mode keeps parity.
            from ..operators.dedup import bloom_prefilter

            shards = self.store.read_upto("seen_bloom", r - 1)
            if shards is not None:
                new = bloom_prefilter(
                    new, shards.drop("round"),
                    num_shards=spec.seen_bloom_shards, url_col="url_md5",
                )
            new = new.select(*FRONTIER_COLS)
        else:
            new = new.join(
                frontier.select("url_md5"), "url_md5", "left_anti"
            ).select(*FRONTIER_COLS)

        # second observation: count of NEW frontier rows, so the driver
        # can track total frontier size and skip the terminal probe
        # round entirely (run() breaks when claimed == frontier total)
        obs_new: Observation | None = None
        if fused:
            obs_new = Observation()
            new = new.observe(obs_new, F.count("*").alias("n_new"))

        # materialize now: `new` feeds every later round's cumulative
        # frontier — keeping it lazy chains plans across rounds. Durable
        # stores materialize in their own write instead. On the fused
        # path this is THE round's Spark job; it also fires the stats
        # Observation and pins the fetch-results checkpoint. The
        # materialization is checkpoint + stats-severing rewrap
        # (_to_local): a bare checkpoint inherits the round pipeline's
        # join-multiplied sizeInBytes and stored stats then compound
        # geometrically across rounds — periodic flattening CANNOT fix
        # this, because old checkpointed frames persist in the
        # cumulative frontier union and keep compounding off the worst
        # stored frame (measured: a flatten-every-3 hybrid still blew
        # past 3e4 digits by round 12); every stored frame must carry
        # underivable stats. sever_stored_stats=False is the
        # regression-probe arm of tests/test_stats_flatten.py only.
        if not getattr(self.store, "materializes", False):
            if spec.sever_stored_stats:
                new = self._to_local(new)
            else:
                new = new.localCheckpoint(eager=True)
        if fused:
            stats = _observed_stats(obs)
            if stats is None:  # listener lost — re-aggregate (rare)
                stats = results.agg(*stat_cols).first()
            new_stats = _observed_stats(obs_new)
            if self._frontier_total is not None and new_stats is not None:
                self._frontier_total += int(new_stats["n_new"] or 0)
            else:
                self._frontier_total = None  # unknown → disable the skip
            if int(stats["n"]) == 0:
                # nothing fetched: `new` is necessarily empty too, so no
                # store rows exist for this round — same contract as the
                # slow path's pre-extract early exit
                return self._empty_round(pending_before_cooldown)
        n_fetched = int(stats["n"])
        if spec.frontier_ttl_rounds > 0 and n_fetched >= (1 << _RANK_BITS):
            # fetch_rank would overflow into insert_seq's round bits and
            # corrupt the TTL's packed-round recovery (rows would look
            # younger and expire late) — fail loudly instead of
            # silently mis-aging; widen _RANK_BITS for larger rounds
            raise ValueError(
                f"frontier_ttl_rounds requires < 2^{_RANK_BITS} fetches "
                f"per round (got {n_fetched}): insert_seq round bits "
                "would be corrupted"
            )
        self._bytes_total += int(stats["bytes"])

        pages = results.withColumn(
            "seq", (F.lit(base_seq) + F.col("fetch_rank") - 1).cast("long")
        )
        if "retry_after" not in pages.columns:  # fetcher without throttle surface
            pages = pages.withColumn("retry_after", F.lit(None).cast("int"))
        for vc in ("etag", "last_modified"):  # no conditional surface
            if vc not in pages.columns:
                pages = pages.withColumn(vc, F.lit(None).cast("string"))
        pages = pages.select(*PAGES_COLS)
        if (
            not getattr(self.store, "materializes", False)
            and spec.sever_stored_stats
            and self._pages_feedback()
        ):
            # storage.py:write's "pages may stay flat" contract holds
            # only while pages reach pending EXCLUSIVELY through the
            # left-anti seen join (left-child-only stats). Revisit
            # candidates UNION into pending and the caps/cooldown/
            # backoff/latency/byte dims JOIN into it — each re-closes
            # the memory store's stats-compounding feedback loop
            # through the pages table (measured: 120-host live-soak
            # revisit A/B OOMs the driver heap inside the sizeInBytes
            # visitor ~round 10). Sever exactly when such a feature is
            # on; durable stores re-read parquet with real scan stats.
            pages = self._to_local(pages)
        self.store.write("pages", r, pages)

        if can_harvest and int(stats["n_set_cookies"]) > 0:
            from ..operators.cookies import harvest_set_cookies, upsert_cookies

            new_cookies = harvest_set_cookies(
                results.filter(F.size("set_cookies") > 0), r
            )
            if not getattr(self.store, "materializes", False):
                new_cookies = self._to_local(new_cookies)
            self.store.write("cookies", r, new_cookies)
            # flatten the jar too: it feeds every later round's attach —
            # keeping the upsert windows lazy would chain plans, and a
            # bare checkpoint would carry compounding stats (see above)
            self.cookie_jar = self._to_local(
                upsert_cookies(self.cookie_jar, new_cookies)
            )

        self.store.write("frontier", r, new)
        if spec.seen_filter == "bloom":
            # append this round's delta bloom AFTER the frontier rows it
            # covers; both live in round r, so a crash between the two
            # writes is purged together (P6) and resume rebuilds nothing
            self._write_seen_bloom_delta(r, new)

        # F9 state transition happens AFTER this round's links were split;
        # with the flag off the filter base must stay the seed forever
        if need_f9 and stats["first_content_rank"] is not None:
            self._first_content_url = stats["first_content_url"]
        return n_fetched, True

    def _track_round_blocks(self, ckpt_df: DataFrame) -> None:
        """Remember a round-scoped localCheckpoint's underlying java RDD
        so _free_round_blocks can unpersist it after the round commits.
        Durable stores only — a memory store's tables alias these blocks.
        The checkpointed Dataset's analyzed plan is a LogicalRDD whose
        `rdd` field is exactly the persisted RDD (Dataset.checkpoint
        wraps queryExecution.toRdd in LogicalRDD), so unpersisting that
        handle frees the blocks without touching any other cache entry
        (long-lived checkpoints — robots rules, cookie jars — are never
        tracked here)."""
        if getattr(self.store, "materializes", False):
            self._round_block_rdds.append(
                ckpt_df._jdf.queryExecution().analyzed().rdd()
            )

    def _free_round_blocks(self) -> None:
        for jrdd in self._round_block_rdds:
            jrdd.unpersist(False)
        self._round_block_rdds.clear()

    def _pages_feedback(self) -> bool:
        """True when the pages table feeds the round pipeline beyond
        the seen anti-join (whose stats visitor reads the LEFT child
        only, making it safe over unsevered memory-store frames):
        revisit rows union into pending; the lifetime-cap, cooldown,
        backoff, latency-budget and byte-budget dims join into it.
        Each of those paths multiplies the stored pages plan's
        Catalyst sizeInBytes into every later round — the same
        geometric compounding `_to_local` severs on the frontier side
        — so memory-store runs with any of these features sever their
        pages frames too (tests/test_stats_flatten.py pins the digit
        bound for the revisit shape)."""
        spec = self.spec
        return bool(
            spec.revisit_url_rules
            or spec.host_page_cap > 0
            or spec.host_byte_cap > 0
            or spec.host_delay_rounds > 0
            or spec.retry_after_backoff
            or spec.adaptive_latency_budgets
            or spec.host_byte_budget > 0
        )

    def _apportion_counts(self, pending: DataFrame) -> DataFrame:
        """Per-host pending-count dim for Hamilton apportionment,
        stats-severed via _to_local: one map-side-combined groupBy(host)
        materialized executor-side — the plan scans the checkpointed
        RDD (ExistingRDD), never a driver-built LocalRelation, so no
        host row crosses the driver (tests/test_skew_golden.py::
        test_counts_dim_keeps_host_rows_off_the_driver asserts the
        plan shape)."""
        return self._to_local(
            pending.groupBy("host").agg(F.count(F.lit(1)).alias("pending"))
        )

    def _to_local(self, df: DataFrame) -> DataFrame:
        """Materialize + SEVER Catalyst statistics, JVM-side.

        An eager localCheckpoint materializes the frame (fires pending
        Observations, pins upstream lazy checkpoints) but its LogicalRDD
        INHERITS the source plan's sizeInBytes — which the per-host
        round pipeline multiplies through its joins, so stored stats
        compound geometrically across rounds (measured: 2.5e7-DIGIT
        BigInts by round 10, planning ground to a halt inside
        BigInteger.multiply). Re-wrapping the checkpointed internal RDD
        through internalCreateDataFrame builds a fresh LogicalRDD whose
        stats are the CONSTANT defaultSizeInBytes — derivation severed,
        so nothing compounds — at zero cost: no driver collect (the
        earlier collect→createDataFrame form of this fix cost a driver
        round-trip per round, 43% of the fixture engine bench, BENCH_r03
        7.7s → 11.2s), no recompute (toRdd of a checkpointed plan IS the
        materialized RDD), and the same single action per round.
        tests/test_stats_flatten.py pins the digit bound and trace
        parity. Only ever called on memory-store frames; durable stores
        re-read parquet, which carries real scan statistics."""
        ck = df.localCheckpoint(eager=True)
        jdf = ck._jdf
        return DataFrame(
            self.spark._jsparkSession.internalCreateDataFrame(
                jdf.queryExecution().toRdd(), jdf.schema(), False
            ),
            self.spark,
        )

    def _write_seen_bloom_delta(self, round_no: int, rows: DataFrame) -> None:
        """Build one sharded Bloom delta over this round's NEW frontier
        keys and append it to the `seen_bloom` store table (P1 scale
        mode). Deltas are per-round and per-shard sized (empty shards
        write no row); the probe side ORs across all committed deltas of
        a shard in one Arrow task. Store compaction concatenates delta
        rows like any other table — no bitmap merge is ever needed."""
        from ..operators.dedup import build_bloom_shards

        delta = build_bloom_shards(
            rows.select("url_md5"),
            num_shards=self.spec.seen_bloom_shards,
            fpp=self.spec.seen_bloom_fpp,
            url_col="url_md5",
        )
        if not getattr(self.store, "materializes", False):
            delta = self._to_local(delta)
        self.store.write("seen_bloom", round_no, delta)

    def _empty_round(self, pending_before_cooldown: DataFrame) -> tuple[int, bool]:
        # n==0 already implies post-cooldown pending was empty (both
        # fetchers emit one row per work row), so ONE early-exit probe
        # suffices: did the cooldown filter remove every pending row?
        # Then it's an idle politeness round — commit it so cooldowns
        # age; otherwise the frontier is drained.
        if (
            (self.spec.host_delay_rounds > 0 or self.spec.retry_after_backoff)
            and pending_before_cooldown.limit(1).count() > 0
        ):
            return 0, True
        return 0, False

    def _admit(self, links: DataFrame, stats) -> DataFrame:
        """The F1–F9 admission split for one round's links.

        Bootstrapping (F9, PHPCrawler.class.php:800-823): links of pages
        fetched BEFORE the first 200-status page keep only redirects,
        depth decremented, all other checks bypassed (keepRedirectUrls
        skips urlMatchesRules AND robots — URLFilter:121-135; the
        reference's `$decrease_link_depths = true` assignment bug makes
        the decrement unconditional, preserved here). Links of the first
        content page and everything after go through the normal battery
        with the filter re-based to the first content url.
        """
        spec = self.spec
        bootstrapping = (
            spec.follow_redirects_till_content
            and self._first_content_url is None
        )
        base_url = self._first_content_url or self.spec.seeds[0]

        def redirects_only(df):
            return df.filter(F.col("is_redirect")).withColumn(
                "depth", F.col("depth") - F.lit(1)
            )

        def battery(df, base):
            # the predicate Column is identical every round (base changes
            # only at the F9 transition; robots_pairs only when live
            # fetching learns a host) — cache the ~100-node expression
            # tree instead of paying its py4j construction per round
            key = (base, len(self.robots_pairs or ()))
            pred = self._battery_pred_cache.get(key)
            if pred is None:
                pred = admission_predicate(
                    spec, base, page_nofollow=F.col("page_nofollow")
                )
                if self.robots_pairs is not None:
                    pred = pred & robots_deny_predicate(self.robots_pairs)
                if spec.drop_traps:
                    # spider-trap gate rides the same cached predicate
                    # tree (row-local expressions — SURVEY §14)
                    from ..operators.traps import is_trap_expr

                    pred = pred & ~is_trap_expr(F.col("url"))
                self._battery_pred_cache[key] = pred
            out = df.filter(pred)
            if self.robots_rules is not None:
                out = apply_robots_filter(out, self.robots_rules)
            return out

        if not bootstrapping:
            return battery(links, base_url)

        first_rank = stats["first_content_rank"]
        if first_rank is None:
            return redirects_only(links)
        pre = redirects_only(links.filter(F.col("src_rank") < F.lit(first_rank)))
        post = battery(
            links.filter(F.col("src_rank") >= F.lit(first_rank)),
            stats["first_content_url"],
        )
        return pre.unionByName(post)

    # -- driver loop -------------------------------------------------------
    def run(self, max_rounds: int | None = None, resume: bool = False) -> CrawlResult:
        spec = self.spec
        max_rounds = max_rounds or spec.max_rounds

        start_round = 0
        if resume:
            wm = self.store.last_complete_round()
            self.store.purge_inflight(wm)  # P6: kill in-flight work
            start_round = wm + 1
            if self.harvest_cookies:
                # P12 persistence parity with the reference's SQLite
                # cookie cache: the jar is rebuilt from committed rounds
                harvested = self.store.read_upto("cookies", wm)
                if harvested is not None:
                    from ..operators.cookies import upsert_cookies

                    self.cookie_jar = upsert_cookies(
                        self.cookie_jar, harvested.drop("round")
                    ).localCheckpoint(eager=True)
        else:
            self.store.purge_inflight(-1)

        if self._robots_live:
            # reference parity: the seed hosts' robots are fetched once
            # at startup (PHPCrawler.class.php:522-524), BEFORE any
            # links of round 1 are admitted
            self._fetch_robots_live(self._seed_hosts())

        base_seq = 0
        if start_round == 0:
            # round 0 == seeding: store the seed rows as frontier round=0
            seeds = self._seed_frontier()
            if spec.ingest_sitemaps:
                sm = self._sitemap_frontier(self._frontier_total or 0)
                if sm is not None:
                    seeds = first_wins_within_batch(
                        seeds.unionByName(sm), "url_md5", "insert_seq"
                    ).localCheckpoint(eager=True)
                    self._frontier_total = seeds.count()
            if not getattr(self.store, "materializes", False):
                seeds = self._to_local(seeds)
            self.store.write("frontier", 0, seeds)
            if spec.seen_filter == "bloom":
                self._write_seen_bloom_delta(0, seeds)
            self.store.commit_round(0)
            start_round = 1
        else:
            t = self._trace_upto(start_round - 1)
            if t is not None:
                row = t.agg(
                    F.count("*").alias("n"),
                    F.coalesce(F.sum("bytes_received"), F.lit(0)).alias("b"),
                    F.min_by(
                        "url", F.when(F.col("status") == 200, F.col("seq"))
                    ).alias("first_content_url"),
                ).first()
                base_seq = int(row["n"])
                self._bytes_total = int(row["b"])
                if spec.follow_redirects_till_content:
                    self._first_content_url = row["first_content_url"]

        # budget clamp for micro-rounds: don't schedule 32-task stages to
        # move a handful of rows (driver latency dominates at fixture
        # scale). Scales with the round budget so production budgets keep
        # the session's configured parallelism. Restored after the run.
        # constraint propagation is O(n²) in predicate size and the
        # admission battery is a ~100-node regex tree re-planned every
        # round; the inference it buys (IsNotNull on join keys) is
        # worthless here — url_md5 is never null by construction.
        # Engine-scoped: restored after the run.
        cp_before = self.spark.conf.get(
            "spark.sql.constraintPropagation.enabled", "true"
        )
        self.spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        shuffle_before = self.spark.conf.get("spark.sql.shuffle.partitions")
        clamp = min(int(shuffle_before), max(4, spec.budget_per_round // 4))
        if spec.per_host_politeness:
            # per-host rounds move B × hosts rows, not B — the micro-round
            # clamp would throttle the scale mode's real parallelism
            clamp = int(shuffle_before)
        codegen_before = self.spark.conf.get(
            "spark.sql.codegen.wholeStage", "true"
        )
        if clamp < int(shuffle_before):
            self.spark.conf.set("spark.sql.shuffle.partitions", str(clamp))
            # micro-round regime: every round's plan is NEW (round
            # literal, growing frontier unions), so whole-stage codegen
            # compiles fresh classes per round — ~35% of round latency at
            # fixture budgets, measured by interleaved A/B (BENCH.md) —
            # to execute a budget's worth of rows. Interpreted eval wins
            # below the clamp threshold; production budgets (and the
            # per-host scale mode) keep codegen on.
            self.spark.conf.set("spark.sql.codegen.wholeStage", "false")

        abort_reason = ABORT_ROUNDLIMIT
        rounds_run = 0
        r = start_round
        try:
            while r < start_round + max_rounds:
                if (
                    self._frontier_total is not None
                    and base_seq >= self._frontier_total
                    # revisit fetches add pages beyond the frontier count
                    # and pending can repopulate — no provable drain
                    and not spec.revisit_url_rules
                ):
                    # every frontier row is claimed → pending is provably
                    # empty; skip the terminal probe round (its action
                    # would fetch nothing). Counted driver-side from the
                    # per-round n_new Observation — zero extra jobs.
                    abort_reason = ABORT_PASSEDTHROUGH
                    break
                fetched, keep_going = self._run_round(r, base_seq)
                self._prev_round_n = fetched
                if fetched == 0 and not keep_going:
                    if spec.revisit_url_rules and self._future_revisits(r):
                        # only immature revisits remain: commit the idle
                        # round so their age advances (cooldown idiom)
                        keep_going = True
                    else:
                        abort_reason = ABORT_PASSEDTHROUGH
                        break
                self.store.commit_round(r)
                # the committed round's rows now live in the store — free
                # its checkpoint blocks so driver memory stays O(1 round)
                # over arbitrarily long crawls (durable stores only)
                self._free_round_blocks()
                base_seq += fetched
                rounds_run += 1
                r += 1
                # P10 budget checks (PHPCrawler.class.php:860-900)
                if spec.request_limit and base_seq >= spec.request_limit:
                    abort_reason = ABORT_FILELIMIT
                    break
                if (
                    spec.traffic_limit_bytes
                    and self._bytes_total >= spec.traffic_limit_bytes
                ):
                    abort_reason = ABORT_TRAFFICLIMIT
                    break
        finally:
            # an aborted/broken round never committed — drop its blocks too
            self._free_round_blocks()
            self.spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)
            self.spark.conf.set(
                "spark.sql.constraintPropagation.enabled", cp_before
            )
            self.spark.conf.set("spark.sql.codegen.wholeStage", codegen_before)

        wm = self.store.last_complete_round()
        return CrawlResult(
            trace=self._trace_upto(wm),
            frontier=self.store.read_upto("frontier", wm),
            pages=self._pages_upto(wm),
            rounds_run=rounds_run,
            pages_fetched=base_seq,
            bytes_received=self._bytes_total,
            abort_reason=abort_reason,
        )
